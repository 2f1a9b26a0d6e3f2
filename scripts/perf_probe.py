#!/usr/bin/env python
"""Kernel perf sweep on the real TPU — informs default tile sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py

Run it ALONE: concurrent TPU processes queue on the single chip and
pollute each other's timings.
"""

import itertools
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fandom_search_tpu.config import LSHConfig, SearchConfig, ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import topk_dot_pallas, pad_rows
    from fandom_search_tpu.ops.embed import embed_shingles_pallas_t
    from fandom_search_tpu.ops.lsh import LSHIndex, lsh_topk
    from fandom_search_tpu.ops.smith_waterman import sw_normalized_pallas

    def t(fn, iters=5):
        # NOTE: block_until_ready does NOT await on the axon platform;
        # sync by pulling an on-device scalar reduction.
        def sync(out):
            s = out[0] if isinstance(out, (tuple, list)) else out
            return np.asarray(jnp.sum(s.astype(jnp.float32)))

        sync(fn())  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)  # device executes in-order: last-sync syncs all
        return (time.perf_counter() - t0) / iters

    rng = np.random.default_rng(0)
    scfg = ShingleConfig()
    K, DIM = 10, scfg.dim
    NQ, NS = 1 << 17, 8192
    # realistic embeddings + 1% planted quotes (pure noise flatters the
    # min_keep gate; quote-free data overstates merge costs)
    q = embed_shingles_np(
        rng.integers(0, 2**32, size=NQ + 5, dtype=np.uint32), scfg
    )
    s = embed_shingles_np(
        rng.integers(0, 2**32, size=NS + 5, dtype=np.uint32), scfg
    )
    q[::100] = s[rng.integers(0, NS, size=len(q[::100]))]
    qd, sd = jnp.asarray(q), jnp.asarray(s)
    s_pad, nsv = pad_rows(sd, 2048)

    print("== fused distance+topk (min_keep=3.5, engine mode) ==", flush=True)
    qT = jnp.asarray(q.T.copy())
    for tq, ts, comp in itertools.product(
        (64, 128, 256), (1024, 2048, 4096), ("int8", "bf16")
    ):
        try:
            dt = t(lambda: topk_dot_pallas(
                qd, s_pad, nsv, K, DIM, tile_q=tq, tile_s=ts, compute=comp,
                min_keep=3.5))
            dtt = t(lambda: topk_dot_pallas(
                qT, s_pad, nsv, K, DIM, tile_q=tq, tile_s=ts, compute=comp,
                min_keep=3.5, q_transposed=True))
            print(f"tq={tq} ts={ts} {comp}: {dt*1e3:7.2f} ms  "
                  f"{NQ*NS/dt/1e9:7.1f} G pairs/s   "
                  f"(qT: {dtt*1e3:7.2f} ms {NQ*NS/dtt/1e9:7.1f} G)",
                  flush=True)
        except Exception as e:
            print(f"tq={tq} ts={ts} {comp}: FAIL {str(e)[:100]}", flush=True)

    print("== embed kernel (lane-major) ==", flush=True)
    stream = jnp.asarray(
        rng.integers(0, 2**32, size=NQ + 5, dtype=np.uint32)
    )
    for tm in (1024, 2048, 4096, 8192):
        dt = t(lambda: embed_shingles_pallas_t(stream, scfg, tile_m=tm))
        print(f"tile_m={tm}: {dt*1e3:6.2f} ms  {NQ/dt/1e6:5.0f} M shingles/s",
              flush=True)

    print("== smith-waterman ==", flush=True)
    CFG = SearchConfig()
    B = 8192
    a = rng.integers(1, 1000, size=(B, 64)).astype(np.uint32)
    b = rng.integers(1, 1000, size=(B, 64)).astype(np.uint32)
    la = np.full(B, 64, np.int32)
    lb = np.full(B, 64, np.int32)
    for tb in (128, 256, 512, 1024):
        try:
            dt = t(lambda: sw_normalized_pallas(a, b, la, lb, CFG, tile_b=tb))
            print(f"tile_b={tb}: {dt*1e3:7.2f} ms  {B/dt:9.0f} pairs/s "
                  f"({B*64*64/dt/1e9:6.1f} G cells/s)", flush=True)
        except Exception as e:
            print(f"tile_b={tb}: FAIL {str(e)[:100]}", flush=True)

    print("== lsh (1024 bits) ==", flush=True)
    from fandom_search_tpu.ops.lsh import coarse_sim_threshold

    for rr in (128, 256):
        lcfg = LSHConfig(rerank=rr)
        lsh = LSHIndex.build(s, lcfg, scfg)
        dt = t(lambda: lsh_topk(qd, lsh, s_pad, K, DIM, lcfg), iters=3)
        keep = coarse_sim_threshold(3.5, scfg.n, lcfg.bits)
        dtg = t(lambda: lsh_topk(qd, lsh, s_pad, K, DIM, lcfg,
                                 min_keep_sim=keep), iters=3)
        print(f"rerank={rr}: exact {dt*1e3:7.1f} ms, gated {dtg*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
