#!/usr/bin/env python
"""Kernel perf sweep on the real TPU — informs default tile sizes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
"""

import itertools
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fandom_search_tpu.config import SearchConfig
    from fandom_search_tpu.ops.distance_topk import topk_dot_pallas, pad_rows
    from fandom_search_tpu.ops.smith_waterman import sw_normalized_pallas
    from fandom_search_tpu.ops.lsh import (
        LSHIndex, lsh_topk,
    )
    from fandom_search_tpu.config import LSHConfig, ShingleConfig

    rng = np.random.default_rng(0)
    K, DIM = 10, 128
    NQ, NS = 1 << 17, 8192
    q = rng.integers(-6, 7, size=(NQ, DIM)).astype(np.int8)
    s = rng.integers(-6, 7, size=(NS, DIM)).astype(np.int8)
    import jax.numpy as jnp

    qd, sd = jnp.asarray(q), jnp.asarray(s)

    def t(fn, iters=5):
        # NOTE: on the axon remote platform block_until_ready does NOT
        # await completion; sync by reducing to a scalar on device and
        # transferring it (same trick as bench.py).
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

    print("== fused distance+topk ==", flush=True)
    # tq=1024 with ts>=1024 fails remote compile (VMEM); skip it
    for tq, ts, comp in itertools.product(
        (256, 512), (512, 1024, 2048), ("bf16", "int8")
    ):
        try:
            dt = t(lambda: topk_dot_pallas(
                qd, sd, NS, K, DIM, tile_q=tq, tile_s=ts, compute=comp))
            print(f"tq={tq} ts={ts} {comp}: {dt*1e3:7.2f} ms  "
                  f"{NQ*NS/dt/1e9:7.1f} G pairs/s", flush=True)
        except Exception as e:
            print(f"tq={tq} ts={ts} {comp}: FAIL {str(e)[:120]}", flush=True)

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
            print(f"tile_b={tb}: FAIL {str(e)[:120]}", flush=True)

    print("== lsh (1024 bits, rerank 256) ==", flush=True)
    scfg = ShingleConfig()
    lcfg = LSHConfig()
    lsh = LSHIndex.build(s, lcfg, scfg)
    s_pad, _ = pad_rows(sd, 512)
    try:
        dt = t(lambda: lsh_topk(qd, lsh, s_pad, K, DIM, lcfg), iters=3)
        print(f"lsh_topk: {dt*1e3:7.2f} ms  {NQ*NS/dt/1e9:7.1f} G pairs/s-equiv",
              flush=True)
    except Exception as e:
        print(f"lsh FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
