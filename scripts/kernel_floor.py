#!/usr/bin/env python
"""Locate the fused kernel's structural floor.

Variants (interleaved):
  a) engine mode (min_keep=thr), insert merge, 256x4096
  b) gate-off (min_keep so high no tile can fire): matmul+rowmax only
  c) XLA dot_general + row-max (no top-k, no materialized HBM output)
  d) XLA dot_general + lax.top_k (the topk_dot_jnp path)

Round-5: timing is burst-amortized (40 dispatches per sync, like
bench.py's BENCH_KERNEL_ITERS — the old 5-dispatch burst carried
~RTT/5 of tunnel overhead per call), and operands are embedded ON
DEVICE from the token streams (the host-embed upload was 34 MB through
~2 MB/s tunnel phases).  FLOOR_ITERS overrides the burst size.

Usage: python scripts/kernel_floor.py [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import pad_rows, topk_dot_pallas

    cfg = PipelineConfig()
    k, dim = cfg.search.k, cfg.shingle.dim
    thr = cfg.search.candidate_threshold
    from fandom_search_tpu.ops.embed import embed_shingles_pallas_t

    nq, ns = 1 << 17, 8192
    rng = np.random.default_rng(0)
    q_stream = rng.integers(
        0, 2**32, size=nq + cfg.shingle.n - 1, dtype=np.uint32)
    s_stream = rng.integers(
        0, 2**32, size=ns + cfg.shingle.n - 1, dtype=np.uint32)
    s_emb = embed_shingles_np(s_stream, cfg.shingle)
    plant_idx = rng.integers(0, ns, size=len(range(0, nq, 100)))
    s_dev = jnp.asarray(s_emb)
    q_t = embed_shingles_pallas_t(
        jnp.asarray(q_stream), cfg.shingle)[:, :nq]
    q_t = q_t.at[:, ::100].set(jnp.take(s_dev, plant_idx, axis=0).T)
    q_dev = q_t.T
    s_pad, nsv = pad_rows(s_dev, 2048)

    @jax.jit
    def xla_rowmax(q, s):
        scores = jax.lax.dot_general(
            q, s, dimension_numbers=((((1,), (1,))), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jnp.max(scores, axis=1)

    @jax.jit
    def xla_topk(q, s):
        scores = jax.lax.dot_general(
            q, s, dimension_numbers=((((1,), (1,))), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jax.lax.top_k(scores, 10)[0]

    variants = [
        ("engine-256x4096", lambda: topk_dot_pallas(
            q_t, s_pad, nsv, k, dim, tile_q=256, tile_s=4096,
            min_keep=thr, q_transposed=True, merge="insert")[0]),
        ("gate-off-256x4096", lambda: topk_dot_pallas(
            q_t, s_pad, nsv, k, dim, tile_q=256, tile_s=4096,
            min_keep=8000.0, q_transposed=True, merge="insert")[0]),
        ("xla-matmul-rowmax", lambda: xla_rowmax(q_dev, s_pad)),
        ("xla-matmul-topk", lambda: xla_topk(q_dev, s_pad)),
    ]

    def sync(o):
        return np.asarray(jnp.sum(o.astype(jnp.float32)))

    iters = int(os.environ.get("FLOOR_ITERS", 40))
    for name, fn in variants:
        sync(fn())
    best = {name: float("inf") for name, _ in variants}
    for r in range(rounds):
        line = []
        for name, fn in variants:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], dt)
            line.append(f"{name} {dt*1e3:.1f}")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{nm} {best[nm]*1e3:.2f}ms ({nq*ns/best[nm]/1e9:.0f}G)"
        for nm, _ in variants
    ))


if __name__ == "__main__":
    main()
