#!/usr/bin/env python
"""Locate the fused kernel's structural floor.

Variants (interleaved):
  a) engine mode (min_keep=thr), insert merge, 256x4096
  b) gate-off (min_keep so high no tile can fire): matmul+rowmax only
  c) XLA dot_general + row-max (no top-k, no materialized HBM output)
  d) XLA dot_general + lax.top_k (the topk_dot_jnp path)

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
    nq, ns = 1 << 17, 8192
    rng = np.random.default_rng(0)
    q_emb = embed_shingles_np(
        rng.integers(0, 2**32, size=nq + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )
    s_emb = embed_shingles_np(
        rng.integers(0, 2**32, size=ns + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )
    q_emb[::100] = s_emb[rng.integers(0, ns, size=len(q_emb[::100]))]
    q_t = jnp.asarray(np.ascontiguousarray(q_emb.T))
    q_dev = jnp.asarray(q_emb)
    s_pad, nsv = pad_rows(jnp.asarray(s_emb), 2048)

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

    for name, fn in variants:
        sync(fn())
    best = {name: float("inf") for name, _ in variants}
    for r in range(rounds):
        line = []
        for name, fn in variants:
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            best[name] = min(best[name], dt)
            line.append(f"{name} {dt*1e3:.1f}")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{nm} {best[nm]*1e3:.2f}ms ({nq*ns/best[nm]/1e9:.0f}G)"
        for nm, _ in variants
    ))


if __name__ == "__main__":
    main()
