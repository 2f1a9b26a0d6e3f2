#!/usr/bin/env python
"""Interleaved A/B: insert merge vs rebuild merge at the bench shape.

Usage: python scripts/merge_ab.py [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

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
    s_pad, nsv = pad_rows(jnp.asarray(s_emb), 2048)

    # default to the engine's measured-best tiles; argv overrides
    tq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ts = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    print(f"tiles {tq}x{ts}")

    def run(merge, min_keep):
        return topk_dot_pallas(
            q_t, s_pad, nsv, k, dim, min_keep=min_keep,
            q_transposed=True, merge=merge, tile_q=tq, tile_s=ts,
        )

    def sync(o):
        return np.asarray(jnp.sum(o[0]))

    variants = [
        ("insert/engine", lambda: run("insert", thr)),
        ("insertloop/engine", lambda: run("insertloop", thr)),
        ("rebuild/engine", lambda: run("rebuild", thr)),
        ("insert/exact", lambda: run("insert", -float("inf"))),
        ("insertloop/exact", lambda: run("insertloop", -float("inf"))),
        ("rebuild/exact", lambda: run("rebuild", -float("inf"))),
    ]
    for name, fn in variants:
        sync(fn())  # compile
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
            line.append(f"{name} {dt*1e3:.1f}ms")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{nm} {best[nm]*1e3:.2f}ms ({nq*ns/best[nm]/1e9:.1f}G)"
        for nm, _ in variants
    ))


if __name__ == "__main__":
    main()
