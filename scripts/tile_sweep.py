#!/usr/bin/env python
"""Interleaved tile-shape sweep of the fused top-k kernel, engine mode.

Usage: python scripts/tile_sweep.py [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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

    shapes = [(128, 2048), (128, 4096), (128, 8192), (256, 2048),
              (256, 4096), (512, 2048)]

    def run(tq, ts):
        return topk_dot_pallas(
            q_t, s_pad, nsv, k, dim, tile_q=tq, tile_s=ts, min_keep=thr,
            q_transposed=True, merge="insert",
        )

    def sync(o):
        return np.asarray(jnp.sum(o[0]))

    ok_shapes = []
    for tq, ts in shapes:
        try:
            sync(run(tq, ts))
            ok_shapes.append((tq, ts))
        except Exception as e:  # noqa: BLE001 — VMEM blowups expected
            print(f"tq={tq} ts={ts}: compile FAILED "
                  f"({str(e).splitlines()[0][:90]})", flush=True)
    best = {s: float("inf") for s in ok_shapes}
    for r in range(rounds):
        line = []
        for s in ok_shapes:
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(*s)
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            best[s] = min(best[s], dt)
            line.append(f"{s[0]}x{s[1]} {dt*1e3:.1f}")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{s[0]}x{s[1]} {best[s]*1e3:.2f}ms ({nq*ns/best[s]/1e9:.0f}G)"
        for s in ok_shapes
    ))


if __name__ == "__main__":
    main()
