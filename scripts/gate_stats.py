#!/usr/bin/env python
"""Host-side gate/entrant statistics for the fused top-k kernel.

Simulates the kernel's merge gate on the bench corpus (NumPy, no TPU)
and reports: tile fire rate, and the per-row entrant-count distribution
of firing tiles.  These numbers sized the first-entrant fast path in
ops/distance_topk.py (measured 2026-08-17: 81% of tiles fire, every
firing tile single-entrant — the positional shingle embedding keeps a
hit from bleeding into neighboring script columns).

Usage: python scripts/gate_stats.py [tq] [ts]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fandom_search_tpu.config import PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np

    tq = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ts = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    cfg = PipelineConfig()
    k, dim, thr = cfg.search.k, cfg.shingle.dim, cfg.search.candidate_threshold
    nq, ns = 1 << 17, 8192
    rng = np.random.default_rng(0)
    q = embed_shingles_np(
        rng.integers(0, 2**32, size=nq + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )
    s = embed_shingles_np(
        rng.integers(0, 2**32, size=ns + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )
    q[::100] = s[rng.integers(0, ns, size=len(q[::100]))]
    min_keep = int(np.ceil(thr * dim))

    S = q.astype(np.float32) @ s.astype(np.float32).T
    fire = total = single = multi = 0
    ents = []
    for i0 in range(0, nq, tq):
        kth = np.full((tq,), -(10**9), dtype=np.float64)
        topbuf = [[] for _ in range(tq)]
        for j0 in range(0, ns, ts):
            tile = S[i0 : i0 + tq, j0 : j0 + ts]
            row_max = tile.max(axis=1)
            total += 1
            if not np.any((row_max > kth) & (row_max >= min_keep)):
                continue
            fire += 1
            elig = (tile >= min_keep) & (tile > kth[:, None])
            cnt = elig.sum(axis=1)
            ents.append(cnt.max())
            if cnt.max() <= 1:
                single += 1
            else:
                multi += 1
            for r in np.nonzero(cnt)[0]:
                topbuf[r].extend(tile[r][elig[r]].tolist())
                topbuf[r] = sorted(topbuf[r], reverse=True)[:k]
                if len(topbuf[r]) == k:
                    kth[r] = topbuf[r][-1]
    e = np.array(ents) if ents else np.zeros(1)
    print(f"tiles {tq}x{ts}: fired {fire}/{total} ({100*fire/total:.1f}%), "
          f"single-entrant {single}, multi {multi}; "
          f"max-entrants p50 {np.percentile(e,50):.0f} "
          f"p90 {np.percentile(e,90):.0f} max {e.max():.0f}")


if __name__ == "__main__":
    main()
