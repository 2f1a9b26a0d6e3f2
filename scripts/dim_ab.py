"""dim=128 vs dim=256 embedding A/B — VERDICT r3 #6.

Wider embeddings halve the shingle-overlap estimator's noise sd
(~1/sqrt(dim)), buying recall/threshold headroom, at 2x MACs and wire
bytes per pair.  Round 4 made dim=256 run the FAST packed kernel
(adaptive column bits, ops/distance_topk.py), so the comparison is now
fair.  Measures, interleaved on device with burst-amortized timing:

  * noise sd of dot/dim on non-matching shingle pairs (expect
    ~0.53 -> ~0.37)
  * planted-quote detection at the engine threshold (3.5): fraction of
    plants with e in {0,1,2} mutations whose self-pair scores >= thr —
    the quantity the noise sd actually gates
  * exact-kernel recall@10 vs the NumPy oracle (tie-exact; sanity 1.0)
  * engine-mode pairs/s + MXU% at the bench shape

Usage: python scripts/dim_ab.py [rounds=5] [log2_nq=17] [log2_ns=13]
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    lnq = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    lns = int(sys.argv[3]) if len(sys.argv) > 3 else 13

    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.config import ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import (
        engine_tiles, pad_rows, topk_dot_pallas,
    )
    from fandom_search_tpu.search.oracle import topk_scores_np

    nq, ns = 1 << lnq, 1 << lns
    k, thr = 10, 3.5
    print(f"devices: {jax.devices()}", flush=True)

    def sync(v):
        return float(np.asarray(jnp.sum(v)))

    base = ShingleConfig()
    results = {}
    for dim in (128, 256):
        scfg = dataclasses.replace(base, dim=dim)
        smax = scfg.n * scfg.n * dim
        rng = np.random.default_rng(7)
        s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1,
                                dtype=np.uint32)
        q_stream = rng.integers(0, 2**32, size=nq + scfg.n - 1,
                                dtype=np.uint32)
        # plants with e mutations, cycling e in {0,1,2}
        plant_pos = []
        for i, qi in enumerate(range(0, nq, 100)):
            si = int(rng.integers(0, ns))
            q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
            e = i % 3
            for p in rng.choice(scfg.n, size=e, replace=False):
                q_stream[qi + p] = rng.integers(0, 2**32, dtype=np.uint32)
            plant_pos.append((qi, si, e))
        q_emb = embed_shingles_np(q_stream, scfg)
        s_emb = embed_shingles_np(s_stream, scfg)

        # noise sd: scores of random (non-matching) pairs
        noise = (
            q_emb[4096:8192].astype(np.int32)
            @ s_emb[:2048].astype(np.int32).T
        ) / dim
        r = {"noise_sd": float(noise.std())}

        # plant detection at the engine threshold, by mutation count
        for e_want in (0, 1, 2):
            det = tot = 0
            for qi, si, e in plant_pos:
                if e != e_want or qi >= nq or si >= ns:
                    continue
                sc = float(
                    q_emb[qi].astype(np.int32)
                    @ s_emb[si].astype(np.int32)
                ) / dim
                tot += 1
                det += sc >= thr
            r[f"detect_e{e_want}"] = det / max(1, tot)

        # exact-kernel recall@10 vs oracle (score-multiset, tie-exact)
        sp, nsv = pad_rows(jnp.asarray(s_emb), 2048)
        qt = jnp.asarray(np.ascontiguousarray(q_emb.T))
        tq, ts = engine_tiles(nq, sp.shape[0])
        ovals, _ = topk_scores_np(q_emb[:1024], s_emb, k, dim)
        kv, _ = topk_dot_pallas(
            jnp.asarray(q_emb[:1024]), sp, nsv, k, dim,
            max_abs_score=smax,
        )
        w = np.round(ovals * dim)
        g = np.round(np.asarray(kv) * dim)
        rec = np.mean([
            len(np.intersect1d(w[i], g[i], assume_unique=False)) and
            sum(min(int(c), dict(zip(*np.unique(g[i], return_counts=True)
                                     )).get(v, 0))
                for v, c in zip(*np.unique(w[i], return_counts=True))
                ) / k
            for i in range(w.shape[0])
        ])
        r["recall_at_10"] = float(rec)

        def run():
            v, _ = topk_dot_pallas(
                qt, sp, nsv, k, dim, tile_q=tq, tile_s=ts, min_keep=thr,
                q_transposed=True, merge="insert", max_abs_score=smax,
            )
            return v

        sync(run())
        best = float("inf")
        iters = 10
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = run()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        r["ms"] = best * 1e3
        r["gpairs"] = nq * ns / best / 1e9
        r["mxu_pct"] = nq * ns / best * 2 * dim / 394e12 * 100
        results[dim] = r
        print(f"dim={dim}: {r}", flush=True)

    a, b = results[128], results[256]
    print("\n| metric | dim=128 | dim=256 |")
    print("|---|---|---|")
    for key in ("noise_sd", "detect_e0", "detect_e1", "detect_e2",
                "recall_at_10", "ms", "gpairs", "mxu_pct"):
        print(f"| {key} | {a[key]:.4f} | {b[key]:.4f} |")


if __name__ == "__main__":
    main()
