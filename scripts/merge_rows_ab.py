"""Interleaved A/B of the row-extraction merge (merge="rows") vs the
insert merge — VERDICT r3 #5: the hit-dense regime.

At 1% plant density 81% of tiles fire the merge gate and the insert
merge pays ~3 full [TQ, TS] traversals per firing tile (35.8 G vs the
133 G clean rate).  The rows merge extracts each entrant ROW via
one-hot MXU matmuls and merges on [1, TS] slices (ops/distance_topk.py
_topk_kernel_rows).  Interleaved in ONE process with scalar-pull sync
(DESIGN.md §7), on the bench corpus shape at several plant densities:
0 (clean control — both should match the gate-off behavior), 1% (the
bench corpus), 5% (quote-dense stress).

Usage:  python scripts/merge_rows_ab.py [rounds=5] [log2_nq=17] [log2_ns=13]
"""

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

    scfg = ShingleConfig()
    nq, ns = 1 << lnq, 1 << lns
    dim, k, mk = scfg.dim, 10, 3.5
    rng = np.random.default_rng(7)
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    s_emb = embed_shingles_np(s_stream, scfg)
    sp, nsv = pad_rows(jnp.asarray(s_emb), 2048)
    tq, ts = engine_tiles(nq, sp.shape[0])
    print(f"devices: {jax.devices()}  tiles {tq}x{ts}", flush=True)

    def sync(v):
        return float(np.asarray(jnp.sum(v)))

    for density, stride in (("clean", 0), ("1%", 100), ("5%", 20)):
        q_stream = rng.integers(
            0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32
        )
        if stride:
            for qi in range(0, nq, stride):
                si = int(rng.integers(0, ns))
                q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
        q_emb = embed_shingles_np(q_stream, scfg)
        qt = jnp.asarray(np.ascontiguousarray(q_emb.T))

        def run(merge):
            v, _ = topk_dot_pallas(
                qt, sp, nsv, k, dim, tile_q=tq, tile_s=ts, min_keep=mk,
                q_transposed=True, merge=merge,
            )
            return v

        # warm + correctness cross-check (thresholded rows only — the
        # min_keep contract)
        vi = np.asarray(run("insert"))
        vr = np.asarray(run("rows"))
        keep = vi >= mk
        ok = np.array_equal(
            np.where(keep, vi, 0), np.where(vr >= mk, vr, 0)
        )
        best = {"insert": float("inf"), "rows": float("inf")}
        iters = 10  # amortize the tunnel RTT over a dispatch burst
        for _ in range(rounds):
            for m in ("insert", "rows"):
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = run(m)
                sync(out)
                best[m] = min(best[m], (time.perf_counter() - t0) / iters)
        gi = nq * ns / best["insert"] / 1e9
        gr = nq * ns / best["rows"] / 1e9
        print(
            f"[{density}] insert {best['insert']*1e3:6.2f} ms "
            f"({gi:6.1f} G)  rows {best['rows']*1e3:6.2f} ms "
            f"({gr:6.1f} G)  rows/insert x{gi and gr/gi:.2f}  "
            f"parity {'OK' if ok else 'MISMATCH'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
