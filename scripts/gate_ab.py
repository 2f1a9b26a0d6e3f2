"""Interleaved A/B of sub-tile merge gating (gate_cols) — VERDICT r2 #4.

The round-2 in-process chain (scripts/kernel_floor.py) pinned engine
mode at 109 G pairs/s vs a 135 G gate-off floor: firing tiles pay merge
traversals over the whole [TQ, TS] tile even when one row in one
column region caused the fire.  gate_cols splits each tile into
independently-gated column blocks (ops/distance_topk.py
_insert_merge_block).  This script measures engine mode at gate_cols
in {1, 2, 4, 8} interleaved in ONE process with scalar-pull sync
(DESIGN.md §7 — tunnel phases make sequential comparisons lies), on
the bench corpus shape (2^17 x 8192, ~1% planted hits).

Usage:  python scripts/gate_ab.py [rounds=5] [log2_nq=17] [log2_ns=13]
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
    rng = np.random.default_rng(7)
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    q_stream = rng.integers(0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32)
    for qi in range(0, nq, 100):  # the bench's ~1% plant density
        si = int(rng.integers(0, ns))
        q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
    q_emb = embed_shingles_np(q_stream, scfg)
    s_emb = embed_shingles_np(s_stream, scfg)
    qt = jnp.asarray(np.ascontiguousarray(q_emb.T))
    sp, nsv = pad_rows(jnp.asarray(s_emb), 2048)
    tq, ts = engine_tiles(nq, sp.shape[0])
    print(f"devices: {jax.devices()}  tiles {tq}x{ts}", flush=True)

    dim, k, mk = scfg.dim, 10, 3.5
    # (gate_cols, tile_s) variants: the sub-gated kill-loop scratch is
    # tile_s/gate_cols wide, so gate_cols >= 4 frees enough VMEM to
    # try tile_s=8192 (the full [TQ, TS] scratch blew the 16MB scoped
    # limit there in round 1) — variants that fail to compile are
    # reported and skipped, not fatal.
    variants = [(1, ts), (2, ts), (4, ts), (8, ts)]
    if sp.shape[0] % 8192 == 0:
        variants += [(4, 8192), (8, 8192)]

    def run(gc, tsv):
        v, _ = topk_dot_pallas(
            qt, sp, nsv, k, dim, tile_q=tq, tile_s=tsv, min_keep=mk,
            q_transposed=True, merge="insert", gate_cols=gc,
        )
        return v

    # warm + correctness cross-check
    base = None
    live = []
    for gc, tsv in variants:
        try:
            v = np.asarray(run(gc, tsv))
        except Exception as e:  # noqa: BLE001 — compile failures expected
            print(f"gc={gc}/ts={tsv}: compile failed "
                  f"({type(e).__name__}: {str(e)[:100]})", flush=True)
            continue
        keep = v >= mk
        if base is None:
            base = (keep, v[keep])
        else:
            assert np.array_equal(keep, base[0]), f"gc={gc}/ts={tsv} mask"
            assert np.array_equal(v[keep], base[1]), f"gc={gc}/ts={tsv} vals"
        live.append((gc, tsv))
    print("above-threshold parity OK across", live, flush=True)

    best = {vt: float("inf") for vt in live}
    for r in range(rounds):
        for vt in live:  # interleaved: one phase hits all variants
            t0 = time.perf_counter()
            _ = float(np.asarray(jnp.sum(run(*vt))))  # scalar-pull sync
            dt = time.perf_counter() - t0
            best[vt] = min(best[vt], dt)
        print(
            f"round {r}: "
            + "  ".join(
                f"gc={gc}/ts={tsv}: {best[(gc, tsv)]*1e3:.2f}ms"
                for gc, tsv in live
            ),
            flush=True,
        )
    print("\nbest-of-rounds (pairs/s):")
    for gc, tsv in live:
        print(f"  gate_cols={gc} tile_s={tsv}: "
              f"{nq*ns/best[(gc, tsv)]/1e9:.1f} G "
              f"({best[(gc, tsv)]*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
