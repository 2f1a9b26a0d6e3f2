#!/usr/bin/env python
"""Stage-by-stage timing of the flat bucketed path at 1M-shingle scale.

Profiles the impl="seg" (round-3) stage decomposition; pass a third
arg "gather" to profile the round-2 control's stages instead.

Usage: python scripts/flat_stages.py [log2_ns] [log2_nq] [impl]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    log2_ns = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    log2_nq = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    impl = sys.argv[3] if len(sys.argv) > 3 else "seg"

    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import BucketedConfig, PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np, shingle_hashes
    from fandom_search_tpu.ops.bucketed import (
        BucketedIndex, _pairs_for, _probe_geometry, probe_candidates,
    )
    from fandom_search_tpu.ops.distance_topk import pad_rows
    from fandom_search_tpu.search.engine import nonzero_compact

    cfg = PipelineConfig()
    bcfg = BucketedConfig()
    n, dim = cfg.shingle.n, cfg.shingle.dim
    ns, nq = 1 << log2_ns, 1 << log2_nq
    rng = np.random.default_rng(0)
    s_stream = rng.integers(0, 2**32, size=ns + n - 1, dtype=np.uint32)
    q_stream = rng.integers(0, 2**32, size=nq + n - 1, dtype=np.uint32)
    for qi in range(0, nq, 100):
        si = int(rng.integers(0, ns))
        q_stream[qi : qi + n] = s_stream[si : si + n]
    windows = shingle_hashes(s_stream, cfg.shingle)
    s_emb = embed_shingles_np(s_stream, cfg.shingle)
    q_emb = embed_shingles_np(q_stream, cfg.shingle)
    bidx = BucketedIndex.build(windows, bcfg, cfg.shingle)
    s_pad, _ = pad_rows(jnp.asarray(s_emb), 2048)
    q_dev = jnp.asarray(q_emb)
    qs_dev = jnp.asarray(q_stream)
    E = 1 << 19
    P = len(_pairs_for(n, bcfg.pairs))

    def sync(x):
        x = x[0] if isinstance(x, tuple) else x
        return np.asarray(jnp.sum(x.astype(jnp.float32)))

    if impl == "gather":
        probe = functools.partial(
            probe_candidates, n=n, cap=bcfg.cap,
            num_buckets=bidx.num_buckets, salts=bidx.salts,
        )

        @jax.jit
        def st_probe(stream):
            return probe(stream, bidx.entries, bidx.offsets)

        @jax.jit
        def st_compact(ok):
            return nonzero_compact(ok.ravel(), E)

        cand, ok, _ = st_probe(qs_dev)
        sync(cand)
        pos = st_compact(ok)
        sync(pos)

        @jax.jit
        def st_stream(pos, cand):
            width = cand.shape[1]
            safe = jnp.maximum(pos, 0)
            row = (safe // width).astype(jnp.int32)
            sid = cand.ravel()[safe]
            return row, sid

        row, sid = st_stream(pos, cand)
        sync(row)
        stages = [
            ("probe", lambda: st_probe(qs_dev)[0]),
            ("compact", lambda: st_compact(ok)),
            ("stream", lambda: st_stream(pos, cand)[0]),
        ]
    else:
        geom = functools.partial(
            _probe_geometry, n=n, cap=bcfg.cap,
            num_buckets=bidx.num_buckets, salts=bidx.salts,
            pairs_mode=bcfg.pairs,
        )

        @jax.jit
        def st_geom(stream):
            return geom(stream, bidx.offsets)

        @jax.jit
        def st_stream(start, ln, entries):
            ln_flat = ln.reshape(-1)
            start_flat = start.reshape(-1)
            csum = jnp.cumsum(ln_flat)
            total = csum[-1]
            out_start = csum - ln_flat
            adds = jnp.zeros((E,), jnp.int32).at[
                jnp.minimum(out_start, E - 1)
            ].add(1, mode="drop")
            e_iota = jnp.arange(E, dtype=jnp.int32)
            seg = jnp.cumsum(adds) - 1
            valid = e_iota < total
            seg = jnp.clip(seg, 0, ln_flat.shape[0] - 1)
            row = (seg // P).astype(jnp.int32)
            probe_i = seg % P
            epos = start_flat[seg] + (e_iota - out_start[seg])
            ecols = entries.shape[1]
            sid = entries.reshape(-1)[
                probe_i * ecols + jnp.clip(epos, 0, ecols - 1)
            ]
            return row, jnp.where(valid, sid, 0), valid

        start, ln, _ = st_geom(qs_dev)
        sync(start)
        row, sid, valid = st_stream(start, ln, bidx.entries)
        sync(row)
        stages = [
            ("geometry", lambda: st_geom(qs_dev)[0]),
            ("seg-stream", lambda: st_stream(start, ln, bidx.entries)[0]),
        ]

    @jax.jit
    def st_gather_dot(row, sid, q_emb_, s_emb_):
        qe = jnp.take(q_emb_, jnp.minimum(row, q_emb_.shape[0] - 1), axis=0)
        se = jnp.take(s_emb_, sid, axis=0)
        return jnp.einsum(
            "ed,ed->e", qe.astype(jnp.bfloat16), se.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) / dim

    @jax.jit
    def st_sort(score, row, sid):
        keep = score >= 3.5
        big = jnp.int32(1 << 30)
        score_i = jnp.where(keep, jnp.round(score * dim).astype(jnp.int32), 0)
        key_row = jnp.where(keep, row, big)
        return jax.lax.sort(
            (key_row, -score_i, sid), num_keys=3, is_stable=True
        )

    @jax.jit
    def st_rank_compact(row_s, neg_s, sid_s):
        big = jnp.int32(1 << 30)
        e = row_s.shape[0]
        iota = jnp.arange(e, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), row_s[1:] != row_s[:-1]]
        )
        dup = jnp.concatenate(
            [jnp.zeros((1,), bool),
             jnp.logical_and(row_s[1:] == row_s[:-1],
                             sid_s[1:] == sid_s[:-1])]
        )
        keep2 = jnp.logical_and(row_s < big, jnp.logical_not(dup))
        c_inc = jnp.cumsum(keep2.astype(jnp.int32))
        c_exc = c_inc - keep2.astype(jnp.int32)
        seg_start = jax.lax.cummax(jnp.where(first, iota, 0))
        rank = c_exc - jnp.take(c_exc, seg_start)
        topk_keep = jnp.logical_and(keep2, rank < 10)
        return nonzero_compact(topk_keep, 16384)

    sc = st_gather_dot(row, sid, q_dev, s_pad)
    sync(sc)
    srt = st_sort(sc, row, sid)
    sync(srt[0])
    rk = st_rank_compact(*srt)
    sync(rk)

    stages += [
        ("gather+dot", lambda: st_gather_dot(row, sid, q_dev, s_pad)),
        ("sort", lambda: st_sort(sc, row, sid)[0]),
        ("rank+compact", lambda: st_rank_compact(*srt)),
    ]
    best = {nm: float("inf") for nm, _ in stages}
    for r in range(3):
        line = []
        for nm, fn in stages:
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            best[nm] = min(best[nm], dt)
            line.append(f"{nm} {dt*1e3:.1f}")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{nm} {best[nm]*1e3:.2f}ms" for nm, _ in stages
    ) + f" | SUM {sum(best.values())*1e3:.1f}ms")


if __name__ == "__main__":
    main()
