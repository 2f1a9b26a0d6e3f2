#!/usr/bin/env python
"""Stage-by-stage timing of the flat bucketed path at 1M-shingle scale.

Usage: python scripts/flat_stages.py [log2_ns] [log2_nq]
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

    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import BucketedConfig, PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np, shingle_hashes
    from fandom_search_tpu.ops.bucketed import (
        BucketedIndex, probe_candidates,
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

    @jax.jit
    def st_gather_dot(pos, cand, q_emb_, s_emb_):
        width = cand.shape[1]
        safe = jnp.maximum(pos, 0)
        row = (safe // width).astype(jnp.int32)
        sid = cand.ravel()[safe]
        qe = jnp.take(q_emb_, jnp.minimum(row, q_emb_.shape[0] - 1), axis=0)
        se = jnp.take(s_emb_, sid, axis=0)
        return jnp.einsum(
            "ed,ed->e", qe.astype(jnp.bfloat16), se.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) / dim, row, sid

    @jax.jit
    def st_sort(score, row, sid):
        keep = score >= 3.5
        big = jnp.int32(1 << 30)
        score_i = jnp.where(keep, jnp.round(score * dim).astype(jnp.int32), 0)
        key_row = jnp.where(keep, row, big)
        return jax.lax.sort(
            (key_row, -score_i, sid, score), num_keys=3, is_stable=True
        )

    def sync(x):
        return np.asarray(jnp.sum(x[0].astype(jnp.float32) if isinstance(x, tuple) else x.astype(jnp.float32)))

    cand, ok, _ = st_probe(qs_dev)
    sync(cand)
    pos = st_compact(ok)
    sync(pos)
    sc, row, sid = st_gather_dot(pos, cand, q_dev, s_pad)
    sync(sc)
    srt = st_sort(sc, row, sid)
    sync(srt[0])

    stages = [
        ("probe", lambda: st_probe(qs_dev)[0]),
        ("compact", lambda: st_compact(ok)),
        ("gather+dot", lambda: st_gather_dot(pos, cand, q_dev, s_pad)[0]),
        ("sort", lambda: st_sort(sc, row, sid)[0]),
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
    ))
    print(f"true pairs: {int(np.asarray(jnp.sum(ok)))} (E budget {E})")


if __name__ == "__main__":
    main()
