#!/usr/bin/env python
"""Forensics for VERDICT r4 #4: (a) the english_huge guaranteed-recall
leak (0.9996, not 1.0000, at 2^22) and (b) the zipf at-risk
contradiction (bench risk_frac 0.993 vs BASELINE.md round-3 probe row
"x2.88 @ 7.5% at-risk" for nominally the same 2^20 zipf-1.3 regime).

Modes:
  python scripts/leak_probe.py zipfab [log2_ns]
      Host-side A/B of the two zipf corpus recipes (bench words() vs
      scripts/bucketed_probe.py stream_of): index overflow fraction and
      the at-risk query fraction each recipe produces under the SAME
      BucketedIndex machinery.  Pure NumPy — no device needed.
  python scripts/leak_probe.py leak [log2_ns] [log2_nq]
      Reproduce the bench's bucketed_english_huge config exactly
      (seed 13, pairs="all", zipf-1.01 over 2^19 vocab) and do a
      per-entry post-mortem of every GUARANTEED (>=2-match) exact-top-k
      entry the hybrid missed: was the query flagged at-risk?  was the
      matching pair's bucket over cap?  is the shingle id present in
      the probed bucket's entry list?  was it lost to rounding or to
      the per-query top-k rank?  Needs the device for the exact kernel
      at 2^22 (CPU interpret would take hours) — run under axon.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fandom_search_tpu.config import PipelineConfig
from fandom_search_tpu.data.shingler import shingle_hashes
from fandom_search_tpu.ops.bucketed import (
    BucketedIndex, _bucket_ids, _pairs_for,
)

cfg = PipelineConfig()
N = cfg.shingle.n


def host_at_risk(q_windows, bidx, pairs):
    """NumPy replica of _probe_geometry's at-risk rule: ANY probed
    bucket with true occupancy > cap flags the query."""
    off = np.asarray(bidx.offsets)
    risk = np.zeros(q_windows.shape[0], bool)
    for t, (a, b) in enumerate(pairs):
        bid = _bucket_ids(
            q_windows[:, a], q_windows[:, b],
            np.uint32(bidx.salts[t]), bidx.num_buckets,
        )
        full = off[t, bid + 1] - off[t, bid]
        risk |= full > cfg.bucketed.cap
    return risk


def bench_zipf_words(r, count, zipf_a, vocab):
    """fandom_search_tpu/bench.py measure_skew words() verbatim."""
    return (
        (((r.zipf(zipf_a, size=count) - 1) % vocab) + 1)
        .astype(np.uint32) * np.uint32(0x9E3779B9)
    )


def probe_zipf_words(r, count, zipf_a, vocab_hashes):
    """scripts/bucketed_probe.py stream_of verbatim."""
    ranks = r.zipf(zipf_a, size=count) % len(vocab_hashes)
    return vocab_hashes[ranks]


def mode_zipfab(log2_ns=18):
    ns = 1 << log2_ns
    nq = 1 << min(14, log2_ns)
    pairs = _pairs_for(N, cfg.bucketed.pairs)
    for name, mk in [
        ("bench words() seed 11", lambda r, c: bench_zipf_words(
            r, c, 1.3, 50000)),
        ("probe stream_of seed 0", None),
    ]:
        if mk is None:
            r = np.random.default_rng(0)
            vocab_hashes = r.integers(0, 2**32, size=50000, dtype=np.uint32)
            mk = lambda rr, c: probe_zipf_words(rr, c, 1.3, vocab_hashes)  # noqa: E731
            r2 = r
        else:
            r2 = np.random.default_rng(11)
        s_stream = mk(r2, ns + N - 1)
        q_stream = mk(r2, nq + N - 1)
        for qi in range(0, nq, 100):
            si = int(r2.integers(0, ns))
            q_stream[qi:qi + N] = s_stream[si:si + N]
        sw = shingle_hashes(s_stream, cfg.shingle)
        qw = shingle_hashes(q_stream, cfg.shingle)
        bidx = BucketedIndex.build(sw, cfg.bucketed, cfg.shingle)
        risk = host_at_risk(qw, bidx, pairs)
        # head-word mass diagnostic
        vals, counts = np.unique(s_stream, return_counts=True)
        top = np.sort(counts)[::-1][:3] / len(s_stream)
        print(f"{name}: ns=2^{log2_ns}  overflow_frac="
              f"{bidx.overflow_frac:.4f}  at_risk={risk.mean():.4f}  "
              f"top-word mass {top.round(4).tolist()}")


def mode_leak(log2_ns=22, log2_nq=17):
    import jax.numpy as jnp

    from fandom_search_tpu.ops.bucketed import drive_hybrid
    from fandom_search_tpu.ops.distance_topk import (
        engine_tiles, pad_rows, topk_dot_pallas,
    )

    k, dim = cfg.search.k, cfg.shingle.dim
    thr = cfg.search.candidate_threshold
    ns_c, nq_c = 1 << log2_ns, 1 << log2_nq
    # EXACT english_huge recipe (bench.py measure_skew, seed 13)
    import dataclasses as _dc
    bcfg = _dc.replace(cfg.bucketed, pairs="all")
    r = np.random.default_rng(13)

    def words(count):
        return (
            (((r.zipf(1.01, size=count) - 1) % (1 << 19)) + 1)
            .astype(np.uint32) * np.uint32(0x9E3779B9)
        )

    t0 = time.perf_counter()
    s_stream = words(ns_c + N - 1)
    q_stream = words(nq_c + N - 1)
    for qi in range(0, nq_c, 20):
        si = int(r.integers(0, ns_c))
        q_stream[qi:qi + N] = s_stream[si:si + N]
    from fandom_search_tpu.ops.embed import embed_shingles_pallas_t

    sw_h = shingle_hashes(s_stream, cfg.shingle)
    bidx = BucketedIndex.build(sw_h, bcfg, cfg.shingle)
    # device-side embed from the streams (bench.py r05 discipline: the
    # host-embed upload at 2^22 is ~540 MB through a ~2 MB/s tunnel)
    s_padz, nsz = pad_rows(
        embed_shingles_pallas_t(
            jnp.asarray(s_stream), cfg.shingle).T[:ns_c], 2048)
    q_tz = embed_shingles_pallas_t(
        jnp.asarray(q_stream), cfg.shingle)[:, :nq_c]
    q_devz = q_tz.T
    qs_devz = jnp.asarray(q_stream)
    smax = N * N * dim
    tq_z, ts_z = engine_tiles(nq_c, s_padz.shape[0])
    print(f"world+index built in {time.perf_counter()-t0:.1f}s "
          f"(overflow_frac {bidx.overflow_frac:.4f})")

    ev, ei = topk_dot_pallas(
        q_tz, s_padz, nsz, k, dim, tile_q=tq_z, tile_s=ts_z,
        min_keep=thr, q_transposed=True, max_abs_score=smax,
    )
    (hqp, hsi, hsc, hcnt), rc_n, _mo, _rb = drive_hybrid(
        qs_devz, q_devz, bidx.entries, bidx.offsets, s_padz, nsz,
        n=N, cap=bcfg.cap, num_buckets=bidx.num_buckets,
        salts=bidx.salts, k=k, dim=dim, threshold=thr,
        pairs_mode=bcfg.pairs, max_out=1 << 16, risk_budget=1 << 13,
        max_abs_score=smax, grow_max_out=True,
    )
    evn, ein = np.asarray(ev), np.asarray(ei)
    hcnt_i = int(np.asarray(hcnt))
    print(f"exact + hybrid done; at-risk {rc_n}/{nq_c} "
          f"({rc_n/nq_c:.3%}), hybrid triples {hcnt_i}")

    q_wh = shingle_hashes(q_stream, cfg.shingle)
    got = {}
    for q, s, v in zip(np.asarray(hqp)[:hcnt_i],
                       np.asarray(hsi)[:hcnt_i],
                       np.asarray(hsc)[:hcnt_i]):
        if q >= 0:
            got.setdefault(int(q), []).append(
                (round(float(v) * dim), int(s)))

    pairs = _pairs_for(N, bcfg.pairs)
    risk_host = host_at_risk(q_wh, bidx, pairs)
    off = np.asarray(bidx.offsets)
    ent = np.asarray(bidx.entries)

    tot = g_tot = g_miss = g_alias = 0
    # FULL sweep (the bench samples stride 17; forensics wants all).
    # TWO accountings, compared: the pre-r5 SCORE-MULTISET form (the
    # one that recorded the 0.99965 "leak") and the corrected
    # (si, score) IDENTITY form — post-mortems fire only on identity
    # misses, i.e. guaranteed entries the hybrid truly did not return.
    for i in range(nq_c):
        keepm = evn[i] >= thr
        if not keepm.any():
            continue
        rows = got.get(i, [])
        have = [v for (v, _s) in rows]
        ids = {(int(s), int(v)) for (v, s) in rows}
        for v, si in zip(np.round(evn[i][keepm] * dim), ein[i][keepm]):
            nmatch = int((q_wh[i] == sw_h[si]).sum())
            guaranteed = nmatch >= 2
            tot += 1
            g_tot += guaranteed
            score_hit = v in have
            if score_hit:
                have.remove(v)
            if (int(si), int(v)) in ids:
                if guaranteed and not score_hit:
                    g_alias += 1  # present, but the multiset missed it
                continue
            if not guaranteed:
                continue
            g_miss += 1
            # ---------- post-mortem ----------
            mpos = np.where(q_wh[i] == sw_h[si])[0]
            print(f"\nLEAK #{g_miss}: query {i} shingle {si} "
                  f"score {v}/{dim} nmatch={nmatch} pos={mpos.tolist()}")
            print(f"  query at_risk (host recompute) = "
                  f"{bool(risk_host[i])}")
            print(f"  hybrid rows for this query: "
                  f"{sorted(got.get(i, []))}")
            texact = np.round(evn[i][keepm] * dim).astype(int)
            print(f"  exact top-k above thr: {sorted(texact.tolist())}")
            for t, (a, b) in enumerate(pairs):
                if a in mpos and b in mpos and a != b:
                    bid = int(_bucket_ids(
                        q_wh[i:i+1, a], q_wh[i:i+1, b],
                        np.uint32(bidx.salts[t]), bidx.num_buckets)[0])
                    lo, hi = int(off[t, bid]), int(off[t, bid + 1])
                    inb = si in ent[t, lo:hi].tolist()
                    print(f"  pair table {t} ({a},{b}): bucket {bid} "
                          f"full={hi-lo} cap={bcfg.cap} "
                          f"contains_si={inb}")
            if g_miss >= 20:
                print("...stopping after 20 leaks")
                break
        if g_miss >= 20:
            break
    print(f"\ntotals: {tot} exact entries, {g_tot} guaranteed")
    print(f"  identity accounting  : {g_miss} guaranteed TRULY missing "
          f"-> guaranteed recall {(g_tot-g_miss)/max(1,g_tot):.6f}")
    print(f"  score-multiset (pre-r5 artifact form): "
          f"{g_miss + g_alias} 'missed' "
          f"-> {(g_tot-g_miss-g_alias)/max(1,g_tot):.6f} "
          f"({g_alias} present-but-score-aliased)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "zipfab"
    if mode == "zipfab":
        mode_zipfab(*(int(a) for a in sys.argv[2:3]))
    else:
        mode_leak(*(int(a) for a in sys.argv[2:4]))
