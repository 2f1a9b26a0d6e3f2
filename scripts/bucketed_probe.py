#!/usr/bin/env python
"""A/B probe: exact fused kernel vs bucketed prefilter at large NS.

Interleaved same-process A/B with scalar-pull sync (the axon tunnel's
throughput phases make anything else untrustworthy — DESIGN.md §7).

Usage: python scripts/bucketed_probe.py [log2_ns] [log2_nq] [zipf|english] [all]
  "zipf"    -> Zipf-1.3%50k word distribution (hot-bucket stress; the
               #5c corpus whose reroute fraction is pinned ~86% —
               DESIGN.md §4.4)
  "english" -> zipf-1.01 over a 2^19 vocab (top word ~2.6%, the
               realistic-text regime; pair with "all" for the
               deterministic >=2-match guarantee at ~7% reroute)
  "all"     -> pairs="all" probe mode (15 probes, >=2-match guarantee)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp

    return np.asarray(jnp.sum(x[0].astype(jnp.float32) if isinstance(x, tuple) else x))


def main():
    log2_ns = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    log2_nq = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    zipf = "zipf" in sys.argv[3:]
    english = "english" in sys.argv[3:]
    all_pairs = "all" in sys.argv[3:]

    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import BucketedConfig, PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np, shingle_hashes
    from fandom_search_tpu.ops.bucketed import (
        BucketedIndex, bucketed_candidates_flat, bucketed_topk,
    )
    from fandom_search_tpu.ops.distance_topk import (
        engine_tiles, pad_rows, topk_dot_pallas,
    )

    cfg = PipelineConfig()
    bcfg = BucketedConfig(pairs="all" if all_pairs else "triangles")
    interpret = jax.devices()[0].platform == "cpu"  # CPU validation runs
    k, dim, n = cfg.search.k, cfg.shingle.dim, cfg.shingle.n
    thr = cfg.search.candidate_threshold
    ns, nq = 1 << log2_ns, 1 << log2_nq
    rng = np.random.default_rng(0)

    # ONE vocab shared by the script and query streams.  The original
    # probe drew a FRESH random vocab inside each stream_of call, so
    # the 99% noise portion of the query stream shared no words with
    # the index — every noise probe hashed to a cold bucket and the
    # measured at-risk fraction was ~0.5-7% where the bench's shared-
    # vocab corpora (the realistic case: fanfic speaks the script's
    # language) measure ~7-99%.  Quantified host-side 2026-08-19:
    # identical index overflow (0.56%), at-risk 0.1% (disjoint vocab)
    # vs 6.4-6.9% (shared vocab) on english-skew at 2^18.
    zipf_vocab = rng.integers(0, 2**32, size=50000, dtype=np.uint32)
    eng_vocab = rng.integers(0, 2**32, size=1 << 19, dtype=np.uint32)

    def stream_of(tokens):
        if zipf:
            # Zipf-ish word distribution over a 50k vocab: hot bigrams
            # exist, stressing the bucket cap
            ranks = rng.zipf(1.3, size=tokens) % 50000
            return zipf_vocab[ranks]
        if english:
            # English-like skew (bench #5d): top word ~2.6% of tokens
            ranks = rng.zipf(1.01, size=tokens) % (1 << 19)
            return eng_vocab[ranks]
        return rng.integers(0, 2**32, size=tokens, dtype=np.uint32)

    t0 = time.perf_counter()
    s_stream = stream_of(ns + n - 1)
    q_stream = stream_of(nq + n - 1)
    # ~1% plants with 0-2 mutations
    for qi in range(0, nq, 100):
        si = int(rng.integers(0, ns))
        q_stream[qi : qi + n] = s_stream[si : si + n]
        for p in rng.choice(n, size=int(rng.integers(0, 3)), replace=False):
            q_stream[qi + p] = rng.integers(0, 2**32, dtype=np.uint32)
    windows = shingle_hashes(s_stream, cfg.shingle)
    s_emb = embed_shingles_np(s_stream, cfg.shingle)
    q_emb = embed_shingles_np(q_stream, cfg.shingle)
    dist = "zipf" if zipf else ("english" if english else "uniform")
    print(f"world built in {time.perf_counter()-t0:.1f}s "
          f"(ns={ns}, nq={nq}, dist={dist}, pairs={bcfg.pairs})",
          flush=True)

    t0 = time.perf_counter()
    bidx = BucketedIndex.build(windows, bcfg, cfg.shingle)
    print(f"bucket build {time.perf_counter()-t0:.2f}s, "
          f"B={bidx.num_buckets}, overflow={bidx.overflow_frac:.4f}",
          flush=True)

    s_pad, ns_valid = pad_rows(jnp.asarray(s_emb), 2048)
    q_dev_t = jnp.asarray(np.ascontiguousarray(q_emb.T))
    q_dev = jnp.asarray(q_emb)
    q_stream_dev = jnp.asarray(q_stream)
    smax = n * n * dim

    tq, ts = engine_tiles(nq, s_pad.shape[0])

    def run_exact():
        return topk_dot_pallas(
            q_dev_t, s_pad, ns_valid, k, dim, min_keep=thr,
            tile_q=tq, tile_s=ts, interpret=interpret,
            q_transposed=True, max_abs_score=smax,
        )

    def run_bucketed():
        # the flat triple path — what the engine runs
        out = bucketed_candidates_flat(
            q_stream_dev, q_dev, bidx.entries, bidx.offsets, s_pad,
            n=n, cap=bcfg.cap, num_buckets=bidx.num_buckets,
            salts=bidx.salts, k=k, dim=dim, threshold=thr,
            max_out=1 << 16, pairs_mode=bcfg.pairs,
        )
        return out[2], out

    # warm/compile both
    ev, ei = run_exact()
    sync(ev)
    _, bt = run_bucketed()
    bv, bi = bucketed_topk(
        q_dev, q_stream_dev, bidx, s_pad, k, dim, bcfg, cfg.shingle
    )
    sync(bv)

    # thresholded recall: exact entries >= thr found by bucketed with
    # equal score (multiset by score, per query).  Split into the
    # GUARANTEED set (>= g true matching positions — the pigeonhole
    # bound) and all: above-threshold entries with < g matches are
    # hash-noise riding the threshold, which downstream SW
    # verification rejects anyway.
    g_bound = 2 if all_pairs else 3
    q_windows = shingle_hashes(q_stream, cfg.shingle)
    evn, ein = np.asarray(ev), np.asarray(ei)
    bvn = np.asarray(bv)
    tot = hit = g_tot = g_hit = 0
    for i in range(0, nq, 37):  # subsample queries
        keep = evn[i] >= thr
        if not keep.any():
            continue
        got = sorted(bvn[i].tolist(), reverse=True)
        for v, si in zip(evn[i][keep], ein[i][keep]):
            guaranteed = (
                int((q_windows[i] == windows[si]).sum()) >= g_bound
            )
            tot += 1
            g_tot += guaranteed
            if v in got:
                got.remove(v)
                hit += 1
                g_hit += guaranteed
    rec = hit / max(1, tot)
    g_rec = g_hit / max(1, g_tot)
    print(f"thresholded recall (subsampled, {tot} entries): {rec:.4f}; "
          f"guaranteed-set (>= {g_bound} matches, {g_tot} entries): "
          f"{g_rec:.4f}", flush=True)

    # interleaved A/B, best of rounds
    best_e = best_b = float("inf")
    for r in range(4):
        t0 = time.perf_counter()
        sync(run_exact()[0])
        dt_e = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(run_bucketed()[0])
        dt_b = time.perf_counter() - t0
        best_e, best_b = min(best_e, dt_e), min(best_b, dt_b)
        print(f"round {r}: exact {dt_e*1e3:.1f} ms | bucketed "
              f"{dt_b*1e3:.1f} ms", flush=True)
    pairs = nq * ns
    print(f"BEST: exact {best_e*1e3:.1f} ms ({pairs/best_e/1e9:.1f} G "
          f"pairs/s) | bucketed {best_b*1e3:.1f} ms "
          f"({pairs/best_b/1e9:.1f} G pairs/s-equiv) | "
          f"speedup x{best_e/best_b:.1f} at recall {rec:.4f}")

    # ---- hybrid (bucketed + exact reroute for at-risk queries) ---------
    from fandom_search_tpu.ops.bucketed import drive_hybrid

    risk_budget = 1024
    max_out = 1 << 16

    def run_hybrid():
        nonlocal risk_budget, max_out
        out, rc, max_out, risk_budget = drive_hybrid(
            q_stream_dev, q_dev, bidx.entries, bidx.offsets, s_pad,
            ns_valid,
            n=n, cap=bcfg.cap, num_buckets=bidx.num_buckets,
            salts=bidx.salts, k=k, dim=dim, threshold=thr,
            pairs_mode=bcfg.pairs,
            max_out=max_out, risk_budget=risk_budget,
            interpret=interpret, max_abs_score=smax,
            grow_max_out=True,  # never truncate measured triples
        )
        return out, rc

    (hqp, hsi, hsc, hcnt), rc = run_hybrid()  # warm + budget settle
    sync(hsc)
    best_h = float("inf")
    for r in range(4):
        t0 = time.perf_counter()
        sync(run_hybrid()[0][2])
        best_h = min(best_h, time.perf_counter() - t0)
    # thresholded recall of the hybrid triples vs the exact kernel
    from fandom_search_tpu.ops.bucketed import thresholded_recall_vs_exact

    rec_h, tot_h = thresholded_recall_vs_exact(
        evn, hqp, hsc, hcnt, dim=dim, threshold=thr, stride=37,
    )
    print(f"HYBRID: {best_h*1e3:.1f} ms ({pairs/best_h/1e9:.1f} G "
          f"pairs/s-equiv) | at-risk queries {rc}/{nq} "
          f"({rc/max(1,nq):.1%}) | vs exact x{best_e/best_h:.2f} | "
          f"thresholded recall {rec_h:.4f} "
          f"(subsampled, {tot_h} entries)")


if __name__ == "__main__":
    main()
