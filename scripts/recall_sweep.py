#!/usr/bin/env python
"""Recall frontier at flagship scale (VERDICT r4 #5): sweep
(pairs, cap, load_factor) at NS=2^22 and measure thresholded recall,
guaranteed recall, and hybrid-vs-exact wall-clock on both the uniform
and english-skew corpora — is thresholded >= 0.99 reachable at a
still-winning wall-clock, or is the e2e row-parity attestation the
right official gate?

Usage: python scripts/recall_sweep.py [log2_ns] [log2_nq] [uniform|english|both]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fandom_search_tpu.config import PipelineConfig  # noqa: E402
from fandom_search_tpu.data.shingler import shingle_hashes  # noqa: E402

cfg = PipelineConfig()
N = cfg.shingle.n


def build_world(kind, ns_c, nq_c, seed):
    r = np.random.default_rng(seed)
    if kind == "english":
        def words(count):
            return (
                (((r.zipf(1.01, size=count) - 1) % (1 << 19)) + 1)
                .astype(np.uint32) * np.uint32(0x9E3779B9)
            )
        plant_stride = 20
    else:
        def words(count):
            return r.integers(0, 2**32, size=count, dtype=np.uint32)
        plant_stride = 100
    s_stream = words(ns_c + N - 1)
    q_stream = words(nq_c + N - 1)
    for qi in range(0, nq_c, plant_stride):
        si = int(r.integers(0, ns_c))
        q_stream[qi:qi + N] = s_stream[si:si + N]
        if kind == "uniform":  # 0-2 mutations like the bench
            for p in r.choice(N, size=int(r.integers(0, 3)), replace=False):
                q_stream[qi + p] = r.integers(0, 2**32, dtype=np.uint32)
    return s_stream, q_stream


def main():
    import jax.numpy as jnp

    from fandom_search_tpu.ops.bucketed import (
        BucketedIndex, drive_hybrid,
    )
    from fandom_search_tpu.ops.distance_topk import (
        engine_tiles, pad_rows, topk_dot_pallas,
    )
    from fandom_search_tpu.ops.embed import embed_shingles_pallas_t
    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    log2_ns = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    log2_nq = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    kinds = sys.argv[3] if len(sys.argv) > 3 else "both"
    kinds = ["uniform", "english"] if kinds == "both" else [kinds]
    ns_c, nq_c = 1 << log2_ns, 1 << log2_nq
    k, dim = cfg.search.k, cfg.shingle.dim
    thr = cfg.search.candidate_threshold
    smax = N * N * dim

    sweep = [
        ("triangles", 8, 4),   # the default (bucketed_huge's config)
        ("all", 8, 4),         # the english config at uniform
        ("all", 16, 4),        # deeper buckets before overflow
        ("all", 8, 8),         # 2x buckets -> half occupancy
        ("triangles", 16, 8),  # default family, low-overflow corner
    ]

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    for kind in kinds:
        t0 = time.perf_counter()
        s_stream, q_stream = build_world(kind, ns_c, nq_c, seed=13)
        sw_h = shingle_hashes(s_stream, cfg.shingle)
        q_wh = shingle_hashes(q_stream, cfg.shingle)
        s_padz, nsz = pad_rows(
            embed_shingles_pallas_t(
                jnp.asarray(s_stream), cfg.shingle).T[:ns_c], 2048)
        q_tz = embed_shingles_pallas_t(
            jnp.asarray(q_stream), cfg.shingle)[:, :nq_c]
        q_devz = q_tz.T
        qs_devz = jnp.asarray(q_stream)
        tq_z, ts_z = engine_tiles(nq_c, s_padz.shape[0])
        print(f"[{kind}] world on device in {time.perf_counter()-t0:.1f}s",
              flush=True)

        def run_exact():
            return topk_dot_pallas(
                q_tz, s_padz, nsz, k, dim, tile_q=tq_z, tile_s=ts_z,
                min_keep=thr, q_transposed=True, max_abs_score=smax,
            )

        ev_d = run_exact()
        sync(ev_d[0])
        best_e = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run_exact()[0])
            best_e = min(best_e, time.perf_counter() - t0)
        evn, ein = np.asarray(ev_d[0]), np.asarray(ev_d[1])
        print(f"[{kind}] exact: {best_e*1e3:.1f} ms", flush=True)

        for pairs_mode, cap, load in sweep:
            bcfg = dataclasses.replace(
                cfg.bucketed, pairs=pairs_mode, cap=cap, load_factor=load)
            t0 = time.perf_counter()
            bidx = BucketedIndex.build(sw_h, bcfg, cfg.shingle)
            build_s = time.perf_counter() - t0
            max_out, risk_budget = 1 << 16, 1 << 13

            def run_hybrid():
                nonlocal max_out, risk_budget
                out, rc, max_out, risk_budget = drive_hybrid(
                    qs_devz, q_devz, bidx.entries, bidx.offsets,
                    s_padz, nsz,
                    n=N, cap=bcfg.cap, num_buckets=bidx.num_buckets,
                    salts=bidx.salts, k=k, dim=dim, threshold=thr,
                    pairs_mode=bcfg.pairs, max_out=max_out,
                    risk_budget=risk_budget, max_abs_score=smax,
                    grow_max_out=True,
                )
                return out, rc

            (hqp, hsi, hsc, hcnt), rc_n = run_hybrid()
            sync(hsc)
            best_h = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sync(run_hybrid()[0][2])
                best_h = min(best_h, time.perf_counter() - t0)

            hcnt_i = int(np.asarray(hcnt))
            # identity (si, score) accounting — the round-5 corrected
            # form (fandom_search_tpu.bench.skew_recall_accounting doc)
            from fandom_search_tpu.bench import skew_recall_accounting
            got = {}
            for q, s, v in zip(np.asarray(hqp)[:hcnt_i],
                               np.asarray(hsi)[:hcnt_i],
                               np.asarray(hsc)[:hcnt_i]):
                if q >= 0:
                    got.setdefault(int(q), set()).add(
                        (int(s), round(float(v) * dim)))
            gmin = 2 if pairs_mode == "all" else 3
            tot, hit, g_tot, g_hit = skew_recall_accounting(
                evn, ein, got, q_wh, sw_h, stride=17, thr=thr,
                dim=dim, guarantee_min=gmin,
            )
            print(
                f"[{kind}] pairs={pairs_mode:9s} cap={cap:2d} load={load} "
                f"| build {build_s:5.1f}s overflow "
                f"{bidx.overflow_frac:.4f} at-risk {rc_n/nq_c:6.2%} | "
                f"hybrid {best_h*1e3:7.1f} ms (x{best_e/best_h:5.2f}) | "
                f"thr-recall {hit/max(1,tot):.4f} "
                f"guaranteed {g_hit/max(1,g_tot):.4f} ({tot} entries)",
                flush=True,
            )


if __name__ == "__main__":
    main()
