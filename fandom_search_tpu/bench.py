#!/usr/bin/env python
"""Standard benchmark — prints ONE JSON line for the driver.

Primary metric (BASELINE.json:2): shingle-pairs/sec through the fused
distance+top-k kernel — the reference's BallTree candidate search
(SURVEY.md section 4.2 HOT LOOP 1) measured against the same-algorithm CPU
oracle on this machine (the reference publishes no numbers of its own;
BASELINE.md).  vs_baseline is the TPU/CPU rate ratio.

Extra detail (end-to-end engine wall-clock, SW verify rate, LSH recall)
goes to stderr and bench_details.json — the one stdout line stays clean.

Env knobs: BENCH_NQ, BENCH_NS, BENCH_CPU_NQ (sizes), BENCH_SKIP_E2E=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    from pathlib import Path

    cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    try:
        cache.mkdir(exist_ok=True)
    except OSError:  # installed read-only
        import tempfile

        cache = Path(tempfile.gettempdir()) / "fandom_search_tpu_jax_cache"
        cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fandom_search_tpu.config import PipelineConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import topk_dot
    from fandom_search_tpu.search.oracle import topk_scores_np

    cfg = PipelineConfig()
    k, dim = cfg.search.k, cfg.shingle.dim
    platform = jax.devices()[0].platform
    log(f"benchmark on {jax.devices()[0]} (platform={platform})")

    nq = int(os.environ.get("BENCH_NQ", 1 << 17))
    ns = int(os.environ.get("BENCH_NS", 8192))
    cpu_nq = int(os.environ.get("BENCH_CPU_NQ", 2048))

    rng = np.random.default_rng(0)
    log(f"building embeddings: {nq} query + {ns} script shingles")
    q_emb = embed_shingles_np(
        rng.integers(0, 2**32, size=nq + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )
    s_emb = embed_shingles_np(
        rng.integers(0, 2**32, size=ns + cfg.shingle.n - 1, dtype=np.uint32),
        cfg.shingle,
    )

    # ---- CPU baseline (the reference algorithm, NumPy oracle) ----------
    t0 = time.perf_counter()
    topk_scores_np(q_emb[:cpu_nq], s_emb, k, dim)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = cpu_nq * ns / cpu_dt
    log(f"CPU oracle: {cpu_nq}x{ns} in {cpu_dt:.3f}s -> {cpu_rate/1e6:.1f} M pairs/s")

    # ---- TPU fused kernel ----------------------------------------------
    # NOTE: on the axon remote platform block_until_ready does not wait
    # for remote completion, so we sync by reducing to a scalar ON DEVICE
    # and transferring those 4 bytes.
    import jax.numpy as jnp

    use_pallas = platform != "cpu"
    interpret = platform == "cpu"
    q_dev, s_dev = jnp.asarray(q_emb), jnp.asarray(s_emb)

    def run_once():
        vals, idx = topk_dot(
            q_dev, s_dev, k, dim, use_pallas=use_pallas, interpret=interpret
        )
        return vals

    _ = np.asarray(jnp.sum(run_once()))  # compile + warm
    iters = 10
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = jnp.sum(run_once())
    _ = np.asarray(acc)  # scalar sync
    dev_dt = (time.perf_counter() - t0) / iters
    dev_rate = nq * ns / dev_dt
    log(f"device fused kernel: {nq}x{ns} in {dev_dt*1e3:.1f}ms "
        f"-> {dev_rate/1e9:.2f} G pairs/s")

    details = {
        "device": str(jax.devices()[0]),
        "nq": nq,
        "ns": ns,
        "cpu_pairs_per_sec": cpu_rate,
        "device_pairs_per_sec": dev_rate,
        "speedup": dev_rate / cpu_rate,
    }

    # ---- optional end-to-end engine ------------------------------------
    if not os.environ.get("BENCH_SKIP_E2E"):
        from fandom_search_tpu.data.script_parser import parse_script
        from fandom_search_tpu.search.engine import SearchEngine
        from fandom_search_tpu.search.index import build_script_index
        from fandom_search_tpu.utils.synthetic import (
            make_corpus_with_quotes, make_script, make_vocab,
        )

        vocab = make_vocab(rng, 5000)
        script_text = make_script(rng, vocab, num_lines=200, words_per_line=(6, 14))
        lines = parse_script(script_text)
        index = build_script_index(lines, cfg.shingle, cfg.search)
        n_works = int(os.environ.get("BENCH_E2E_WORKS", 200))
        works, _ = make_corpus_with_quotes(
            rng, [ln.text for ln in lines], num_works=n_works,
            words_per_work=2000, quotes_per_work=3, vocab=vocab,
        )
        eng = SearchEngine(
            index, cfg, use_pallas=use_pallas, interpret=interpret
        )
        rows, _ = eng.search_works(dict(list(works.items())[:4]))  # warm/compile
        t0 = time.perf_counter()
        rows, stats = eng.search_works(works)
        e2e_dt = time.perf_counter() - t0
        total_pairs = stats.shingle_pairs
        log(f"end-to-end: {n_works} works ({stats.num_query_shingles} shingles) "
            f"vs {index.num_shingles}-shingle script in {e2e_dt:.2f}s, "
            f"{len(rows)} match rows")
        details.update({
            "e2e_works": n_works,
            "e2e_seconds": e2e_dt,
            "e2e_query_shingles": stats.num_query_shingles,
            "e2e_matches": len(rows),
            "e2e_pairs_per_sec": total_pairs / e2e_dt if e2e_dt else 0,
            "e2e_device_topk_seconds": stats.seconds_device_topk,
            "e2e_device_verify_seconds": stats.seconds_device_verify,
            "e2e_host_seconds": stats.seconds_host,
        })

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)
    log("details -> bench_details.json")

    print(json.dumps({
        "metric": "shingle_pairs_per_sec",
        "value": round(dev_rate),
        "unit": "pairs/s",
        "vs_baseline": round(dev_rate / cpu_rate, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
