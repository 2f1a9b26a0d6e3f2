#!/usr/bin/env python
"""Burst-basis SW variant A/B — the measurement that decided the
round-5 default (ops/smith_waterman.py round-5 verdict).

Times 20-dispatch bursts per sync (the bench's honest basis — the
3-call sync of scripts/sw_ab.py carries ~RTT/3 of per-call tunnel
overhead and COMPRESSES kernel ratios), interleaved across variants,
best of 6 rounds, on three regimes:

  * full:        la = lb = 64 — the bench shape;
  * sorted-real: lb ~ 5-20, la = min(64, 2*lb+6), sorted by la+lb
    descending exactly like the engine's verify-batch length sort —
    the regime the engine actually runs;
  * mixed:       one long pair per tile_b rows, unsorted.

Round-5 verdict (2026-08-21, B=8192, best of 6):
  full:   fast 4.58 ms (7.33 G cells/s) | wide 2.72 (12.33 G)
          | slide 2.58 (13.01 G)
  sorted: fast 3.33 | wide 3.36 | slide 3.17 ms
  mixed:  wide x1.09 vs fast
slide wins everywhere it compiles but the sharded path's AOT compiler
rejects its dynamic sublane load, so "wide" is the default and slide
the single-chip opt-in.

Usage: python scripts/sw_burst_ab.py [rounds] [iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import PipelineConfig
    from fandom_search_tpu.ops.smith_waterman import sw_normalized_pallas

    cfg = PipelineConfig().search
    B, w, mlt = 8192, cfg.window_tokens, cfg.max_line_tokens
    r = np.random.default_rng(5)
    a = r.integers(1, 1000, size=(B, w)).astype(np.uint32)
    b = r.integers(1, 1000, size=(B, mlt)).astype(np.uint32)

    lb_real = r.integers(5, 21, size=B).astype(np.int32)
    la_real = np.minimum(w, 2 * lb_real + 6).astype(np.int32)
    order = np.argsort(-(la_real + lb_real), kind="stable")
    lb_mixed = lb_real.copy()
    lb_mixed[::128] = mlt
    la_mixed = la_real.copy()
    la_mixed[::128] = w

    regimes = {
        "full": (a, b, np.full(B, w, np.int32), np.full(B, mlt, np.int32)),
        "sorted-real": (a[order], b[order], la_real[order], lb_real[order]),
        "mixed": (a, b, la_mixed, lb_mixed),
    }
    regimes = {
        n: tuple(jnp.asarray(x) for x in ops) for n, ops in regimes.items()
    }
    variants = ["fast", "wide", "slide"]

    def run(v, ops):
        return sw_normalized_pallas(*ops, cfg, variant=v)

    for ops in regimes.values():
        for v in variants:
            np.asarray(jnp.sum(run(v, ops)))  # warm/compile

    best = {(n, v): float("inf") for n in regimes for v in variants}
    for rnd in range(rounds):
        for name, ops in regimes.items():
            for v in variants:
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = run(v, ops)
                np.asarray(jnp.sum(o))
                best[(name, v)] = min(
                    best[(name, v)], (time.perf_counter() - t0) / iters
                )
        print(f"round {rnd}: " + " | ".join(
            f"{n}:{v} {best[(n, v)]*1e3:.2f}ms"
            for n in regimes for v in variants
        ), flush=True)

    c = B * w * mlt
    print(f"\nBEST ({iters}-dispatch bursts, nominal G cells/s, vs fast):")
    for name in regimes:
        f = best[(name, "fast")]
        print(f"  {name:12s}: " + " | ".join(
            f"{v} {best[(name, v)]*1e3:5.2f}ms "
            f"({c/best[(name, v)]/1e9:5.2f} G, x{f/best[(name, v)]:.2f})"
            for v in variants
        ))


if __name__ == "__main__":
    main()
