#!/usr/bin/env python
"""Interleaved A/B of the SW kernel variants (VERDICT r2 #7, r4 #6).

NOTE (round 5): this script syncs every 3 calls, which carries ~RTT/3
of per-call tunnel overhead and COMPRESSES kernel ratios; the bench's
20-dispatch burst basis is the honest one and decided the default
(ops/smith_waterman.py round-5 verdict).  Keep this script for quick
parity + ordering checks; trust magnitudes from the burst basis.

Compares variant="fast" (round-3: double-buffered DP state + dynamic
trip count) against variant="r2" (round-2 copy-based kernel, static
trips) in ONE process with scalar-pull sync, under three length
regimes:

  * full:  len_a = window (64), len_b = max_line — the round-2 bench
    shape; isolates the double-buffer win (dynamic trips buy nothing).
  * real:  len_b ~ 5-20 tokens (script lines), len_a = window — the
    engine's actual verify distribution; dynamic trips dominate.
  * mixed: one long pair per tile — worst case for per-tile dynamic
    trips (one hot pair pins the whole tile's trip count).

Also A/Bs the i16-state attempt (historically Mosaic-blocked on v5e —
rerun to re-confirm on current toolchain).

Usage: python scripts/sw_ab.py [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax.numpy as jnp

    from fandom_search_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from fandom_search_tpu.config import PipelineConfig
    from fandom_search_tpu.ops.smith_waterman import sw_normalized_pallas

    cfg = PipelineConfig().search
    B, w, mlt = 8192, cfg.window_tokens, cfg.max_line_tokens
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(1, 1000, size=(B, w)).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 1000, size=(B, mlt)).astype(np.uint32))

    la_full = np.full(B, w, np.int32)
    lb_full = np.full(B, mlt, np.int32)
    lb_real = rng.integers(5, 21, size=B).astype(np.int32)
    la_real = np.minimum(w, 2 * lb_real + 6).astype(np.int32)
    lb_mixed = lb_real.copy()
    lb_mixed[::256] = mlt  # one long pair per 256-row tile
    la_mixed = la_real.copy()
    la_mixed[::256] = w

    regimes = {
        "full": (la_full, lb_full),
        "real": (la_real, lb_real),
        "mixed": (la_mixed, lb_mixed),
    }
    # r5: "wide" = transposed layout; "exitw" = wide + threshold exit;
    # "slide" = wide with the state roll replaced by a dynamic
    # sublane-offset read (the compile itself is part of the A/B —
    # sublane-dynamic slicing is the unproven lowering here)
    variants = ["fast", "r2", "wide", "exitw", "slide"]
    if "dyn" in sys.argv:
        variants.append("dyn")

    def run(variant, la, lb):
        return sw_normalized_pallas(a, b, la, lb, cfg, variant=variant)

    def sync(o):
        return np.asarray(jnp.sum(o))

    # correctness cross-check + warm.  exitw has thresholded semantics:
    # kept set + kept scores exact, sub-threshold residue may differ.
    thr = cfg.verify_threshold
    for name, (la, lb) in regimes.items():
        outs = [np.asarray(run(v, la, lb)) for v in variants]
        for o, v in zip(outs[1:], variants[1:]):
            if v == "exitw":
                keep0, keep = outs[0] >= thr, o >= thr
                assert np.array_equal(keep0, keep), (
                    f"exitw kept-set mismatch ({name})"
                )
                assert np.array_equal(outs[0][keep0], o[keep]), (
                    f"exitw kept-score mismatch ({name})"
                )
                assert np.all(o[~keep] < thr), f"exitw residue ({name})"
            else:
                assert np.array_equal(outs[0], o), (
                    f"variant mismatch ({name}:{v})"
                )
    print("variant parity OK across regimes", flush=True)

    best = {(n, v): float("inf") for n in regimes for v in variants}
    for r in range(rounds):
        for name, (la, lb) in regimes.items():
            for v in variants:  # interleaved within one phase
                t0 = time.perf_counter()
                for _ in range(3):
                    out = run(v, la, lb)
                sync(out)
                best[(name, v)] = min(
                    best[(name, v)], (time.perf_counter() - t0) / 3
                )
        print(f"round {r}: " + " | ".join(
            f"{n}:{v} {best[(n, v)]*1e3:.1f}ms"
            for n in regimes for v in variants
        ), flush=True)

    cells = B * w * mlt  # nominal cells (padded): same for all variants
    print("\nBEST (nominal G cells/s over the padded shape, vs r2):")
    for name in regimes:
        r2 = best[(name, "r2")]
        print(f"  {name:5s}: " + " | ".join(
            f"{v} {best[(name, v)]*1e3:6.1f}ms "
            f"({cells/best[(name, v)]/1e9:5.2f} G, x{r2/best[(name, v)]:.2f})"
            for v in variants
        ))

    # i16 re-attempt (expected to fail compile on v5e — see module doc;
    # it is a lane-major path, so pin variant="fast")
    try:
        sync(sw_normalized_pallas(
            a, b, la_full, lb_full, cfg, state="i16", variant="fast"
        ))
        print("i16 state COMPILED on this toolchain — re-A/B it!")
    except Exception as e:  # noqa: BLE001
        print(f"i16 state still blocked: {type(e).__name__}: "
              f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
