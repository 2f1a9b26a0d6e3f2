#!/usr/bin/env python
"""Interleaved A/B: SW kernel f32 state vs i16 (concat-shift) state.

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
    la = np.full(B, w, np.int32)
    lb = np.full(B, mlt, np.int32)

    def run(state):
        return sw_normalized_pallas(a, b, la, lb, cfg, state=state)

    def sync(o):
        return np.asarray(jnp.sum(o))

    for s in ("f32", "i16"):
        sync(run(s))
    best = {"f32": float("inf"), "i16": float("inf")}
    for r in range(rounds):
        line = []
        for s in ("f32", "i16"):
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(s)
            sync(out)
            dt = (time.perf_counter() - t0) / 3
            best[s] = min(best[s], dt)
            line.append(f"{s} {dt*1e3:.1f}ms")
        print(f"round {r}: " + " | ".join(line), flush=True)
    cells = B * w * mlt
    print("BEST: " + " | ".join(
        f"{s} {best[s]*1e3:.1f}ms ({cells/best[s]/1e9:.2f} G cells/s)"
        for s in ("f32", "i16")
    ))


if __name__ == "__main__":
    main()
