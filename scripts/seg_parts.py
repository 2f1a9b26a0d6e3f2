#!/usr/bin/env python
"""Sub-op decomposition of the seg-stream stage (ops/bucketed.py
_flat_impl, impl="seg"): lengths-cumsum | marker scatter | seg scan |
delta gather | entry gather.  Interleaved rounds, scalar-pull sync
(DESIGN.md §7).

Usage: python scripts/seg_parts.py [log2_ns] [log2_nq]
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
    from fandom_search_tpu.data.shingler import shingle_hashes
    from fandom_search_tpu.ops.bucketed import (
        BucketedIndex, _next_qpow2, _pairs_for, _probe_geometry,
    )
    from fandom_search_tpu.ops.scan import scan1d_i32

    cfg = PipelineConfig()
    bcfg = BucketedConfig()
    n = cfg.shingle.n
    ns, nq = 1 << log2_ns, 1 << log2_nq
    rng = np.random.default_rng(0)
    s_stream = rng.integers(0, 2**32, size=ns + n - 1, dtype=np.uint32)
    q_stream = rng.integers(0, 2**32, size=nq + n - 1, dtype=np.uint32)
    for qi in range(0, nq, 100):
        si = int(rng.integers(0, ns))
        q_stream[qi : qi + n] = s_stream[si : si + n]
    windows = shingle_hashes(s_stream, cfg.shingle)
    bidx = BucketedIndex.build(windows, bcfg, cfg.shingle)
    qs_dev = jnp.asarray(q_stream)
    p = len(_pairs_for(n, bcfg.pairs))
    m = nq
    slack = max(2, -(-p // 3))
    E = _next_qpow2(slack * m + 8 * (1 << 14), 1024)
    print(f"M={m} P={p} M*P={m*p} E={E}")

    def sync(x):
        x = x[0] if isinstance(x, tuple) else x
        return np.asarray(jnp.sum(x.astype(jnp.float32)))

    geom = functools.partial(
        _probe_geometry, n=n, cap=bcfg.cap,
        num_buckets=bidx.num_buckets, salts=bidx.salts,
        pairs_mode=bcfg.pairs,
    )

    @jax.jit
    def st_geom(stream):
        return geom(stream, bidx.offsets)

    start, ln, _ = st_geom(qs_dev)
    sync(start)
    ln_flat = ln.reshape(-1)
    start_flat = start.reshape(-1)

    @jax.jit
    def p_cumlen(ln_flat):
        return scan1d_i32(ln_flat)

    csum = p_cumlen(ln_flat); sync(csum)
    out_start = csum - ln_flat

    @jax.jit
    def p_scatter(out_start):
        return jnp.zeros((E,), jnp.int32).at[
            jnp.minimum(out_start, E - 1)
        ].add(1, mode="drop")

    adds = p_scatter(out_start); sync(adds)

    @jax.jit
    def p_segscan(adds):
        return scan1d_i32(adds) - 1

    seg = p_segscan(adds); sync(seg)
    seg = jnp.clip(seg, 0, m * p - 1)

    @jax.jit
    def p_delta(start_flat, out_start, seg):
        delta = start_flat - out_start
        return jnp.arange(E, dtype=jnp.int32) + delta[seg]

    epos = p_delta(start_flat, out_start, seg); sync(epos)

    @jax.jit
    def p_entry(seg, epos):
        ecols = bidx.entries.shape[1]
        probe_i = seg % p
        return bidx.entries.reshape(-1)[
            probe_i * ecols + jnp.clip(epos, 0, ecols - 1)
        ]

    sid = p_entry(seg, epos); sync(sid)

    parts = [
        ("cumlen", lambda: p_cumlen(ln_flat)),
        ("scatter", lambda: p_scatter(out_start)),
        ("segscan", lambda: p_segscan(adds)),
        ("delta+gather", lambda: p_delta(start_flat, out_start, seg)),
        ("entrygather", lambda: p_entry(seg, epos)),
    ]
    best = {nm: float("inf") for nm, _ in parts}
    for r in range(3):
        line = []
        for nm, fn in parts:
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            best[nm] = min(best[nm], dt)
            line.append(f"{nm} {dt*1e3:.1f}")
        print(f"round {r}: " + " | ".join(line), flush=True)
    print("BEST: " + " | ".join(
        f"{nm} {best[nm]*1e3:.2f}ms" for nm, _ in parts
    ) + f" | SUM {sum(best.values())*1e3:.1f}ms")


if __name__ == "__main__":
    main()
