"""Where does a FIRING tile's cost actually live? — VERDICT r3 #5.

gate_ab.py showed sub-tile gate granularity is a wash, and the row-
extraction merge (merge="rows") LOSES despite doing ~30x less VPU
work, so the hit-dense cost is evidently not the merge traversals
themselves.  This probe builds a ladder of stripped kernels sharing
the real matmul + gate skeleton and measures them interleaved on the
1%-plant corpus:

  noop    — gate fires but the body only writes the SMEM flag
  insert1 — gate + the m1 fast-path insert (inv1 traversal + insert),
            NO second-entrant check (inexact: timing only)
  full    — the production insert merge (topk_dot_pallas merge=insert)
  clean   — the production kernel on a no-plant corpus (control)

If noop ~= full, the cost is the taken-branch pipeline disruption
itself (DMA prefetch stall), and merge-body optimization is pointless;
if noop ~= clean, the body traversals are the target after all.

Usage: python scripts/fire_cost_probe.py [rounds=5] [log2_nq=17] [log2_ns=13]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    lnq = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    lns = int(sys.argv[3]) if len(sys.argv) > 3 else 13

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fandom_search_tpu.config import ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import (
        _COL_BITS, _PACK_SENTINEL,
        engine_tiles, pad_rows, topk_dot_pallas,
    )
    _COL_MASK = (1 << _COL_BITS) - 1

    scfg = ShingleConfig()
    nq, ns = 1 << lnq, 1 << lns
    dim, k, mk = scfg.dim, 10, 3.5
    mk_i = int(np.ceil(mk * dim))
    rng = np.random.default_rng(7)
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    s_emb = embed_shingles_np(s_stream, scfg)
    sp, nsv = pad_rows(jnp.asarray(s_emb), 2048)
    tq, ts = engine_tiles(nq, sp.shape[0])
    print(f"devices: {jax.devices()}  tiles {tq}x{ts}", flush=True)

    def make_stripped(body_kind):
        def kern(ns_valid_ref, q_ref, s_ref, vals_ref, run_ref, flag_ref):
            j = pl.program_id(1)
            nj = pl.num_programs(1)

            @pl.when(j == 0)
            def _init():
                run_ref[:] = jnp.full_like(run_ref[:], _PACK_SENTINEL)

            scores_i = jax.lax.dot_general(
                q_ref[:], s_ref[:],
                dimension_numbers=((((0,), (1,))), ((), ())),
                preferred_element_type=jnp.int32,
            )
            tile_base = j * ts
            row_max = jnp.max(scores_i, axis=1, keepdims=True)
            kth = jax.lax.shift_right_arithmetic(
                run_ref[:, k - 1 : k], _COL_BITS
            )
            can = jnp.any(
                jnp.logical_and(row_max > kth, row_max >= jnp.int32(mk_i))
            )

            @pl.when(can)
            def _body():
                if body_kind == "noop":
                    flag_ref[0] = jnp.int32(1)
                    return
                # m1 fast-path insert (no second-entrant check)
                inv = (
                    jnp.int32(_COL_MASK - tile_base)
                    - jax.lax.broadcasted_iota(
                        jnp.int32, (tq, ts), 1)
                )
                inv1 = jnp.max(
                    jnp.where(scores_i == row_max, inv, jnp.int32(-1)),
                    axis=1, keepdims=True,
                )
                m1p = row_max * jnp.int32(1 << _COL_BITS) + inv1
                elig = jnp.logical_and(
                    jnp.logical_and(
                        row_max >= jnp.int32(mk_i), inv1 >= 0
                    ),
                    m1p > run_ref[:, k - 1 : k],
                )
                mi = jnp.where(elig, m1p, jnp.int32(_PACK_SENTINEL))
                run = run_ref[:]
                top = jnp.full((tq, 1), jnp.int32(2**31 - 1))
                shifted = jnp.concatenate([top, run[:, : k - 1]], axis=1)
                run_ref[:] = jnp.maximum(run, jnp.minimum(shifted, mi))

            @pl.when(j == nj - 1)
            def _emit():
                vals_ref[:] = run_ref[:]

        return kern

    def stripped_call(q_t, kind):
        kern = make_stripped(kind)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nq // tq, sp.shape[0] // ts),
                in_specs=[
                    pl.BlockSpec((dim, tq), lambda i, j, n: (0, i)),
                    pl.BlockSpec((ts, dim), lambda i, j, n: (j, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((tq, k), lambda i, j, n: (i, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((tq, k), jnp.int32),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((nq, k), jnp.int32)],
        )(jnp.asarray(np.array([int(nsv)], np.int32)), q_t, sp)[0]

    strip_jit = {
        kind: jax.jit(functools.partial(stripped_call, kind=kind))
        for kind in ("noop", "insert1")
    }

    def sync(v):
        return float(np.asarray(jnp.sum(v.astype(jnp.float32))))

    for density, stride in (("clean", 0), ("1%", 100)):
        q_stream = rng.integers(
            0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32
        )
        if stride:
            for qi in range(0, nq, stride):
                si = int(rng.integers(0, ns))
                q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
        q_emb = embed_shingles_np(q_stream, scfg)
        qt = jnp.asarray(np.ascontiguousarray(q_emb.T))

        runs = {
            "noop": lambda: strip_jit["noop"](qt),
            "insert1": lambda: strip_jit["insert1"](qt),
            "full": lambda: topk_dot_pallas(
                qt, sp, nsv, k, dim, tile_q=tq, tile_s=ts, min_keep=mk,
                q_transposed=True, merge="insert",
            )[0],
        }
        best = {kname: float("inf") for kname in runs}
        for kname, fn in runs.items():
            sync(fn())  # warm
        iters = 10  # amortize the tunnel RTT over a dispatch burst
        for _ in range(rounds):
            for kname, fn in runs.items():
                t0 = time.perf_counter()
                out = None
                for _ in range(iters):
                    out = fn()
                sync(out)
                best[kname] = min(
                    best[kname], (time.perf_counter() - t0) / iters
                )
        msg = "  ".join(
            f"{kname} {best[kname]*1e3:6.2f} ms "
            f"({nq*ns/best[kname]/1e9:5.1f} G)"
            for kname in runs
        )
        print(f"[{density}] {msg}", flush=True)


if __name__ == "__main__":
    main()
