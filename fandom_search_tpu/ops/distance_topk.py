"""Fused distance-matrix + top-k — the BallTree replacement.

The reference's candidate generation is a BallTree query per fanwork
shingle (SURVEY.md section 4.2 HOT LOOP 1).  On TPU the whole candidate
stage is one kernel (BASELINE.json:8): tile the [NQ, NS] score matrix,
compute each [TQ, TS] tile as an MXU matmul of int8 shingle embeddings,
and fold it immediately into a per-row running top-k held in VMEM — the
full distance matrix never exists in HBM.

Scores are ``dot(e_q, e_s) / dim`` ~= number of matching shingle
positions (see data/shingler.py).  Two implementations with identical
semantics (including lowest-index tie-breaking):

  * ``topk_dot_jnp``    — lax.top_k over score chunks; runs anywhere,
                          used as the in-repo oracle for the kernel.
  * ``topk_dot_pallas`` — the fused Pallas kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# jnp reference path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "dim"))
def topk_dot_jnp(
    q_emb: jax.Array,  # int8 [NQ, D]
    s_emb: jax.Array,  # int8 [NS, D]
    k: int,
    dim: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of dot/dim via one big matmul + lax.top_k.

    lax.top_k is stable (lowest index wins ties), matching both the
    NumPy oracle and the Pallas kernel.
    """
    scores = jax.lax.dot_general(
        q_emb.astype(jnp.bfloat16),
        s_emb.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vals, idx = jax.lax.top_k(scores, k)
    return vals / dim, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def merge_topk_tile(run_vals, run_idx, scores, col_ids, k: int) -> None:
    """Fold a [TQ, TS] score tile into running top-k VMEM buffers.

    k passes of (max, mask-out); ties break to the smallest global index
    (the oracle / lax.top_k convention).  Shared by the dot-score kernel
    here and the Hamming-code kernel in ops/lsh.py.
    """
    cat_vals = jnp.concatenate([run_vals[:], scores], axis=1)
    cat_idx = jnp.concatenate([run_idx[:], col_ids], axis=1)

    new_vals = []
    new_idx = []
    int_max = jnp.int32(2**31 - 1)
    for _ in range(k):
        m = jnp.max(cat_vals, axis=1, keepdims=True)                    # [TQ,1]
        eq = cat_vals == m
        sel = jnp.min(jnp.where(eq, cat_idx, int_max), axis=1, keepdims=True)
        taken = jnp.logical_and(eq, cat_idx == sel)
        new_vals.append(m)
        new_idx.append(sel)
        cat_vals = jnp.where(taken, NEG_INF, cat_vals)
    run_vals[:] = jnp.concatenate(new_vals, axis=1)
    run_idx[:] = jnp.concatenate(new_idx, axis=1)


def _topk_kernel(
    ns_valid_ref,  # SMEM (1,) int32 — true NS before padding
    q_ref,         # VMEM [TQ, D] int8
    s_ref,         # VMEM [TS, D] int8
    vals_ref,      # VMEM [TQ, K] f32 out
    idx_ref,       # VMEM [TQ, K] i32 out
    run_vals,      # VMEM scratch [TQ, K] f32
    run_idx,       # VMEM scratch [TQ, K] i32
    *,
    k: int,
    tile_s: int,
    inv_dim: float,
    compute: str,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals[:], NEG_INF)
        run_idx[:] = jnp.zeros_like(run_idx[:])

    # [TQ, TS] tile of the score matrix on the MXU.  Entries are in
    # [-n, n] so bf16 inputs are exact; the int8 path feeds the MXU's
    # native int8 mode (2x bf16 rate on v5e).
    if compute == "int8":
        scores = jax.lax.dot_general(
            q_ref[:],
            s_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        scores = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16),
            s_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    tq = scores.shape[0]
    tile_base = j * tile_s
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, tile_s), 1) + tile_base
    valid = col_ids < ns_valid_ref[0]
    scores = jnp.where(valid, scores, NEG_INF)

    merge_topk_tile(run_vals, run_idx, scores, col_ids, k)

    @pl.when(j == nj - 1)
    def _emit():
        vals_ref[:] = run_vals[:] * inv_dim
        idx_ref[:] = run_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "dim", "tile_q", "tile_s", "interpret", "compute"),
)
def topk_dot_pallas(
    q_emb: jax.Array,   # int8 [NQ, D], NQ % tile_q == 0
    s_emb: jax.Array,   # int8 [NS, D], NS % tile_s == 0 (pad rows zero)
    ns_valid,           # int32 scalar — true NS before padding
    k: int,
    dim: int,
    *,
    tile_q: int = 256,
    tile_s: int = 2048,
    interpret: bool = False,
    compute: str = "bf16",
) -> Tuple[jax.Array, jax.Array]:
    nq, d = q_emb.shape
    ns = s_emb.shape[0]
    assert nq % tile_q == 0, (nq, tile_q)
    assert ns % tile_s == 0, (ns, tile_s)
    grid = (nq // tile_q, ns // tile_s)

    kernel = functools.partial(
        _topk_kernel, k=k, tile_s=tile_s, inv_dim=1.0 / dim, compute=compute
    )
    ns_valid_arr = jnp.asarray(ns_valid, dtype=jnp.int32).reshape((1,))

    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, d), lambda i, j, ns_ref: (i, 0)),
                pl.BlockSpec((tile_s, d), lambda i, j, ns_ref: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, k), lambda i, j, ns_ref: (i, 0)),
                pl.BlockSpec((tile_q, k), lambda i, j, ns_ref: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_q, k), jnp.float32),
                pltpu.VMEM((tile_q, k), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * ns * d,
            bytes_accessed=nq * d + ns * d + nq * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ns_valid_arr, q_emb, s_emb)
    return vals, idx


def pad_rows(x: np.ndarray | jax.Array, multiple: int):
    """Zero-pad axis 0 to a multiple; returns (padded, original_len)."""
    n = x.shape[0]
    target = max(multiple, _round_up(n, multiple))
    if target == n:
        return x, n
    pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.pad(x, pad), n


def topk_dot(
    q_emb,
    s_emb,
    k: int,
    dim: int,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_q: int = 256,
    tile_s: int = 2048,
    compute: str = "bf16",
):
    """Dispatcher with automatic padding. Returns (vals, idx) for true rows."""
    nq = q_emb.shape[0]
    ns = s_emb.shape[0]
    if nq == 0 or ns == 0:
        return (
            jnp.full((nq, k), NEG_INF, dtype=jnp.float32),
            jnp.zeros((nq, k), dtype=jnp.int32),
        )
    if not use_pallas:
        return topk_dot_jnp(jnp.asarray(q_emb), jnp.asarray(s_emb), k, dim)
    qp, _ = pad_rows(jnp.asarray(q_emb), tile_q)
    sp, ns_valid = pad_rows(jnp.asarray(s_emb), tile_s)
    vals, idx = topk_dot_pallas(
        qp, sp, ns_valid, k, dim,
        tile_q=tile_q, tile_s=tile_s, interpret=interpret, compute=compute,
    )
    return vals[:nq], idx[:nq]
