"""Pallas 1-D prefix scan (inclusive cumsum / cummax) for int32.

XLA's cumsum is fine at small sizes but scales super-linearly on this
device: chained-in-jit A/B (64 scans per sync, min of 8, 2026-08-19)
measured 0.47 ms @2^19 / 0.78 @2^21 / 2.10 @2^23 per scan.  A TPU
Pallas grid is sequential, which makes a single-pass scan trivial:
each grid step scans its [TR, 128] tile in VMEM (log-step shift-adds
on the VPU) and carries the running total across steps in SMEM
scratch.  One HBM read + one write: 0.49 / 0.47 / 0.78 ms at the same
sizes — a wash at 2^19, 1.7x at 2^21, 2.7x at 2^23.  ``scan1d_i32``
therefore self-gates: below ``_MIN_PALLAS_N`` it emits the jnp scan.
(An earlier 3.6 ms @2^19 figure that motivated this kernel was a
degraded-tunnel measurement artifact — per-call sync over the link.)

Layout: the 1-D stream enters LANES-first — view [n] as [R, 128]
row-major (DESIGN.md §6), lane-scan each row (7 doubling steps), then
combine with an exclusive sublane scan of the row totals.

The op is add/max-generic: "add" serves cumsum (compaction, segment
recovery, ranking), "max" serves cummax (segment-start propagation).
Identity padding (0 / INT32_MIN) makes the tail tile exact.

Reference parity note: there is no reference analogue — this is
infrastructure for the sub-linear candidate path (SURVEY.md §3
"ANN candidate search" obligation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TR = 512  # sublanes per grid step: [512, 128] i32 = 256 KB in VMEM
# below this the XLA scan is as fast or faster (A/B in module doc)
_MIN_PALLAS_N = 1 << 20


def _shift_scan(x, axis: int, size: int, op):
    """Inclusive scan along ``axis`` via log2(size) doubling steps.

    pltpu.roll rotates; entries wrapped from the end are masked to the
    op identity with a broadcasted-iota compare (32-bit, supported)."""
    y = x
    ident = jnp.int32(0) if op == "add" else jnp.int32(-(2**31))
    s = 1
    while s < size:
        rolled = pltpu.roll(y, s, axis=axis)
        idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, axis)
        contrib = jnp.where(idx >= s, rolled, ident)
        y = (y + contrib) if op == "add" else jnp.maximum(y, contrib)
        s *= 2
    return y


def _scan_kernel(x_ref, o_ref, carry_ref, *, op):
    j = pl.program_id(0)
    ident = jnp.int32(0) if op == "add" else jnp.int32(-(2**31))

    @pl.when(j == 0)
    def _init():
        carry_ref[0] = ident

    x = x_ref[:]                                     # [TR, 128]
    lane = _shift_scan(x, 1, _LANES, op)             # within-row scan
    rowtot = lane[:, _LANES - 1 :]                   # [TR, 1]
    rowinc = _shift_scan(rowtot, 0, x.shape[0], op)  # inclusive rows
    if op == "add":
        rowpref = rowinc - rowtot                    # exclusive rows
        o_ref[:] = lane + rowpref + carry_ref[0]
        carry_ref[0] = carry_ref[0] + rowinc[x.shape[0] - 1, 0]
    else:
        # exclusive row prefix for max: shift the inclusive scan down
        # one row, identity into row 0
        down = pltpu.roll(rowinc, 1, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, down.shape, 0)
        rowpref = jnp.where(idx >= 1, down, ident)
        o_ref[:] = jnp.maximum(jnp.maximum(lane, rowpref), carry_ref[0])
        carry_ref[0] = jnp.maximum(
            carry_ref[0], rowinc[x.shape[0] - 1, 0]
        )


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _scan_padded(x2, *, op, interpret):
    r = x2.shape[0]
    return pl.pallas_call(
        functools.partial(_scan_kernel, op=op),
        grid=(r // _TR,),
        in_specs=[
            pl.BlockSpec((_TR, _LANES), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_TR, _LANES), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x2)


def scan1d_i32(x, op: str = "add", *, interpret: bool = False):
    """Inclusive 1-D prefix scan of an int32 vector on TPU.

    ``op``: "add" (cumsum) or "max" (cummax).  Falls back to the jnp
    scan when the process backend is not a TPU (CPU tests, virtual
    meshes) — the trace-time check matches how the engine picks its
    kernels — and below ``_MIN_PALLAS_N``, where XLA's scan is at
    least as fast; results are identical either way (integer ops).
    """
    if op not in ("add", "max"):
        raise ValueError(f"op must be 'add' or 'max', got {op!r}")
    n = x.shape[0]
    use_pallas = interpret or (
        jax.default_backend() == "tpu" and n >= _MIN_PALLAS_N
    )
    if n == 0 or not use_pallas:
        return jnp.cumsum(x) if op == "add" else jax.lax.cummax(x)
    x = x.astype(jnp.int32)
    block = _TR * _LANES
    npad = -n % block
    ident = jnp.int32(0) if op == "add" else jnp.int32(-(2**31))
    if npad:
        x = jnp.concatenate([x, jnp.full((npad,), ident, jnp.int32)])
    out = _scan_padded(
        x.reshape(-1, _LANES), op=op, interpret=interpret
    )
    return out.reshape(-1)[:n]
