"""Fused Pallas shingle-embedding kernel — stream to int8 vectors in one pass.

The jnp path (data/shingler.py embed_shingles) materializes per-position
intermediates that XLA mostly fuses; this kernel guarantees the single
pass: token hashes stream from HBM (4 B/token) and the only write is
the final int8 [M, dim] embedding matrix — no per-position partial sums
in HBM.

Vectorization: everything is computed directly in the output's
[TQ, dim] layout.  For shingle position p, the token-hash column
[TQ, 1] broadcasts across lanes, each lane multiplies by its odd
per-(position, lane) constant (data/hashing.py derive_sign_mults), and
the product's top bit is the ±1 sign feature — 1 wrapping multiply +
1 arithmetic shift + 1 multiply-add per output element.  An earlier
revision re-hashed (fmix32) per lane instead: ~20x the VPU work for
measured-identical noise statistics, and it made this kernel the
largest stage of the fused batch (38.5 ms vs the top-k matmul's 12 ms
at 2^20 shingles).  Bit-exact with the host oracle
(data/shingler.py embed_shingles_np); replaces the reference's
word-hash vectorizer (SURVEY.md section 3 "Shingler + hash vectorizer").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from fandom_search_tpu.config import ShingleConfig
from fandom_search_tpu.data.hashing import derive_sign_mults


def _embed_kernel(
    mults_ref,       # VMEM [n, dim] uint32 — odd multiply-shift constants
    *refs,           # n x VMEM [TQ, 1] uint32 shifted stream views + out
    n: int,
    dim: int,
    tile_q: int,
):
    # refs = (view_0, ..., view_{n-1}, out_ref); view_p's block i holds
    # stream[p + i*TQ : p + (i+1)*TQ] — the tokens at shingle position p
    # for this tile.  Blocks are [TQ, 1] (sublane-major) so the column
    # broadcasts against [TQ, dim] directly; passing the WHOLE stream as
    # one [T, 1] array instead would tile at 512 B/element in VMEM
    # (lane-dim 1), i.e. 128x waste and OOM for large batches.
    out_ref = refs[n]
    acc = jnp.zeros((tile_q, dim), jnp.int32)
    for p in range(n):
        tok = refs[p][:]                                # [TQ, 1] uint32
        mult = mults_ref[p : p + 1, :]                  # [1, dim]
        prod = tok * mult                               # wraps mod 2^32
        sign = jax.lax.shift_right_arithmetic(
            prod.astype(jnp.int32), jnp.int32(31)
        )                                               # 0 / -1
        acc = acc + (sign * 2 + 1)
    out_ref[:] = acc.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("shingle_cfg", "tile_q", "interpret")
)
def embed_shingles_pallas(
    token_hashes,              # uint32 [T]; M = T - n + 1 shingles
    shingle_cfg: ShingleConfig,
    mults=None,                # uint32 [n, dim]; derived if omitted
    *,
    tile_q: int = 512,
    interpret: bool = False,
):
    """uint32[T] -> int8[M, dim], M = T - n + 1. Pads rows internally."""
    cfg = shingle_cfg
    if mults is None:
        mults = jnp.asarray(derive_sign_mults(cfg.seed, cfg.n, cfg.dim))
    t = jnp.asarray(token_hashes, dtype=jnp.uint32)
    m = max(0, t.shape[0] - cfg.n + 1)
    if m == 0:
        return jnp.zeros((0, cfg.dim), dtype=jnp.int8)
    m_pad = -(-m // tile_q) * tile_q
    t_pad = m_pad + cfg.n - 1
    if t_pad > t.shape[0]:
        t = jnp.pad(t, (0, t_pad - t.shape[0]))
    # n shifted column views of the stream: view_p[i*TQ:(i+1)*TQ] are
    # the position-p tokens of tile i (overlapping windows are not
    # expressible as one BlockSpec)
    views = [t[p : p + m_pad].reshape(-1, 1) for p in range(cfg.n)]

    out = pl.pallas_call(
        functools.partial(
            _embed_kernel, n=cfg.n, dim=cfg.dim, tile_q=tile_q
        ),
        grid=(m_pad // tile_q,),
        in_specs=[pl.BlockSpec((cfg.n, cfg.dim), lambda i: (0, 0))]
        + [pl.BlockSpec((tile_q, 1), lambda i: (i, 0)) for _ in range(cfg.n)],
        out_specs=pl.BlockSpec((tile_q, cfg.dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, cfg.dim), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * cfg.dim * cfg.n,
            bytes_accessed=t_pad * 4 * cfg.n + m_pad * cfg.dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(mults, jnp.uint32), *views)
    return out[:m]
