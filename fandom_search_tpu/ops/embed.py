"""Fused Pallas shingle-embedding kernel — stream to int8 vectors in one pass.

The jnp path (data/shingler.py embed_shingles) materializes per-position
hash/bit intermediates that XLA mostly fuses; this kernel guarantees the
single pass: token hashes stream from HBM (4 B/token) and the only write
is the final int8 [M, dim] embedding matrix — no [M, R] bit tables, no
per-position partial sums in HBM.

Vectorization: everything is computed directly in the output's
[TQ, dim] layout.  For shingle position p, the token-hash column
[TQ, 1] broadcasts across lanes, each lane XORs its word's salt
(lane l belongs to word l//32 of the sign expansion), fmix32 runs
elementwise, and lane l extracts bit l%32 — recomputing fmix32 per
lane is 32x redundant arithmetic, but it keeps the whole kernel in
plain [TQ, dim] vector form (no transposes, gathers, or cross-lane
shuffles), and the VPU has orders of magnitude more headroom than the
MXU matmul this kernel feeds.  Bit-exact with the host oracle
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
from fandom_search_tpu.data.hashing import derive_salts


def _fmix32(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _embed_kernel(
    salt_lanes_ref,  # VMEM [n, dim] uint32 — salts repeated 32x per word
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
    lane_shift = jax.lax.broadcasted_iota(jnp.uint32, (tile_q, dim), 1)
    lane_shift = lane_shift % jnp.uint32(32)

    acc = jnp.zeros((tile_q, dim), jnp.int32)
    for p in range(n):
        tok = refs[p][:]                                # [TQ, 1] uint32
        salt = salt_lanes_ref[p : p + 1, :]             # [1, dim]
        h = _fmix32(tok ^ salt)                         # [TQ, dim]
        bit = (h >> lane_shift) & jnp.uint32(1)
        acc = acc + (bit.astype(jnp.int32) * 2 - 1)
    out_ref[:] = acc.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("shingle_cfg", "tile_q", "interpret")
)
def embed_shingles_pallas(
    token_hashes,              # uint32 [T]; M = T - n + 1 shingles
    shingle_cfg: ShingleConfig,
    salts=None,                # uint32 [n, R]; derived if omitted
    *,
    tile_q: int = 512,
    interpret: bool = False,
):
    """uint32[T] -> int8[M, dim], M = T - n + 1. Pads rows internally."""
    cfg = shingle_cfg
    if salts is None:
        salts = jnp.asarray(derive_salts(cfg.seed, cfg.n, cfg.sign_rounds))
    t = jnp.asarray(token_hashes, dtype=jnp.uint32)
    m = max(0, t.shape[0] - cfg.n + 1)
    if m == 0:
        return jnp.zeros((0, cfg.dim), dtype=jnp.int8)
    m_pad = -(-m // tile_q) * tile_q
    t_pad = m_pad + cfg.n - 1
    if t_pad > t.shape[0]:
        t = jnp.pad(t, (0, t_pad - t.shape[0]))
    # lane l of word w uses salts[p, w]; expand to one uint32 per lane
    salt_lanes = jnp.repeat(jnp.asarray(salts, jnp.uint32), 32, axis=1)
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
            flops=30 * m_pad * cfg.dim * cfg.n,
            bytes_accessed=t_pad * 4 * cfg.n + m_pad * cfg.dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(salt_lanes, *views)
    return out[:m]
