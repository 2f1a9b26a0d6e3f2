"""Fused Pallas shingle-embedding kernel — stream to int8 vectors in one pass.

The jnp path (data/shingler.py embed_shingles) materializes per-position
intermediates that XLA mostly fuses; this kernel guarantees the single
pass: token hashes stream from HBM (4 B/token) and the only write is
the final int8 embedding matrix.

Layout is the load-bearing decision.  The embedding is LANE-MAJOR:
the kernel emits e_T [dim, M] — shingles along lanes, embedding
dimension along sublanes — because the input is a 1-D token stream.
A [M, dim] output needs the stream distributed across *sublanes*
([TQ, 1] column views), and a (TQ, 1) block is a strided DMA that
Mosaic pads to full lane width: the row-major kernel measured
12.4 ms / 2^20 shingles on v5e regardless of how cheap the per-element
math got (it was DMA-bound, not compute-bound).  Lane-major views are
(1, TM) blocks — one contiguous DMA per position — and the same math
runs in 3.6 ms.  The distance kernel consumes e_T directly
(ops/distance_topk.py q_transposed=True; the MXU contracts the sublane
axis natively, measured *faster* than the row-major matmul).

Per element the math is one wrapping multiply + arithmetic shift
(multiply-shift sign hashing, data/hashing.py derive_sign_mults).
Bit-exact with the host oracle (data/shingler.py embed_shingles_np);
replaces the reference's word-hash vectorizer (SURVEY.md section 3
"Shingler + hash vectorizer").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from fandom_search_tpu.config import ShingleConfig
from fandom_search_tpu.data.hashing import derive_sign_mults


def _embed_kernel_t(
    mults_ref,       # VMEM [dim, n] uint32 — odd multiply-shift constants
    *refs,           # n x VMEM [1, TM] uint32 shifted stream views + out
    n: int,
    dim: int,
    tile_m: int,
):
    # refs = (view_0, ..., view_{n-1}, out_ref); view_p's block i holds
    # stream[p + i*TM : p + (i+1)*TM] — the tokens at shingle position p
    # for this tile, as one contiguous lane-major row.
    out_ref = refs[n]
    acc = jnp.zeros((dim, tile_m), jnp.int32)
    for p in range(n):
        tok = refs[p][:]                                # [1, TM] uint32
        mult = mults_ref[:, p : p + 1]                  # [dim, 1]
        prod = tok * mult                               # wraps mod 2^32
        sign = jax.lax.shift_right_arithmetic(
            prod.astype(jnp.int32), jnp.int32(31)
        )                                               # 0 / -1
        acc = acc + (sign * 2 + 1)
    out_ref[:] = acc.astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("shingle_cfg", "tile_m", "interpret")
)
def embed_shingles_pallas_t(
    token_hashes,              # uint32 [T]; M = T - n + 1 shingles
    shingle_cfg: ShingleConfig,
    mults=None,                # uint32 [n, dim]; derived if omitted
    *,
    tile_m: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """uint32[T] -> int8 e_T [dim, M_pad], M = T - n + 1 (static).

    M_pad rounds M up to tile_m; columns beyond M are garbage and the
    caller masks or slices them (the engine's span-bounds check already
    rejects padded query positions).  M is a static-shape fact, so the
    caller computes it: returning it would turn it into a traced value
    under an outer jit.
    """
    cfg = shingle_cfg
    if mults is None:
        mults = derive_sign_mults(cfg.seed, cfg.n, cfg.dim)
    mults_t = jnp.asarray(mults, jnp.uint32).T  # [dim, n]; tiny constant
    t = jnp.asarray(token_hashes, dtype=jnp.uint32)
    m = max(0, t.shape[0] - cfg.n + 1)
    if m == 0:
        return jnp.zeros((cfg.dim, 0), dtype=jnp.int8)
    m_pad = -(-m // tile_m) * tile_m
    t_pad = m_pad + cfg.n - 1
    if t_pad > t.shape[0]:
        t = jnp.pad(t, (0, t_pad - t.shape[0]))
    views = [t[p : p + m_pad].reshape(1, -1) for p in range(cfg.n)]

    out = pl.pallas_call(
        functools.partial(
            _embed_kernel_t, n=cfg.n, dim=cfg.dim, tile_m=tile_m
        ),
        grid=(m_pad // tile_m,),
        in_specs=[pl.BlockSpec((cfg.dim, cfg.n), lambda i: (0, 0))]
        + [pl.BlockSpec((1, tile_m), lambda i: (0, i)) for _ in range(cfg.n)],
        out_specs=pl.BlockSpec((cfg.dim, tile_m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((cfg.dim, m_pad), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * cfg.dim * cfg.n,
            bytes_accessed=t_pad * 4 * cfg.n + m_pad * cfg.dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mults_t, *views)
    return out


def embed_shingles_pallas(
    token_hashes,
    shingle_cfg: ShingleConfig,
    mults=None,
    *,
    tile_m: int = 2048,
    interpret: bool = False,
):
    """uint32[T] -> int8[M, dim] — row-major convenience wrapper.

    Runs the lane-major kernel and transposes; the engine's hot path
    uses embed_shingles_pallas_t + the transposed distance kernel and
    never pays this transpose.
    """
    m = max(0, np.shape(token_hashes)[0] - shingle_cfg.n + 1)
    if m == 0:
        return jnp.zeros((0, shingle_cfg.dim), dtype=jnp.int8)
    out_t = embed_shingles_pallas_t(
        token_hashes, shingle_cfg, mults,
        tile_m=tile_m, interpret=interpret,
    )
    return out_t.T[:m]
