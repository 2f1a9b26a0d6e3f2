"""Shingle construction and signed-random-feature embedding.

Reference behavior (SURVEY.md section 3, "Shingler + hash vectorizer";
BASELINE.json:5): slide a 6-word window, map each word to a numeric hash,
treat the shingle as a point in metric space, and find near neighbors.

TPU-native redesign: the 6 small coordinates become one dense vector
built from pseudo-random signs, so similarity is a *dot product* and
candidate generation is a matmul on the MXU:

    v(p, w) in {-1, +1}^dim   derived from fmix32(hash(w) ^ salt[p, r])
    e(shingle) = sum_p v(p, w_p)                 (entries in [-n, n])
    dot(e_q, e_s) = dim * (#positions matching) + noise(sd ~ n*sqrt(dim))

so score = dot / dim estimates "matching words out of n" with sd ~
n/sqrt(dim) (~0.5 for n=6, dim=128) — a razor-thin candidate threshold.
Host (NumPy) and device (jnp) paths are bit-identical; the Pallas
embedding kernel in ops/ is a fused variant of the jnp path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from fandom_search_tpu.config import ShingleConfig
from fandom_search_tpu.data.hashing import derive_salts, fmix32


def num_shingles(num_tokens: int, cfg: ShingleConfig) -> int:
    return max(0, num_tokens - cfg.n + 1)


def shingle_hashes(token_hashes: np.ndarray, cfg: ShingleConfig) -> np.ndarray:
    """[T] uint32 token hashes -> [T-n+1, n] uint32 shingle windows (host)."""
    t = np.asarray(token_hashes, dtype=np.uint32)
    m = num_shingles(t.shape[0], cfg)
    if m == 0:
        return np.zeros((0, cfg.n), dtype=np.uint32)
    return np.lib.stride_tricks.sliding_window_view(t, cfg.n).copy()


def _signs_from_bits(bits, xp):
    """uint32[..., rounds] -> int8[..., rounds*32] in {-1, +1}.

    Bit j of each uint32 becomes sign 2*bit-1; lane order is
    (round-major, bit-minor) on both backends.
    """
    shifts = xp.arange(32, dtype=xp.uint32)
    expanded = (bits[..., :, None] >> shifts) & xp.uint32(1)
    signs = (expanded.astype(xp.int8) << 1) - xp.int8(1)
    return signs.reshape(*bits.shape[:-1], bits.shape[-1] * 32)


def embed_shingles_np(token_hashes: np.ndarray, cfg: ShingleConfig) -> np.ndarray:
    """Host-side oracle embedding: uint32[T] -> int8[T-n+1, dim].

    Entries are in [-n, n]; int8 is exact and matmul-friendly.
    """
    salts = derive_salts(cfg.seed, cfg.n, cfg.sign_rounds)  # [n, R]
    t = np.asarray(token_hashes, dtype=np.uint32)
    m = num_shingles(t.shape[0], cfg)
    if m == 0:
        return np.zeros((0, cfg.dim), dtype=np.int8)
    acc = np.zeros((m, cfg.dim), dtype=np.int16)
    for p in range(cfg.n):
        h = t[p : p + m]  # [m]
        bits = fmix32(h[:, None] ^ salts[p][None, :])  # [m, R]
        acc += _signs_from_bits(bits, np)
    return acc.astype(np.int8)


def embed_shingles(token_hashes, cfg: ShingleConfig, salts=None):
    """Device-side embedding: uint32[T] -> int8[T-n+1, dim] (jit-safe).

    ``token_hashes`` length must be static under jit (pad on host).  The
    whole thing is elementwise + a final sum, so XLA fuses it into a few
    VPU loops; see ops/embed.py for the Pallas single-pass variant.
    """
    if salts is None:
        salts = jnp.asarray(derive_salts(cfg.seed, cfg.n, cfg.sign_rounds))
    t = jnp.asarray(token_hashes, dtype=jnp.uint32)
    m = num_shingles(t.shape[0], cfg)
    if m == 0:
        return jnp.zeros((0, cfg.dim), dtype=jnp.int8)
    acc = jnp.zeros((m, cfg.dim), dtype=jnp.int16)
    for p in range(cfg.n):
        h = jax_fmix32(t[p : p + m][:, None] ^ salts[p][None, :])
        acc = acc + _signs_from_bits(h, jnp).astype(jnp.int16)
    return acc.astype(jnp.int8)


def jax_fmix32(h):
    """fmix32 on jnp uint32 arrays (wrapping multiply is native)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h
