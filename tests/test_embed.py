"""Fused Pallas embedding kernel vs the host oracle (bit-exact)."""

import numpy as np
import pytest

from fandom_search_tpu.config import ShingleConfig
from fandom_search_tpu.data.hashing import derive_sign_mults
from fandom_search_tpu.data.shingler import embed_shingles, embed_shingles_np
from fandom_search_tpu.ops.embed import (
    embed_shingles_pallas,
    embed_shingles_pallas_t,
)

CFG = ShingleConfig()


@pytest.mark.parametrize("t_len", [6, 7, 100, 517, 2048])
def test_pallas_embed_matches_oracle(rng, t_len):
    t = rng.integers(0, 2**32, size=t_len, dtype=np.uint32)
    ref = embed_shingles_np(t, CFG)
    out = np.asarray(embed_shingles_pallas(t, CFG, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_pallas_embed_matches_jnp(rng):
    t = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    mults = derive_sign_mults(CFG.seed, CFG.n, CFG.dim)
    a = np.asarray(embed_shingles(t, CFG, mults=mults))
    b = np.asarray(embed_shingles_pallas(t, CFG, mults=mults, interpret=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("t_len", [6, 100, 2053])
def test_pallas_embed_t_matches_oracle(rng, t_len):
    """Lane-major kernel: e_T[:, :m].T == oracle; padded cols ignored."""
    t = rng.integers(0, 2**32, size=t_len, dtype=np.uint32)
    ref = embed_shingles_np(t, CFG)
    m = ref.shape[0]
    out_t = embed_shingles_pallas_t(t, CFG, interpret=True)
    assert out_t.shape[0] == CFG.dim and out_t.shape[1] % 2048 == 0
    np.testing.assert_array_equal(np.asarray(out_t)[:, :m].T, ref)


def test_pallas_embed_empty():
    t = np.zeros((3,), dtype=np.uint32)  # fewer than n tokens -> 0 shingles
    out = np.asarray(embed_shingles_pallas(t, CFG, interpret=True))
    assert out.shape == (0, CFG.dim)
