import numpy as np
import pytest

from fandom_search_tpu.config import SearchConfig
from fandom_search_tpu.ops.smith_waterman import (
    sw_normalized_jnp,
    sw_normalized_pallas,
)
from fandom_search_tpu.search.verify_np import sw_normalized_np

CFG = SearchConfig()
LA, LB = 32, 24


def _make_batch(rng, bsz, vocab=50):
    a = rng.integers(1, vocab, size=(bsz, LA)).astype(np.uint32)
    b = rng.integers(1, vocab, size=(bsz, LB)).astype(np.uint32)
    len_a = rng.integers(1, LA + 1, size=bsz).astype(np.int32)
    len_b = rng.integers(1, LB + 1, size=bsz).astype(np.int32)
    # plant exact containment in some rows
    for i in range(0, bsz, 4):
        lb = int(len_b[i])
        if int(len_a[i]) >= lb:
            a[i, : lb] = b[i, :lb]
    return a, b, len_a, len_b


def _np_scores(a, b, len_a, len_b):
    return np.array(
        [
            sw_normalized_np(a[i, : len_a[i]], b[i, : len_b[i]], CFG)
            for i in range(a.shape[0])
        ],
        dtype=np.float32,
    )


def test_jnp_matches_numpy(rng):
    a, b, len_a, len_b = _make_batch(rng, 16)
    got = np.asarray(sw_normalized_jnp(a, b, len_a, len_b, CFG))
    want = _np_scores(a, b, len_a, len_b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_matches_numpy(rng):
    a, b, len_a, len_b = _make_batch(rng, 64)
    got = np.asarray(
        sw_normalized_pallas(a, b, len_a, len_b, CFG, tile_b=32, interpret=True)
    )
    want = _np_scores(a, b, len_a, len_b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_exact_containment_scores_one(rng):
    a = rng.integers(1, 1000, size=(8, LA)).astype(np.uint32)
    b = np.zeros((8, LB), dtype=np.uint32)
    len_a = np.full(8, LA, dtype=np.int32)
    len_b = np.full(8, 10, dtype=np.int32)
    for i in range(8):
        b[i, :10] = a[i, 5:15]
    got = np.asarray(
        sw_normalized_pallas(a, b, len_a, len_b, CFG, tile_b=8, interpret=True)
    )
    np.testing.assert_allclose(got, np.ones(8), atol=1e-6)


def test_disjoint_scores_zero(rng):
    a = np.arange(1, 1 + 8 * LA, dtype=np.uint32).reshape(8, LA)
    b = np.arange(10_000, 10_000 + 8 * LB, dtype=np.uint32).reshape(8, LB)
    len_a = np.full(8, LA, dtype=np.int32)
    len_b = np.full(8, LB, dtype=np.int32)
    got = np.asarray(
        sw_normalized_pallas(a, b, len_a, len_b, CFG, tile_b=8, interpret=True)
    )
    np.testing.assert_allclose(got, np.zeros(8), atol=1e-6)


def test_ragged_batch_padding(rng):
    # batch size not a multiple of tile_b
    a, b, len_a, len_b = _make_batch(rng, 37)
    got = np.asarray(
        sw_normalized_pallas(a, b, len_a, len_b, CFG, tile_b=16, interpret=True)
    )
    assert got.shape == (37,)
    want = _np_scores(a, b, len_a, len_b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_empty_batch():
    out = sw_normalized_pallas(
        np.zeros((0, LA), np.uint32),
        np.zeros((0, LB), np.uint32),
        np.zeros((0,), np.int32),
        np.zeros((0,), np.int32),
        CFG,
        interpret=True,
    )
    assert out.shape == (0,)


def test_i16_state_matches_f32(rng):
    """The int16-state kernel (concat-shift; 2 values per VPU lane)
    must reproduce the f32 wavefront exactly for integral scoring."""
    from fandom_search_tpu.config import SearchConfig
    from fandom_search_tpu.ops.smith_waterman import sw_normalized_pallas

    cfg = SearchConfig()
    B, w, mlt = 256, 64, 64
    a = rng.integers(1, 40, size=(B, w)).astype(np.uint32)
    b = rng.integers(1, 40, size=(B, mlt)).astype(np.uint32)
    la = rng.integers(0, w + 1, size=B).astype(np.int32)
    lb = rng.integers(1, mlt + 1, size=B).astype(np.int32)
    # i16 is a lane-major-kernel path; variant="wide" rejects it
    f = np.asarray(
        sw_normalized_pallas(a, b, la, lb, cfg, interpret=True,
                             state="f32", variant="fast")
    )
    i = np.asarray(
        sw_normalized_pallas(a, b, la, lb, cfg, interpret=True,
                             state="i16", variant="fast")
    )
    np.testing.assert_array_equal(f, i)


def test_fast_variant_matches_r2_and_numpy(rng):
    """Round-3 kernel (double-buffered DP state + dynamic trip count)
    must be bit-equal to the round-2 control variant and the NumPy
    oracle on ragged batches — including tiles whose max length is far
    below the static bound (the dynamic-trips win case) and tiles with
    one long pair (the dynamic-trips worst case)."""
    a, b, len_a, len_b = _make_batch(rng, 64)
    # one tile of short pairs, one tile with a single long pair
    len_b[:32] = rng.integers(3, 9, size=32)
    len_a[:32] = rng.integers(5, 15, size=32)
    len_b[32:] = rng.integers(3, 9, size=32)
    len_a[32:] = rng.integers(5, 15, size=32)
    len_a[40], len_b[40] = a.shape[1], b.shape[1]
    want = _np_scores(a, b, len_a, len_b)
    for variant in ("fast", "r2", "dyn"):
        got = np.asarray(
            sw_normalized_pallas(
                a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
                variant=variant,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
    # odd unroll is incompatible with the fast variant's role-swapped
    # buffers (the r2 default has no such constraint)
    with pytest.raises(ValueError, match="unroll"):
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True, unroll=3,
            variant="fast",
        )


def test_wide_variant_matches_fast_and_numpy(rng):
    """Round-5 kernel (variant="wide": batch along lanes, j along
    sublanes — full vreg utilization at the engine's lb=64) must be
    bit-equal to variant="fast" and the NumPy oracle on the same
    ragged batches, including all-padding tiles (the pl.when skip)."""
    a, b, len_a, len_b = _make_batch(rng, 96)
    len_b[:32] = rng.integers(3, 9, size=32)
    len_a[:32] = rng.integers(5, 15, size=32)
    len_a[40], len_b[40] = a.shape[1], b.shape[1]
    len_a[64:] = 0  # an all-padding tile at tile_b=32
    len_b[64:] = 0
    want = _np_scores(a, b, len_a, len_b)
    got_fast = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="fast",
        )
    )
    got_wide = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="wide",
        )
    )
    np.testing.assert_allclose(got_wide, want, atol=1e-5)
    np.testing.assert_array_equal(got_wide, got_fast)
    with pytest.raises(ValueError, match="state"):
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="wide", state="i16",
        )


def test_exitw_thresholded_semantics(rng):
    """variant="exitw" (round-5 measured companion to the analytical
    negative (g)): the early exit may only discard sub-threshold
    residue.  Contract: the kept SET (score >= verify_threshold) and
    the kept rows' SCORES are bit-equal to the exact wide kernel;
    dropped rows must still report scores strictly below threshold."""
    a, b, len_a, len_b = _make_batch(rng, 96)
    len_b[:32] = rng.integers(3, 9, size=32)
    len_a[:32] = rng.integers(5, 15, size=32)
    len_a[64:] = 0
    len_b[64:] = 0
    exact = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="wide",
        )
    )
    got = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="exitw",
        )
    )
    thr = CFG.verify_threshold
    keep_exact = exact >= thr
    keep_got = got >= thr
    np.testing.assert_array_equal(keep_got, keep_exact)
    np.testing.assert_array_equal(got[keep_got], exact[keep_exact])
    assert np.all(got[~keep_got] < thr)


def test_exitw_zero_signal_exits_exact(rng):
    """A zero-signal batch (disjoint vocabularies, full windows) is the
    regime where the exit actually fires — every row's future bound
    falls below thr*denom in the tail.  All scores must stay below
    threshold and the kept set must stay empty."""
    bsz = 32
    a = rng.integers(1, 500, size=(bsz, LA)).astype(np.uint32)
    b = rng.integers(1000, 2000, size=(bsz, LB)).astype(np.uint32)
    len_a = np.full(bsz, LA, np.int32)
    len_b = np.full(bsz, LB, np.int32)
    got = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="exitw",
        )
    )
    assert got.shape == (bsz,)
    assert np.all(got < CFG.verify_threshold)


def test_slide_variant_matches_wide(rng):
    """variant="slide" (round-5: dynamic sublane-offset a-diagonal read
    instead of the rolling state buffer) must be bit-equal to "wide"
    on ragged batches including all-padding tiles."""
    a, b, len_a, len_b = _make_batch(rng, 96)
    len_b[:32] = rng.integers(3, 9, size=32)
    len_a[:32] = rng.integers(5, 15, size=32)
    len_a[40], len_b[40] = a.shape[1], b.shape[1]
    len_a[64:] = 0
    len_b[64:] = 0
    want = _np_scores(a, b, len_a, len_b)
    got_wide = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="wide",
        )
    )
    got_slide = np.asarray(
        sw_normalized_pallas(
            a, b, len_a, len_b, CFG, tile_b=32, interpret=True,
            variant="slide",
        )
    )
    np.testing.assert_allclose(got_slide, want, atol=1e-5)
    np.testing.assert_array_equal(got_slide, got_wide)


def test_exitw_contract_fuzz_across_thresholds(rng):
    """The exitw thresholded-semantics contract must hold for ANY
    threshold (the bar sharpens or loosens the exit window): fuzz
    verify_threshold and batch content; kept set + kept scores always
    bit-equal to the exact wide kernel."""
    import dataclasses

    for thr in (0.15, 0.35, 0.6, 0.9):
        cfg = dataclasses.replace(CFG, verify_threshold=thr)
        a, b, len_a, len_b = _make_batch(rng, 64)
        exact = np.asarray(
            sw_normalized_pallas(
                a, b, len_a, len_b, cfg, tile_b=32, interpret=True,
                variant="wide",
            )
        )
        got = np.asarray(
            sw_normalized_pallas(
                a, b, len_a, len_b, cfg, tile_b=32, interpret=True,
                variant="exitw",
            )
        )
        keep_e, keep_g = exact >= thr, got >= thr
        assert np.array_equal(keep_g, keep_e), f"kept-set @thr={thr}"
        assert np.array_equal(got[keep_g], exact[keep_e]), (
            f"kept-score @thr={thr}"
        )
        assert np.all(got[~keep_g] < thr), f"residue @thr={thr}"
