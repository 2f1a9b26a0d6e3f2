"""Pallas 1-D prefix scan (ops/scan.py): parity vs numpy in interpret
mode, both ops, ragged sizes incl. multi-tile and non-block tails.

No reference analogue (SURVEY.md section 3 — infrastructure for the
sub-linear candidate path); the contract is exact integer equality
with the jnp scan it replaces inside bucketed.py / nonzero_compact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fandom_search_tpu.ops.scan import _TR, _LANES, scan1d_i32


SIZES = [1, 7, 128, 129, _TR * _LANES, _TR * _LANES + 1,
         2 * _TR * _LANES + 12345]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("op", ["add", "max"])
def test_scan_parity_interpret(rng, n, op):
    x = rng.integers(-1000, 1000, size=n).astype(np.int32)
    got = np.asarray(scan1d_i32(jnp.asarray(x), op, interpret=True))
    want = np.cumsum(x) if op == "add" else np.maximum.accumulate(x)
    np.testing.assert_array_equal(got, want)


def test_scan_cpu_fallback_matches(rng):
    # on the CPU backend (this suite) the un-interpreted call takes the
    # jnp fallback; it must agree with the Pallas path bit-for-bit
    x = rng.integers(-5, 5, size=100_000).astype(np.int32)
    for op in ("add", "max"):
        a = np.asarray(scan1d_i32(jnp.asarray(x), op))
        b = np.asarray(scan1d_i32(jnp.asarray(x), op, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_scan_rejects_bad_op():
    with pytest.raises(ValueError):
        scan1d_i32(jnp.zeros((4,), jnp.int32), "mul")


def test_scan_empty():
    for op in ("add", "max"):
        out = scan1d_i32(jnp.zeros((0,), jnp.int32), op)
        assert out.shape == (0,)


def test_scan_negative_values_max(rng):
    # cummax must start from the op identity, not 0: an all-negative
    # stream keeps its own running max
    x = -rng.integers(1, 1000, size=4096).astype(np.int32)
    got = np.asarray(scan1d_i32(jnp.asarray(x), "max", interpret=True))
    np.testing.assert_array_equal(got, np.maximum.accumulate(x))
