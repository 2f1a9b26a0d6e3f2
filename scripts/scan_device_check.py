"""On-device parity attest for the Pallas 1-D prefix scan (ops/scan.py)
— advisor r3 low #2.

The scan backs nonzero_compact in the engine's hot path for
n >= 2^20 on TPU, but the suite's parity tests run interpret/CPU only;
the sublane shift-scan over a [TR, 1] ref is exactly the kind of
Mosaic lowering that can diverge from interpret semantics.  This probe
asserts Pallas == jnp.cumsum/cummax ON THE DEVICE at several sizes at
and above the self-gate, including non-pow2 and adversarial values
(negatives, INT32-range extremes for cummax).

Run on a TPU box: python scripts/scan_device_check.py
Exit 0 = attested; any mismatch raises.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from fandom_search_tpu.ops.scan import _MIN_PALLAS_N, scan1d_i32

    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: CPU backend — this attests interpret mode only")

    rng = np.random.default_rng(3)
    sizes = [
        _MIN_PALLAS_N,              # the self-gate boundary
        _MIN_PALLAS_N + 12345,      # non-pow2 (padding path)
        1 << 21,
        (1 << 22) + 7,              # the bucketed_huge regime
    ]
    for n in sizes:
        x = rng.integers(-1000, 1000, size=n, dtype=np.int32)
        x[:: max(1, n // 97)] = np.int32(2**31 - 1000)  # cummax extremes
        xd = jnp.asarray(x)
        got_add = np.asarray(scan1d_i32(xd, "add"))
        want_add = np.cumsum(x, dtype=np.int32)  # same int32 wraparound
        np.testing.assert_array_equal(got_add, want_add)
        got_max = np.asarray(scan1d_i32(xd, "max"))
        want_max = np.maximum.accumulate(x)
        np.testing.assert_array_equal(got_max, want_max)
        print(f"n={n}: add OK, max OK", flush=True)
    print("scan device parity ATTESTED", flush=True)


if __name__ == "__main__":
    main()
