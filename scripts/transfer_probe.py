"""Upload-bandwidth vs transfer-size probe for the host->device link.

The fused engine uploads the query stream in ~4 MB per-batch chunks
(batch_queries=2^20 u32 tokens).  If the link's effective bandwidth
rises with transfer size (per-transfer overhead amortization), a
resident-slab upload scheme (one big device_put per N batches, fused
call indexes into the slab) would cut the dominant e2e cost.  This
probe answers that question the only trustworthy way on this tunnel:
interleaved same-process rounds across sizes, scalar-pull sync
(DESIGN.md §7, block_until_ready does not await here).

Usage: python scripts/transfer_probe.py [rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sizes_mb = [1, 4, 16, 64]
    rng = np.random.default_rng(0)
    bufs = {
        mb: rng.integers(0, 2**32, (mb << 20) // 4, dtype=np.uint32)
        for mb in sizes_mb
    }

    @jax.jit
    def touch(x):
        # cheap reduction forcing the device to have the data
        return jnp.sum(x[:: 4096].astype(jnp.uint32))

    # warm: compile per size, one upload each
    for mb, b in bufs.items():
        np.asarray(touch(jnp.asarray(b)))

    res = {mb: [] for mb in sizes_mb}
    for r in range(rounds):
        for mb in sizes_mb:
            b = bufs[mb]
            t0 = time.perf_counter()
            np.asarray(touch(jnp.asarray(b)))
            dt = time.perf_counter() - t0
            res[mb].append(dt)
            print(f"round {r} {mb:3d}MB: {dt*1e3:8.1f} ms "
                  f"({mb/dt:8.1f} MB/s)", flush=True)
    print("--- medians / best ---")
    for mb in sizes_mb:
        med = float(np.median(res[mb]))
        best = min(res[mb])
        print(f"{mb:3d}MB: median {med*1e3:8.1f} ms ({mb/med:8.1f} MB/s)  "
              f"best {best*1e3:8.1f} ms ({mb/best:8.1f} MB/s)")


if __name__ == "__main__":
    main()
