"""Interleaved A/B of the u16 stream-compression upload path.

Two engines on the same 10k-works bench world — one with
stream_compress on, one off — run alternately in ONE process, because
the axon tunnel's throughput phases swing >10x and only interleaved
same-process timing separates the code effect from the link phase
(DESIGN.md section 7).

Usage: python scripts/compress_ab.py [n_works] [reps]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fandom_search_tpu.bench import make_e2e_world
from fandom_search_tpu.search.engine import SearchEngine


def main():
    n_works = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    lines, index, works, cfg = make_e2e_world(rng, n_works)
    cfg_on = dataclasses.replace(
        cfg, search=dataclasses.replace(cfg.search, stream_compress=True)
    )
    cfg_off = dataclasses.replace(
        cfg, search=dataclasses.replace(cfg.search, stream_compress=False)
    )
    eng_on = SearchEngine(index, cfg_on, use_pallas=True, interpret=False)
    eng_off = SearchEngine(index, cfg_off, use_pallas=True, interpret=False)
    rows_on, _ = eng_on.search_works(works)   # warm + bootstrap table
    rows_off, _ = eng_off.search_works(works)
    key = lambda rs: sorted(
        (r.work_id, r.fan_token_start, r.fan_token_end, r.line_no)
        for r in rs
    )
    assert key(rows_on) == key(rows_off), "compression changed results!"
    print(f"row parity OK ({len(rows_on)} rows); vocab size "
          f"{eng_on._venc.size}")
    t_on, t_off = [], []
    for i in range(reps):
        for name, eng, acc in (("on ", eng_on, t_on),
                               ("off", eng_off, t_off)):
            t0 = time.perf_counter()
            _, stats = eng.search_works(works)
            dt = time.perf_counter() - t0
            acc.append(dt)
            ex = stats.extra
            print(f"rep {i} {name}: {dt:6.2f}s  "
                  f"batchgen={ex.get('s_batchgen', 0):.2f} "
                  f"pull={ex.get('s_pull', 0):.2f}")
    print(f"median on={np.median(t_on):.2f}s off={np.median(t_off):.2f}s "
          f"ratio={np.median(t_off) / np.median(t_on):.2f}x")


if __name__ == "__main__":
    main()
