"""Probe end-to-end wall-clock variance at the 10k-works bench config.

Runs the same search N times in one process to separate code regressions
from the axon tunnel's throughput phases (DESIGN.md section 3).
"""

import sys
import time

import numpy as np

from fandom_search_tpu.config import PipelineConfig
from fandom_search_tpu.data.script_parser import parse_script
from fandom_search_tpu.search.engine import SearchEngine
from fandom_search_tpu.search.index import build_script_index
from fandom_search_tpu.utils.synthetic import (
    make_corpus_with_quotes, make_script, make_vocab,
)


def main():
    n_works = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rng = np.random.default_rng(0)
    cfg = PipelineConfig()
    vocab = make_vocab(rng, 5000)
    lines = parse_script(make_script(rng, vocab, num_lines=200,
                                     words_per_line=(6, 14)))
    index = build_script_index(lines, cfg.shingle, cfg.search)
    works, _ = make_corpus_with_quotes(
        rng, [ln.text for ln in lines], num_works=n_works,
        words_per_work=2000, quotes_per_work=3, vocab=vocab,
    )
    eng = SearchEngine(index, cfg, use_pallas=True, interpret=False)
    eng.search_works(dict(list(works.items())[:200]))  # warm
    for i in range(reps):
        t0 = time.perf_counter()
        rows, stats = eng.search_works(works)
        dt = time.perf_counter() - t0
        print(
            f"run {i}: {dt:.2f}s  submit={stats.seconds_device_topk:.2f} "
            f"process={stats.seconds_host:.2f} rows={len(rows)} "
            f"shingles={stats.num_query_shingles}"
        )


if __name__ == "__main__":
    main()
