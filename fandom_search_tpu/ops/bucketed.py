"""Bucketed (inverted-index) prefilter — the SUB-LINEAR candidate path.

The linear-scan SimHash prefilter (ops/lsh.py) still touches every
(query, script-shingle) pair; on the MXU that loses to the exact int8
kernel at every moderate index size (ops/lsh.py docstring).  This
module goes sub-linear the way SURVEY.md §8.7 / BASELINE.json:5 demand:
bucket the index, probe a constant number of buckets per query, and
exact-rerank only the gathered survivors — per-query cost O(P * cap)
regardless of script size, vs O(NS) for every scan.

Scheme — triangle-group position-pair buckets with a pigeonhole
guarantee:

  * A shingle is n word hashes (w_0..w_{n-1}).  Positions are split
    into groups of 3 and ONE table is built per within-group pair
    (n=6: groups {0,1,2} and {3,4,5} -> 6 tables), each keyed by the
    EXACT word-hash pair (mixed to a bucket id with fmix32).
  * A candidate avoiding every probed pair can match at most one
    position per group, i.e. at most g = ceil(n/3) positions; so any
    candidate with >= g+1 matching positions (n=6: >= 3 matches)
    shares at least one *intact* pair with the query — DETERMINISTIC
    recall, not the probabilistic recall of classical LSH.  The g+1
    bound is what makes the engine's candidate_threshold (3.5 matching
    words) safe: a 3-exact-match candidate can clear 3.5 on positive
    embedding noise (sd ~ n/sqrt(dim) ~ 0.53), so the >=4 guarantee
    of plain disjoint pairs would lose real candidates; >=3 coverage
    leaves only >= +2.8-sigma-noise 2-match candidates uncovered,
    which the bench's measured thresholded recall accounts for.
    Six pairs is MINIMAL for >=3-coverage on n=6: "every 3-subset of
    positions contains a probed pair" means the complement pair-graph
    is triangle-free, and Turan's bound caps a triangle-free graph on
    6 vertices at 9 of the 15 edges — leaving >= 6 probed.
  * Query: compute the P bucket ids (a few fmix32's on the VPU),
    gather each bucket's entry list (capped at ``cap``), sort + dedup
    the union per row, then exact-rerank the survivors with the int8
    embedding dot (ops/lsh.rerank_exact) so the scores the engine sees
    are IDENTICAL in semantics to the brute-force kernel's.

Failure mode and its accounting: a pathologically common word pair
(a "the cat"-bucket in Zipf text) can overflow ``cap``, losing the
guarantee for candidates whose only intact pair is that bucket.
``build()`` reports the overflow fraction so the caller can see the
exposure; the bench measures thresholded recall on a Zipf corpus too.

Reference parity note: this replaces the reference's BallTree *query*
(SURVEY.md §4.2 HOT LOOP 1) in the large-index regime, the same role
ops/distance_topk.py fills at moderate index sizes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fandom_search_tpu.config import BucketedConfig, ShingleConfig
from fandom_search_tpu.data.hashing import fmix32
from fandom_search_tpu.ops.distance_topk import pad_rows
from fandom_search_tpu.ops.lsh import rerank_exact

_I32_MAX = np.int32(2**31 - 1)


def _derive_salts(seed: int, p: int) -> np.ndarray:
    """One uint32 salt per probe table."""
    return fmix32(
        (np.uint64(seed) + np.arange(1, p + 1, dtype=np.uint64)
         * np.uint64(0x9E3779B9)).astype(np.uint32)
    )


def _pairs_for(n: int, mode: str = "triangles") -> Tuple[Tuple[int, int], ...]:
    """Probe position pairs (see module doc and BucketedConfig.pairs).

    "triangles": within-group pairs for groups of 3 positions —
    guarantees a candidate matching >= ceil(n/3)+1 positions shares an
    intact probed pair (minimal covering for that bound; Turan).  A
    trailing 1-position group degenerates to a (p, p) single-word
    probe.  "all": every C(n,2) pair — guarantees >= 2 matches (every
    2-subset must itself be probed, so no cheaper covering exists).
    """
    if n < 2:
        return ((0, 0),)
    if mode == "all":
        return tuple(
            (i, j) for i in range(n) for j in range(i + 1, n)
        )
    pairs = []
    for g0 in range(0, n, 3):
        grp = list(range(g0, min(g0 + 3, n)))
        if len(grp) == 1:
            pairs.append((grp[0], grp[0]))
        else:
            pairs.extend(
                (grp[i], grp[j])
                for i in range(len(grp))
                for j in range(i + 1, len(grp))
            )
    return tuple(pairs)


def _bucket_ids(w_a, w_b, salt, num_buckets: int):
    """Mix an exact word-hash pair into a bucket id (works in NumPy and
    jnp; inputs uint32)."""
    k = fmix32(fmix32(w_a + salt) ^ w_b)
    return (k & np.uint32(num_buckets - 1)).astype(np.int32)


@dataclass
class BucketedIndex:
    """Device-resident inverted index over the script's shingles."""

    entries: jax.Array      # int32 [P, NS] shingle ids sorted by bucket
    offsets: jax.Array      # int32 [P, B+1] CSR bucket offsets
    num_buckets: int
    salts: Tuple[int, ...]  # one per probe table
    ns_valid: int
    overflow_frac: float    # fraction of entries in buckets larger than cap

    @classmethod
    def build(
        cls,
        shingle_windows: np.ndarray,  # uint32 [NS, n] (ScriptIndex field)
        cfg: BucketedConfig,
        shingle_cfg: ShingleConfig,
    ) -> "BucketedIndex":
        w = np.asarray(shingle_windows, dtype=np.uint32)
        ns, n = w.shape if w.ndim == 2 else (0, shingle_cfg.n)
        pairs = _pairs_for(shingle_cfg.n, cfg.pairs)
        p = len(pairs)
        b = 1024
        while b < cfg.load_factor * max(ns, 1):
            b *= 2
        salts = _derive_salts(cfg.seed, p)
        entries = np.zeros((p, max(ns, 1)), dtype=np.int32)
        offsets = np.zeros((p, b + 1), dtype=np.int64)
        over = 0
        for i, (a, bb) in enumerate(pairs):
            keys = _bucket_ids(w[:, a], w[:, bb], salts[i], b) if ns else (
                np.zeros((0,), np.int32)
            )
            order = np.argsort(keys, kind="stable")  # ties: ascending id
            entries[i, :ns] = order
            counts = np.bincount(keys, minlength=b)
            offsets[i, 1:] = np.cumsum(counts)
            over += int(counts[counts > cfg.cap].sum())
        return cls(
            entries=jnp.asarray(entries),
            offsets=jnp.asarray(offsets.astype(np.int32)),
            num_buckets=b,
            salts=tuple(int(s) for s in salts),
            ns_valid=ns,
            overflow_frac=over / max(1, ns * p),
        )


@functools.partial(
    jax.jit,
    static_argnames=("n", "cap", "num_buckets", "salts", "pairs_mode"),
)
def probe_candidates(
    stream: jax.Array,     # uint32 [T] query token hashes
    entries: jax.Array,    # int32 [P, NS]
    offsets: jax.Array,    # int32 [P, B+1]
    *,
    n: int,
    cap: int,
    num_buckets: int,
    salts: Tuple[int, ...],
    pairs_mode: str = "triangles",
) -> Tuple[jax.Array, jax.Array]:
    """Bucket-probe every query shingle; returns (cand_idx, ok) of shape
    [M, P*cap] with candidates SORTED ascending per row and duplicates
    masked out — ready for rerank_exact (ties then resolve to the
    lowest script index, the exact kernel's rule)."""
    t = stream.shape[0]
    m = max(0, t - n + 1)
    pairs = _pairs_for(n, pairs_mode)
    cands = []
    oks = []
    iota = jnp.arange(cap, dtype=jnp.int32)[None, :]
    for i, (a, b) in enumerate(pairs):
        w_a = jax.lax.dynamic_slice_in_dim(stream, a, m)
        w_b = jax.lax.dynamic_slice_in_dim(stream, b, m)
        bk = _bucket_ids(w_a, w_b, jnp.uint32(salts[i]), num_buckets)
        start = offsets[i, bk]                       # [M]
        ln = jnp.minimum(offsets[i, bk + 1] - start, cap)
        pos = start[:, None] + iota                  # [M, cap]
        idx = entries[i, jnp.clip(pos, 0, entries.shape[1] - 1)]
        cands.append(idx)
        oks.append(iota < ln[:, None])
    cand = jnp.concatenate(cands, axis=1)            # [M, P*cap]
    ok = jnp.concatenate(oks, axis=1)
    # sort per row (invalid to the end), mask duplicate neighbors
    s = jnp.where(ok, cand, _I32_MAX)
    s = jax.lax.sort(s, dimension=1)
    ok = s < _I32_MAX
    dup = jnp.concatenate(
        [jnp.zeros((s.shape[0], 1), bool), s[:, 1:] == s[:, :-1]], axis=1
    )
    return jnp.where(ok, s, 0), jnp.logical_and(ok, jnp.logical_not(dup))


def bucketed_topk(
    q_emb: jax.Array,          # int8 [M, D] query embeddings
    stream: jax.Array,         # uint32 [T] query token hashes
    bidx: BucketedIndex,
    s_emb_padded: jax.Array,   # int8 [NS_pad, D]
    k: int,
    dim: int,
    cfg: BucketedConfig,
    shingle_cfg: ShingleConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Sub-linear top-k: bucket probe -> exact int8 rerank.

    Scores are dot/dim — identical semantics to topk_dot_pallas — for
    the candidates found in buckets; rows whose true top-k lie outside
    every probed bucket return lower-scored (or padding) entries, which
    is exactly the thresholded-recall contract documented above.
    """
    m = q_emb.shape[0]
    cand, ok = probe_candidates(
        stream, bidx.entries, bidx.offsets,
        n=shingle_cfg.n, cap=cfg.cap, num_buckets=bidx.num_buckets,
        salts=bidx.salts, pairs_mode=cfg.pairs,
    )
    qp, _ = pad_rows(q_emb, 256)
    pad = qp.shape[0] - m
    if pad:
        cand = jnp.pad(cand, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, ((0, pad), (0, 0)))
    vals, idx = rerank_exact(qp, s_emb_padded, cand, ok, k, dim)
    return vals[:m], idx[:m]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "cap", "num_buckets", "salts", "k", "dim", "threshold",
        "max_out", "pairs_mode",
    ),
)
def bucketed_candidates_flat(
    stream: jax.Array,        # uint32 [T] query token hashes
    q_emb: jax.Array,         # int8 [M_pad, D] (M_pad >= M rows used)
    entries: jax.Array,
    offsets: jax.Array,
    s_emb_padded: jax.Array,  # int8 [NS_pad, D]
    *,
    n: int,
    cap: int,
    num_buckets: int,
    salts: Tuple[int, ...],
    k: int,
    dim: int,
    threshold: float,
    max_out: int,
    pairs_mode: str = "triangles",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sub-linear candidate generation emitting engine-ready triples.

    The [M, P*cap] probe table is ~97% padding on a healthy load
    factor (~1.5 true candidates per query), and gathering embeddings
    for padded slots dominated the first bucketed implementation's
    wall-clock (scripts/bucketed_probe.py round-1: 668 ms vs the
    exact kernel's 460 at NS=2^20).  This path flat-compacts the TRUE
    (query, shingle) pairs first (nonzero_compact — cumsum + scatter),
    gathers and dot-scores only those, applies the threshold, ranks
    per query with a 3-key sort + segment-rank cummax (exact top-k,
    lowest-index ties — the exact kernel's rule), and compacts to the
    engine's (qpos, sidx, score, count) contract.  Per-query cost is
    O(bucket load), independent of script size.

    Budget/retry: the flat pair budget is shape-derived —
    pow2(2*M + 8*max_out), where M*P/load_factor is the expected noise
    pair count (P/load = 1.5 pairs/query at defaults, so 2*M has ~33%
    slack) and the max_out term covers quote-dense corpora growing
    with the engine's sticky budget.  Every flat array (compaction,
    gathers, the ranking sort) is sized by this budget, so right-
    sizing it IS the performance fix: a 16*max_out budget measured
    543 -> 184 ms at M=2^17 against a 2^20-shingle index purely from
    gathering padding (scripts/bucketed_probe.py).  Overflowing either
    budget surfaces in the returned count (> max_out), which makes the
    engine's pow2 retry (search/engine.py) grow both together —
    nothing is silently dropped.
    """
    from fandom_search_tpu.search.engine import nonzero_compact

    m_queries = max(1, stream.shape[0] - n + 1)
    p = len(_pairs_for(n, pairs_mode))
    slack = max(2, -(-p // 3))  # ~2x expected noise pairs (P/load)
    pair_budget = 1024
    while pair_budget < slack * m_queries + 8 * max_out:
        pair_budget *= 2
    cand, ok = probe_candidates(
        stream, entries, offsets,
        n=n, cap=cap, num_buckets=num_buckets, salts=salts,
        pairs_mode=pairs_mode,
    )
    m, width = cand.shape
    flat_ok = ok.ravel()
    pair_count = jnp.sum(flat_ok.astype(jnp.int32))
    pos = nonzero_compact(flat_ok, pair_budget)      # [E], -1 padded
    safe = jnp.maximum(pos, 0)
    valid = pos >= 0
    row = (safe // width).astype(jnp.int32)
    sid = cand.ravel()[safe]

    qe = jnp.take(q_emb, jnp.minimum(row, q_emb.shape[0] - 1), axis=0)
    se = jnp.take(s_emb_padded, sid, axis=0)
    score = jnp.einsum(
        "ed,ed->e",
        qe.astype(jnp.bfloat16),
        se.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) / dim
    keep = jnp.logical_and(valid, score >= threshold)

    # exact per-query top-k among kept pairs: sort by (row asc,
    # score desc, sid asc) then rank within the row segment
    big = jnp.int32(1 << 30)
    score_i = jnp.where(keep, jnp.round(score * dim).astype(jnp.int32), 0)
    key_row = jnp.where(keep, row, big)
    key_neg = -score_i
    row_s, _, sid_s, score_s = jax.lax.sort(
        (key_row, key_neg, sid, score), num_keys=3, is_stable=True
    )
    e = row_s.shape[0]
    iota = jnp.arange(e, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), row_s[1:] != row_s[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(first, iota, 0))
    rank = iota - seg_start
    topk_keep = jnp.logical_and(row_s < big, rank < k)
    final_count = jnp.sum(topk_keep.astype(jnp.int32))

    out_pos = nonzero_compact(topk_keep, max_out)
    out_safe = jnp.maximum(out_pos, 0)
    out_valid = out_pos >= 0
    qpos = jnp.where(out_valid, row_s[out_safe], -1)
    sidx = jnp.where(out_valid, sid_s[out_safe], 0)
    sc = score_s[out_safe]
    count = jnp.maximum(
        final_count,
        jnp.where(
            pair_count > pair_budget,
            jnp.int32(max_out) + pair_count - pair_budget,
            0,
        ),
    )
    return qpos, sidx, sc, count


def attach_bucketed_prefilter(
    engine, cfg: BucketedConfig, bidx: BucketedIndex | None = None
) -> None:
    """Swap a SearchEngine's candidate stage for the bucketed pipeline
    (mirrors ops/lsh.attach_lsh_prefilter)."""
    from fandom_search_tpu.data.shingler import embed_shingles

    p_width = len(_pairs_for(engine.cfg.shingle.n, cfg.pairs)) * cfg.cap
    if engine.cfg.search.k > p_width:
        raise ValueError(
            f"k ({engine.cfg.search.k}) cannot exceed the bucketed probe "
            f"width (P*cap = {p_width})"
        )
    if bidx is None:
        bidx = BucketedIndex.build(
            engine.index.shingle_windows, cfg, engine.cfg.shingle
        )
    elif bidx.ns_valid != engine.index.num_shingles:
        raise ValueError(
            f"bucketed index covers {bidx.ns_valid} shingles; engine "
            f"index has {engine.index.num_shingles} — rebuild it"
        )
    else:  # persisted tables arrive as host arrays
        bidx = BucketedIndex(
            entries=jax.device_put(jnp.asarray(bidx.entries)),
            offsets=jax.device_put(jnp.asarray(bidx.offsets)),
            num_buckets=bidx.num_buckets,
            salts=tuple(bidx.salts),
            ns_valid=bidx.ns_valid,
            overflow_frac=bidx.overflow_frac,
        )
    if bidx.overflow_frac > 0.05:
        # A skewed (Zipf stopword-heavy) vocabulary overflows hot
        # pair-buckets and silently loses the recall guarantee
        # (measured: 70% overflow -> thresholded recall 0.06 on a
        # Zipf-1.3 corpus, scripts/bucketed_probe.py).  Refuse rather
        # than degrade; the exact kernel covers that regime at full
        # recall (~630 G pairs/s at a 2^20-shingle index).
        raise ValueError(
            f"bucketed index has {bidx.overflow_frac:.0%} of entries in "
            f"over-cap buckets (cap={cfg.cap}); this corpus's word-pair "
            f"distribution is too skewed for the bucketed prefilter — "
            f"use the exact kernel (drop --bucketed) or raise cap/"
            f"load_factor"
        )
    engine.bucketed = bidx
    scfg = engine.cfg.shingle
    xcfg = engine.cfg.search
    s_emb_padded = engine._s_emb_padded
    ns_true = engine.index.num_shingles

    @functools.partial(jax.jit, static_argnames=("max_out",))
    def candidates(stream, s_emb, ns_valid, mults, *, max_out):
        q_emb = embed_shingles(stream, scfg, mults=mults)
        return bucketed_candidates_flat(
            stream, q_emb, bidx.entries, bidx.offsets, s_emb,
            n=scfg.n, cap=cfg.cap, num_buckets=bidx.num_buckets,
            salts=bidx.salts, k=xcfg.k, dim=scfg.dim,
            threshold=xcfg.candidate_threshold, max_out=max_out,
            pairs_mode=cfg.pairs,
        )

    engine._use_fused = False
    engine._candidates_fn = (
        lambda stream, _s, _n, mults, max_out: candidates(
            stream, s_emb_padded, _n, mults, max_out=max_out
        )
    )
