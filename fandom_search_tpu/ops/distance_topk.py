"""Fused distance-matrix + top-k — the BallTree replacement.

The reference's candidate generation is a BallTree query per fanwork
shingle (SURVEY.md section 4.2 HOT LOOP 1).  On TPU the whole candidate
stage is one kernel (BASELINE.json:8): tile the [NQ, NS] score matrix,
compute each [TQ, TS] tile as an MXU matmul of int8 shingle embeddings,
and fold it immediately into a per-row running top-k held in VMEM — the
full distance matrix never exists in HBM.

Scores are ``dot(e_q, e_s) / dim`` ~= number of matching shingle
positions (see data/shingler.py).  Two implementations with identical
semantics (including lowest-index tie-breaking):

  * ``topk_dot_jnp``    — lax.top_k over score chunks; runs anywhere,
                          used as the in-repo oracle for the kernel.
  * ``topk_dot_pallas`` — the fused Pallas kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# jnp reference path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "dim"))
def topk_dot_jnp(
    q_emb: jax.Array,  # int8 [NQ, D]
    s_emb: jax.Array,  # int8 [NS, D]
    k: int,
    dim: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of dot/dim via one big matmul + lax.top_k.

    lax.top_k is stable (lowest index wins ties), matching both the
    NumPy oracle and the Pallas kernel.
    """
    scores = jax.lax.dot_general(
        q_emb.astype(jnp.bfloat16),
        s_emb.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vals, idx = jax.lax.top_k(scores, k)
    return vals / dim, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


# Packed-selection constants: a candidate is one int32
#   packed = score * 2^col_bits + (2^col_bits - 1 - global_col)
# monotone in (score asc, col desc), so a single max() implements
# "highest score, lowest column wins ties" and every (score, col) is
# unique — each selection pass is max / compare-equal / select with no
# concatenations.  global_col < 2^col_bits is enforced by column
# chunking; the score budget is |score| <= 2^(30-col_bits) - 1: above
# that the positive side overflows int32 and the negative side
# collides with the sentinel (-2^(30-col_bits) * 2^col_bits ==
# _PACK_SENTINEL exactly).  col_bits ADAPTS to the caller's
# max_abs_score (round-4, VERDICT r3 #6): the default 17 bits covers
# the n=6/dim=128 spec (|score| <= n^2*dim = 4608 <= 8191); wider
# embeddings trade column bits for score bits (dim=256 -> 16 bits,
# dim=512 -> 15, dim=1024 -> 14 — column chunking transparently
# covers the narrower column field).  Beyond 14 bits' budget (65535)
# the wrapper falls back to an exact unpacked path.
_COL_BITS = 17
_MIN_COL_BITS = 14
_PACK_SENTINEL = -(1 << 30)  # below any real packed value
_PACK_MAX_SCORE = (1 << (30 - _MIN_COL_BITS)) - 1


def _col_bits_for(max_abs_score: int) -> int:
    """Narrowest-score column field fitting the caller's score bound
    (prefer MORE column bits: fewer chunks at huge NS)."""
    cb = _COL_BITS
    while cb > _MIN_COL_BITS and max_abs_score > (1 << (30 - cb)) - 1:
        cb -= 1
    return cb


def _topk_kernel(
    ns_valid_ref,  # SMEM (1,) int32 — true NS before padding
    q_ref,         # VMEM [TQ, D] int8 (or [D, TQ] when q_transposed)
    s_ref,         # VMEM [TS, D] int8
    vals_ref,      # VMEM [TQ, K] f32 out
    idx_ref,       # VMEM [TQ, K] i32 out
    run_ref,       # VMEM scratch [TQ, K] int32 — packed (score, col)
    p_ref,         # VMEM scratch [TQ, TS] int32 — masked packed tile
    flag_ref,      # SMEM scratch (1,) int32 — insert-loop continue flag
    *,
    k: int,
    tile_s: int,
    inv_dim: float,
    compute: str,
    min_keep: float,
    q_transposed: bool,
    merge: str,
    gate_cols: int,
    col_bits: int = _COL_BITS,
):
    cmask = (1 << col_bits) - 1
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        run_ref[:] = jnp.full_like(run_ref[:], _PACK_SENTINEL)

    # [TQ, TS] tile of the score matrix on the MXU.  Entries are in
    # [-n, n] so bf16 inputs are exact; the int8 path feeds the MXU's
    # native int8 mode (2x bf16 rate on v5e).  The transposed-q layout
    # contracts q's sublane axis — the MXU handles it natively, and it
    # is what the lane-major embed kernel (ops/embed.py) emits, so the
    # engine path never transposes anything (measured faster than the
    # row-major contraction as well).
    q_dims = ((0,), (1,)) if q_transposed else ((1,), (1,))
    if compute == "int8":
        scores_i = jax.lax.dot_general(
            q_ref[:],
            s_ref[:],
            dimension_numbers=(q_dims, ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        scores_i = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16),
            s_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(q_dims, ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    tq = scores_i.shape[0]
    tile_base = j * tile_s

    # Merge gate — the k-pass merge costs ~an order of magnitude more
    # VPU work than the tile's MXU MACs, so skipping it is what sets
    # the kernel's speed.  A tile may skip when no row can change the
    # answer the caller consumes:
    #   * row_max <= current k-th best (buffer sorted desc; strict >
    #     keeps lowest-index tie-breaks exact because a later tile's
    #     equal score has a higher column), or
    #   * row_max < min_keep: the caller declared it discards scores
    #     below min_keep, so sub-threshold rows need no exact top-k.
    # With min_keep = the engine's candidate threshold, noise tiles
    # (almost all of a real corpus) skip and the MXU matmul dominates.
    # Exactness: an entry that is >= min_keep AND in its row's true
    # top-k always merges — its row fires the gate unless the buffer
    # already holds k better entries.
    #
    # The padded-column mask lives INSIDE the gated branch: padded
    # script rows are zero, so their dot of 0 can fire the gate
    # spuriously but is masked before it could ever be merged.
    row_max = jnp.max(scores_i, axis=1, keepdims=True)

    def _kth_score():
        return jax.lax.shift_right_arithmetic(
            run_ref[:, k - 1 : k], col_bits
        )

    kth_score = _kth_score()
    can_improve = jnp.any(
        jnp.logical_and(row_max > kth_score, row_max >= jnp.int32(min_keep))
    )

    if merge == "rebuild":
        @pl.when(can_improve)
        def _merge_rebuild():
            # k-pass rebuild merge (round-1 baseline, kept for A/B):
            # max over p and run k times, then concat.  ~6 elementwise
            # [TQ, TS] ops per pass x k passes.
            inv_col = (
                jnp.int32(cmask - tile_base)
                - jax.lax.broadcasted_iota(jnp.int32, (tq, tile_s), 1)
            )
            p = scores_i * jnp.int32(1 << col_bits) + inv_col
            col_ok = inv_col > jnp.int32(cmask) - ns_valid_ref[0]
            p = jnp.where(col_ok, p, jnp.int32(_PACK_SENTINEL))
            run = run_ref[:]
            outs = []
            for _ in range(k):
                m = jnp.maximum(
                    jnp.max(p, axis=1, keepdims=True),
                    jnp.max(run, axis=1, keepdims=True),
                )
                outs.append(m)
                p = jnp.where(p == m, jnp.int32(_PACK_SENTINEL), p)
                run = jnp.where(run == m, jnp.int32(_PACK_SENTINEL), run)
            run_ref[:] = jnp.concatenate(outs, axis=1)

    def _pack_tile():
        inv_col = (
            jnp.int32(cmask - tile_base)
            - jax.lax.broadcasted_iota(jnp.int32, (tq, tile_s), 1)
        )
        p = scores_i * jnp.int32(1 << col_bits) + inv_col
        # mask padded columns (col >= ns_valid  <=>  inv_col too small)
        col_ok = inv_col > jnp.int32(cmask) - ns_valid_ref[0]
        return jnp.where(col_ok, p, jnp.int32(_PACK_SENTINEL))

    def _entrant_loop(iters: int):
        # Kill-loop merge over the packed scratch: per iteration, take
        # each row's max remaining entrant, insert it into the sorted
        # run buffer arithmetically
        #     new_run = max(run, min(shift_right(run), m))
        # (exact for a descending sorted buffer: entries above m keep,
        # m lands at its rank, the rest shift right), kill it in the
        # scratch, and stop as soon as no row can still improve.
        for _ in range(iters):
            @pl.when(flag_ref[0] == 1)
            def _iter():
                m = jnp.max(p_ref[:], axis=1, keepdims=True)  # [TQ, 1]
                m_score = jax.lax.shift_right_arithmetic(m, col_bits)
                enter = jnp.logical_and(
                    m > run_ref[:, k - 1 : k],
                    m_score >= jnp.int32(min_keep),
                )
                go = jnp.any(enter)

                @pl.when(go)
                def _insert():
                    run = run_ref[:]
                    # rows whose max cannot enter insert a sentinel
                    # no-op instead (min() keeps their buffer intact)
                    mi = jnp.where(enter, m, jnp.int32(_PACK_SENTINEL))
                    top = jnp.full((tq, 1), jnp.int32(2**31 - 1))
                    shifted = jnp.concatenate(
                        [top, run[:, : k - 1]], axis=1
                    )
                    run_ref[:] = jnp.maximum(run, jnp.minimum(shifted, mi))
                    p_ref[:] = jnp.where(
                        p_ref[:] == m, jnp.int32(_PACK_SENTINEL), p_ref[:]
                    )

                flag_ref[0] = go.astype(jnp.int32)

    def _insert_merge_block(base: int, width: int):
        # First-entrant fast path + loop fallback.  Measured on the
        # bench corpus (2^17x8192, 1% planted hits, tq=256/ts=4096):
        # 81% of tiles fire the gate and EVERY firing tile has exactly
        # one entrant per row — the positional shingle embedding keeps
        # a hit from bleeding into neighboring script columns — so the
        # k-iteration kill loop is overhead on the common path.
        #
        # ``gate_cols`` sub-tile gating (round-2 verdict: the merge
        # gate cost ~20% of the kernel's own gate-off floor): the tile
        # is split into gate_cols column blocks, each with its OWN
        # gate + fast path over [TQ, TS/gate_cols], so one hot row
        # doesn't buy merge traversals over the whole tile.  Blocks
        # run left-to-right; the packed compare against the live k-th
        # (which only rises) keeps any insertion order exact, and the
        # global column is encoded in inv_col, so tie-breaks are
        # order-independent.
        #
        # The extraction works on RAW scores (no per-element pack; two
        # earlier shapes that packed per-element for fused reductions
        # blew the 16MB scoped-VMEM limit at 256x4096): the block
        # row-max [TQ,1] IS the first entrant's score, so one
        # iota-compare traversal finds its column (highest inv_col =
        # lowest col wins score ties — the packed tie-break), one
        # column-excluded max traversal detects any second entrant,
        # and only then does the block stage the packed scratch for
        # the kill loop.  Nothing block-sized is written on the common
        # path.  Exactness leans on min_keep >= 1 (enforced by the
        # static dispatch below): padded script rows embed to zero, so
        # a score >= min_keep >= 1 is always from a valid column and a
        # padded column can never equal the block max when it is >= 1;
        # rows whose max < min_keep are outside the min_keep
        # contract.  Eligibility vs the PRE-merge k-th is exact (it
        # only rises, so a non-entrant now never enters later) and the
        # kill loop re-checks entrants against the updated buffer.
        scores_b = (
            scores_i if width == tile_s
            else scores_i[:, base : base + width]
        )
        rmax_b = (
            row_max if width == tile_s
            else jnp.max(scores_b, axis=1, keepdims=True)
        )
        kth = run_ref[:, k - 1 : k]

        def inv_iota():
            return (
                jnp.int32(cmask - tile_base - base)
                - jax.lax.broadcasted_iota(jnp.int32, (tq, width), 1)
            )

        def insert_one(m):
            # arithmetic insert into the sorted-desc buffer; rows whose
            # m is the sentinel (no entrant) no-op naturally:
            # min(shifted, SENTINEL) = SENTINEL, max(run, SENTINEL) = run
            run = run_ref[:]
            top = jnp.full((tq, 1), jnp.int32(2**31 - 1))
            shifted = jnp.concatenate([top, run[:, : k - 1]], axis=1)
            run_ref[:] = jnp.maximum(run, jnp.minimum(shifted, m))

        inv1 = jnp.max(
            jnp.where(scores_b == rmax_b, inv_iota(), jnp.int32(-1)),
            axis=1, keepdims=True,
        )                                                   # [TQ, 1]
        m1p = rmax_b * jnp.int32(1 << col_bits) + inv1
        elig1 = jnp.logical_and(
            jnp.logical_and(rmax_b >= jnp.int32(min_keep), inv1 >= 0),
            m1p > kth,
        )
        insert_one(jnp.where(elig1, m1p, jnp.int32(_PACK_SENTINEL)))

        # second-best score with the first entrant's COLUMN excluded
        # (a tied second column keeps the same score and is caught)
        s2 = jnp.max(
            jnp.where(
                inv_iota() != inv1, scores_b, jnp.int32(_PACK_SENTINEL)
            ),
            axis=1, keepdims=True,
        )                                                   # [TQ, 1]
        # conservative packed upper bound for "could a second entrant
        # beat the pre-merge k-th" (inv unknown, assume the best); the
        # logical_and guards the s2 == sentinel case (shift garbage is
        # masked by the score test)
        need2 = jnp.logical_and(
            s2 >= jnp.int32(min_keep),
            s2 * jnp.int32(1 << col_bits) + jnp.int32(cmask) > kth,
        )

        @pl.when(jnp.any(need2))
        def _rest():
            # >= 2 candidate entrants in some row: stage the packed
            # block minus the taken column and run the exact kill loop
            # (m1 was either inserted or can never enter later — the
            # k-th only rises — so excluding its column stays exact)
            inv = inv_iota()
            pm = scores_b * jnp.int32(1 << col_bits) + inv
            col_ok = inv > jnp.int32(cmask) - ns_valid_ref[0]
            pm = jnp.where(col_ok, pm, jnp.int32(_PACK_SENTINEL))
            p_ref[:] = jnp.where(
                inv != inv1, pm, jnp.int32(_PACK_SENTINEL)
            )
            flag_ref[0] = jnp.int32(1)
            _entrant_loop(k - 1)

    def _gated_insert_blocks():
        # per-block gate: read the k-th fresh (earlier blocks may have
        # raised it), then run the block fast path only when some row
        # can still improve from THIS block
        sub = tile_s // gate_cols
        for b in range(gate_cols):
            scores_b = scores_i[:, b * sub : (b + 1) * sub]
            rmax_b = jnp.max(scores_b, axis=1, keepdims=True)
            can_b = jnp.any(
                jnp.logical_and(
                    rmax_b > _kth_score(),
                    rmax_b >= jnp.int32(min_keep),
                )
            )
            pl.when(can_b)(
                functools.partial(_insert_merge_block, b * sub, sub)
            )

    def _insertloop_merge():
        # Round-2 baseline insert merge (kept as the A/B control):
        # packed tile to scratch, then the kill loop for ALL entrants.
        p_ref[:] = _pack_tile()
        flag_ref[0] = jnp.int32(1)
        _entrant_loop(k)

    if merge == "insert":
        # the raw-score fast path's padded-column reasoning needs
        # min_keep >= 1 (static); exact/low-threshold callers get the
        # staged kill loop, which is the better shape there anyway
        # (exact mode makes nearly every entry an entrant)
        if min_keep >= 1:
            if gate_cols == 1:
                pl.when(can_improve)(
                    functools.partial(_insert_merge_block, 0, tile_s)
                )
            else:
                _gated_insert_blocks()
        else:
            pl.when(can_improve)(_insertloop_merge)
    elif merge == "insertloop":
        pl.when(can_improve)(_insertloop_merge)

    @pl.when(j == nj - 1)
    def _emit():
        packed = run_ref[:]
        score = jax.lax.shift_right_arithmetic(packed, col_bits)
        empty = packed == jnp.int32(_PACK_SENTINEL)
        vals_ref[:] = jnp.where(
            empty, NEG_INF, score.astype(jnp.float32) * inv_dim
        )
        idx_ref[:] = jnp.where(
            empty, 0, jnp.int32(cmask) - (packed & jnp.int32(cmask))
        )


def _topk_kernel_rows(
    ns_valid_ref,  # SMEM (1,) int32 — true NS before padding
    q_ref,         # VMEM [TQ, D] int8 (or [D, TQ] when q_transposed)
    s_ref,         # VMEM [TS, D] int8
    vals_ref,      # VMEM [TQ, K] f32 out
    idx_ref,       # VMEM [TQ, K] i32 out
    run_ref,       # VMEM scratch [TQ, K] int32 — packed (score, col)
    p_ref,         # VMEM scratch [TQ, TS] int32 — fallback packed tile
    flag_ref,      # SMEM scratch (1,) int32 — loop continue flag
    enter_ref,     # VMEM scratch [TQ, 1] int32 — pending entrant rows
    prow_ref,      # VMEM scratch [1, TS] int32 — one packed score row
    rrow_ref,      # VMEM scratch [1, K] int32 — one row of the run buffer
    *,
    k: int,
    tile_s: int,
    inv_dim: float,
    compute: str,
    min_keep: int,
    q_transposed: bool,
    max_rows: int,
    col_bits: int = _COL_BITS,
):
    """Row-extraction merge (VERDICT r3 #5: the hit-dense regime).

    The insert merge pays ~3 full [TQ, TS] traversals on every firing
    tile, but at realistic quote density a firing tile has only 1-3
    entrant ROWS (measured on the bench corpus: 81% of tiles fire with
    exactly one entrant per row).  This variant gates like the insert
    merge, then processes entrant rows ONE AT A TIME: the row's scores
    are recomputed as two trivial one-hot MXU matmuls (never a dynamic
    lane slice), packed into a [1, TS] scratch, and merged with a
    [1, TS] kill loop — ~30x less VPU work per entrant than a full-
    tile traversal.  After ``max_rows`` extractions any remaining
    entrant rows (adversarially dense tiles) fall back to the exact
    staged kill loop over the still-pending rows, so the variant is
    exact at every density.

    MEASURED NEGATIVE — kept as the logged A/B control (rejected
    restructuring (g), 2026-08-19 device A/B, scripts/merge_rows_ab.py
    with RTT-amortized timing): rows x0.24 vs insert at 1% plants
    (23.7 vs 5.75 ms), x0.21 at 5%, parity exact at every density.
    Two cuts were tried: (1) pl.when per extracted row + flag-gated
    kill loop — every data-dependent predicate is a vector->scalar
    sync; (2) this fully BRANCH-FREE version (exactly two predicates
    per firing tile: the gate and the fallback check; no-op rows
    degenerate arithmetically via an all-zero one-hot; sentinel no-op
    inserts; unconditional kills).  Both lose for the same underlying
    reason: per-row processing serializes ~k cross-lane reductions on
    [1, TS] slices per entrant, and a cross-lane reduction is
    latency-bound on the VPU — the full-tile insert merge amortizes
    ONE reduction over 256 rows of parallel lanes.  The same A/B,
    measured with per-dispatch syncs, also exposed that the round-3
    "35.8 G hit-dense vs 133 G clean" figures were dominated by
    ~20 ms/sync of tunnel RTT: amortized, the production insert merge
    runs 261 G clean / 187 G at 1% plants / 175 G at 5% — the firing
    tiles cost ~1.4x, not ~3.7x (scripts/fire_cost_probe.py ladder:
    gate-noop 3.99 ms, m1-insert-only 4.69, full 5.72 at 1%).

    Branch-free mechanics, for the record: an exhausted pending set
    extracts mx=-1, whose one-hot is all-zero, so the whole row
    pipeline (zero scores < min_keep, a no-row run-buffer mask)
    degenerates to arithmetic no-ops; inserts use the sentinel no-op
    identity max(run, min(shifted, SENTINEL)) = run; and the per-row
    kill is unconditional (killing a non-entrant max is safe: every
    later max is smaller and also fails the same test).

    Exactness mirrors the insert merge: the gate / entrant criterion
    compares raw scores against the pre-merge k-th (strict >), which
    is exact because a later tile's equal score has a lower inv_col
    and can never enter; row processing is independent per row (only
    row r's k-th moves when row r inserts); the per-row kill loop is
    the packed-arithmetic insert of _entrant_loop restricted to one
    row, run a full k iterations.  Requires min_keep >= 1 (static
    dispatch below): the padded-column reasoning of the insert fast
    path AND the no-op-row degeneration (zero scores must fail the
    min_keep test).
    """
    cmask = (1 << col_bits) - 1
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tq = run_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        run_ref[:] = jnp.full_like(run_ref[:], _PACK_SENTINEL)

    q_dims = ((0,), (1,)) if q_transposed else ((1,), (1,))
    if compute == "int8":
        scores_i = jax.lax.dot_general(
            q_ref[:], s_ref[:],
            dimension_numbers=(q_dims, ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        scores_i = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16), s_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(q_dims, ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    tile_base = j * tile_s
    row_max = jnp.max(scores_i, axis=1, keepdims=True)
    kth_score = jax.lax.shift_right_arithmetic(
        run_ref[:, k - 1 : k], col_bits
    )
    can_improve = jnp.any(
        jnp.logical_and(row_max > kth_score, row_max >= jnp.int32(min_keep))
    )

    @pl.when(can_improve)
    def _rows_merge():
        # pending entrant rows, encoded DESCENDING (TQ-1-row) so a max
        # reduce yields the lowest pending row; -1 = none/done
        iota_desc = (
            jnp.int32(tq - 1)
            - jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
        )
        enter_ref[:] = jnp.where(
            jnp.logical_and(
                row_max > kth_score, row_max >= jnp.int32(min_keep)
            ),
            iota_desc,
            jnp.int32(-1),
        )

        def _one_row():
            # rank-0: TQ-1-row of the next pending entrant; -1 = none,
            # which degenerates every step below to an arithmetic no-op
            mx = jnp.max(enter_ref[:])
            r_v = jnp.int32(tq - 1) - mx
            row_is_r = iota_desc == mx  # [TQ, 1]; all-false when mx=-1
            # the row's scores via two one-hot MXU matmuls: the query
            # row embedding, then its dots against the whole script
            # tile — int8 inputs, exact int32 results, identical to
            # the tile matmul's row.  mx=-1 -> all-zero one-hot ->
            # zero scores, which fail min_keep >= 1 everywhere.
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (1, tq), 1) == r_v
            ).astype(jnp.int8)
            qrow = jax.lax.dot_general(
                oh, q_ref[:],
                dimension_numbers=(
                    (((1,), (1,)) if q_transposed else ((1,), (0,))),
                    ((), ()),
                ),
                preferred_element_type=jnp.int32,
            )  # [1, D]
            scores_row = jax.lax.dot_general(
                qrow.astype(jnp.int8), s_ref[:],
                dimension_numbers=((((1,), (1,))), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [1, TS]
            inv_col = (
                jnp.int32(cmask - tile_base)
                - jax.lax.broadcasted_iota(jnp.int32, (1, tile_s), 1)
            )
            pr = scores_row * jnp.int32(1 << col_bits) + inv_col
            col_ok = inv_col > jnp.int32(cmask) - ns_valid_ref[0]
            prow_ref[:] = jnp.where(col_ok, pr, jnp.int32(_PACK_SENTINEL))
            # row r of the run buffer into the [1, K] scratch (INT_MIN
            # for the no-op row: nothing can enter past min_keep)
            rrow_ref[:] = jnp.max(
                jnp.where(row_is_r, run_ref[:], jnp.int32(-(2**31))),
                axis=0, keepdims=True,
            )
            # per-row kill loop, branch-free: sentinel no-op inserts,
            # unconditional kill of the max (a non-entrant max proves
            # every remaining element is a non-entrant too)
            for _ in range(k):
                m = jnp.max(prow_ref[:])  # rank-0 packed max
                m_score = jax.lax.shift_right_arithmetic(m, col_bits)
                rr = rrow_ref[:]
                go = jnp.logical_and(
                    m > rr[0, k - 1], m_score >= jnp.int32(min_keep)
                )
                mi = jnp.where(go, m, jnp.int32(_PACK_SENTINEL))
                top = jnp.full((1, 1), jnp.int32(2**31 - 1))
                shifted = jnp.concatenate([top, rr[:, : k - 1]], axis=1)
                rrow_ref[:] = jnp.maximum(rr, jnp.minimum(shifted, mi))
                prow_ref[:] = jnp.where(
                    prow_ref[:] == m, jnp.int32(_PACK_SENTINEL),
                    prow_ref[:],
                )
            # write the merged row back (no-op when mx=-1) and clear
            # the row from the pending set
            run_ref[:] = jnp.where(row_is_r, rrow_ref[:], run_ref[:])
            enter_ref[:] = jnp.where(
                row_is_r, jnp.int32(-1), enter_ref[:]
            )

        for _ in range(max_rows):
            _one_row()

        # adversarially dense tile (> max_rows entrant rows): stage the
        # packed tile masked to the still-pending rows and run the
        # exact kill loop (processed rows are fully merged already)
        rem = jnp.max(enter_ref[:]) >= 0

        @pl.when(rem)
        def _fallback():
            inv_col = (
                jnp.int32(cmask - tile_base)
                - jax.lax.broadcasted_iota(jnp.int32, (tq, tile_s), 1)
            )
            p = scores_i * jnp.int32(1 << col_bits) + inv_col
            col_ok = inv_col > jnp.int32(cmask) - ns_valid_ref[0]
            p = jnp.where(col_ok, p, jnp.int32(_PACK_SENTINEL))
            p_ref[:] = jnp.where(
                enter_ref[:] >= 0, p, jnp.int32(_PACK_SENTINEL)
            )
            flag_ref[0] = jnp.int32(1)
            for _ in range(k):
                @pl.when(flag_ref[0] == 1)
                def _iter():
                    m = jnp.max(p_ref[:], axis=1, keepdims=True)
                    m_score = jax.lax.shift_right_arithmetic(m, col_bits)
                    enter = jnp.logical_and(
                        m > run_ref[:, k - 1 : k],
                        m_score >= jnp.int32(min_keep),
                    )
                    go = jnp.any(enter)

                    @pl.when(go)
                    def _insert():
                        run = run_ref[:]
                        mi = jnp.where(enter, m, jnp.int32(_PACK_SENTINEL))
                        top = jnp.full((tq, 1), jnp.int32(2**31 - 1))
                        shifted = jnp.concatenate(
                            [top, run[:, : k - 1]], axis=1
                        )
                        run_ref[:] = jnp.maximum(
                            run, jnp.minimum(shifted, mi)
                        )
                        p_ref[:] = jnp.where(
                            p_ref[:] == m, jnp.int32(_PACK_SENTINEL),
                            p_ref[:],
                        )

                    flag_ref[0] = go.astype(jnp.int32)

    @pl.when(j == nj - 1)
    def _emit():
        packed = run_ref[:]
        score = jax.lax.shift_right_arithmetic(packed, col_bits)
        empty = packed == jnp.int32(_PACK_SENTINEL)
        vals_ref[:] = jnp.where(
            empty, NEG_INF, score.astype(jnp.float32) * inv_dim
        )
        idx_ref[:] = jnp.where(
            empty, 0, jnp.int32(cmask) - (packed & jnp.int32(cmask))
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "dim", "tile_q", "tile_s", "interpret", "compute", "min_keep",
        "q_transposed", "max_abs_score", "merge", "gate_cols",
    ),
)
def topk_dot_pallas(
    q_emb: jax.Array,   # int8 [NQ, D] (or [D, NQ] when q_transposed)
    s_emb: jax.Array,   # int8 [NS, D], NS % tile_s == 0 (pad rows zero)
    ns_valid,           # int32 scalar — true NS before padding
    k: int,
    dim: int,
    *,
    tile_q: int = 128,
    tile_s: int = 2048,
    interpret: bool = False,
    compute: str = "int8",
    min_keep: float = -float("inf"),
    q_transposed: bool = False,
    max_abs_score: int = 4608,
    merge: str = "insert",
    gate_cols: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused scores + top-k.  ``min_keep`` (in dot/dim units) declares
    that the caller discards scores below it: rows whose results fall
    entirely below min_keep may return padding instead of their exact
    top-k, which lets noise tiles skip the expensive merge.  Leave at
    -inf for the exact full top-k.  ``q_transposed`` takes q as
    [D, NQ] — the lane-major layout ops/embed.py emits — avoiding any
    relayout between embedding and matmul.  ``max_abs_score`` is the
    caller's bound on the raw integer dot (n^2 * dim for the shingle
    embedding); past the default 17-column-bit budget (8191) the
    packing trades column bits for score bits (dim=256 -> 16 bits,
    512 -> 15, 1024 -> 14 — column chunking covers the narrower
    field), and beyond the 14-bit budget (65535) the wrapper runs an
    exact unpacked top-k instead (correct, slower — measured wrong
    answers at dim>=256 without this).  ``gate_cols`` splits each tile
    into that many column blocks with independent merge gates
    (insert fast path only; see _insert_merge_block) — sub-tile
    gating so one hot row doesn't un-skip a whole tile's merge.
    Device A/B (scripts/gate_ab.py, 2026-08-19, 1%-plant corpus where
    81% of tiles fire): gate_cols 1/2/4 within noise, 8 worse — at
    realistic hit density every tile has an entrant ROW, so narrowing
    the columns only splits the same traversals.  Default stays 1."""
    if merge not in ("insert", "insertloop", "rebuild", "rows"):
        # an unknown value would emit a kernel with NO merge branch,
        # returning the sentinel-initialized buffer as silent garbage
        raise ValueError(
            f"merge must be 'insert', 'insertloop', 'rebuild' or "
            f"'rows', got {merge!r}"
        )
    if gate_cols is None:
        # repo-wide default, env-overridable so the recapture scripts
        # can A/B sub-tile gating through the whole engine; the
        # 2026-08-19 device A/B settled on 1 (see docstring)
        gate_cols = _default_gate_cols()
    if gate_cols < 1 or tile_s % (gate_cols * 128) != 0:
        # each block must stay lane-aligned (128) for clean VMEM slices
        raise ValueError(
            f"gate_cols ({gate_cols}) must divide tile_s ({tile_s}) "
            f"into 128-multiple column blocks"
        )
    if q_transposed:
        d, nq = q_emb.shape
    else:
        nq, d = q_emb.shape
    ns = s_emb.shape[0]
    assert nq % tile_q == 0, (nq, tile_q)
    assert ns % tile_s == 0, (ns, tile_s)

    if max_abs_score > _PACK_MAX_SCORE:
        # Exact unpacked fallback: int8 MXU matmul + masked lax.top_k
        # (stable: lowest index wins ties, same as the packed kernel).
        q = q_emb.T if q_transposed else q_emb
        scores = jax.lax.dot_general(
            q, s_emb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        col = jnp.arange(ns, dtype=jnp.int32)[None, :]
        scores = jnp.where(col < jnp.asarray(ns_valid), scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, k)
        return vals / dim, idx.astype(jnp.int32)

    col_bits = _col_bits_for(max_abs_score)
    max_cols = 1 << col_bits
    if ns > max_cols:
        # Column-chunk: the packed (score, col) selection carries
        # col_bits column bits (17 at the default spec; fewer when the
        # score bound demands it).  Run the kernel per 2^col_bits-
        # column chunk and merge the tiny per-chunk top-k tables with
        # lax.top_k (chunk order ascending keeps lowest-index
        # tie-breaking).
        vs, ids = [], []
        for c0 in range(0, ns, max_cols):
            s_c = s_emb[c0 : c0 + max_cols]
            nsv_c = jnp.clip(
                jnp.asarray(ns_valid, jnp.int32) - c0, 0, s_c.shape[0]
            )
            v, i = topk_dot_pallas(
                s_emb=s_c, q_emb=q_emb, ns_valid=nsv_c, k=k, dim=dim,
                tile_q=tile_q, tile_s=min(tile_s, s_c.shape[0]),
                interpret=interpret, compute=compute, min_keep=min_keep,
                q_transposed=q_transposed, max_abs_score=max_abs_score,
                merge=merge, gate_cols=gate_cols,
            )
            vs.append(v)
            ids.append(i + c0)
        allv = jnp.concatenate(vs, axis=1)
        alli = jnp.concatenate(ids, axis=1)
        mv, mp = jax.lax.top_k(allv, k)
        return mv, jnp.take_along_axis(alli, mp, axis=1)

    grid = (nq // tile_q, ns // tile_s)
    # integer threshold in raw-dot units (scores are exact integers);
    # ceil keeps "score >= min_keep" semantics, the sentinel floor
    # keeps -inf representable in int32
    if np.isfinite(min_keep):
        min_keep_i = max(int(np.ceil(min_keep * dim)), _PACK_SENTINEL)
    else:
        min_keep_i = _PACK_SENTINEL

    if merge == "rows" and min_keep_i < 1:
        # the row path's padded-column/entrant reasoning needs
        # min_keep >= 1 (like the insert fast path); exact-mode
        # callers get the staged kill loop
        merge = "insertloop"

    if merge == "rows":
        kernel = functools.partial(
            _topk_kernel_rows, k=k, tile_s=tile_s, inv_dim=1.0 / dim,
            compute=compute, min_keep=min_keep_i,
            q_transposed=q_transposed, max_rows=_default_merge_rows_max(),
            col_bits=col_bits,
        )
        scratch_shapes = [
            pltpu.VMEM((tile_q, k), jnp.int32),        # run buffer
            pltpu.VMEM((tile_q, tile_s), jnp.int32),   # fallback packed
            pltpu.SMEM((1,), jnp.int32),               # kill-loop flag
            pltpu.VMEM((tile_q, 1), jnp.int32),        # pending rows
            pltpu.VMEM((1, tile_s), jnp.int32),        # packed score row
            pltpu.VMEM((1, k), jnp.int32),             # run-buffer row
        ]
    else:
        kernel = functools.partial(
            _topk_kernel, k=k, tile_s=tile_s, inv_dim=1.0 / dim,
            compute=compute, min_keep=min_keep_i,
            q_transposed=q_transposed, merge=merge, gate_cols=gate_cols,
            col_bits=col_bits,
        )
        scratch_shapes = [
            pltpu.VMEM((tile_q, k), jnp.int32),
            # the rebuild merge keeps its packed tile in registers;
            # only the kill-loop merges need the packed scratch —
            # one column BLOCK wide on the sub-gated fast path
            # (gate_cols > 1 shrinks it, freeing VMEM for tiles)
            pltpu.VMEM(
                (
                    tile_q,
                    tile_s // gate_cols
                    if min_keep_i >= 1 and merge == "insert"
                    else tile_s,
                )
                if merge in ("insert", "insertloop")
                else (8, 128),
                jnp.int32,
            ),
            pltpu.SMEM((1,), jnp.int32),
        ]
    ns_valid_arr = jnp.asarray(ns_valid, dtype=jnp.int32).reshape((1,))

    q_spec = (
        pl.BlockSpec((d, tile_q), lambda i, j, ns_ref: (0, i))
        if q_transposed
        else pl.BlockSpec((tile_q, d), lambda i, j, ns_ref: (i, 0))
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                q_spec,
                pl.BlockSpec((tile_s, d), lambda i, j, ns_ref: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, k), lambda i, j, ns_ref: (i, 0)),
                pl.BlockSpec((tile_q, k), lambda i, j, ns_ref: (i, 0)),
            ],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * ns * d,
            bytes_accessed=nq * d + ns * d + nq * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ns_valid_arr, q_emb, s_emb)
    return vals, idx


@functools.lru_cache(maxsize=1)
def _default_merge_rows_max() -> int:
    """Entrant rows extracted per tile before the rows merge falls back
    to the full-tile staged kill loop (FS_MERGE_ROWS_MAX env override
    for on-device A/B).  At the bench corpus's 1% plant density a
    firing tile has 1-3 entrant rows; 8 covers it with margin while
    bounding unrolled code size."""
    import os

    return max(1, int(os.environ.get("FS_MERGE_ROWS_MAX", "8")))


@functools.lru_cache(maxsize=1)
def _default_gate_cols() -> int:
    """Default sub-tile gate split (FS_GATE_COLS env override for
    on-device A/B through the engine; see scripts/gate_ab.py)."""
    import os

    return max(1, int(os.environ.get("FS_GATE_COLS", "1")))


def engine_tiles(nq: int, ns: int) -> Tuple[int, int]:
    """Best-measured tile shape for the fused kernel (v5e, engine mode).

    Interleaved sweep at 2^17 x 8192 (scripts/tile_sweep.py, 2026-08-17):
    256x4096 = 109 G pairs/s vs 98 G at the round-1 128x2048 — the
    insert merge lowered register pressure enough that bigger tiles
    win (they lost 2.3x under the rebuild merge).  Falls back to the
    universally-divisible 128x2048 when shapes demand.
    """
    tq = 256 if nq % 256 == 0 else 128
    ts = 4096 if ns % 4096 == 0 else 2048
    return tq, ts


def pad_rows(x: np.ndarray | jax.Array, multiple: int):
    """Zero-pad axis 0 to a multiple; returns (padded, original_len)."""
    n = x.shape[0]
    target = max(multiple, _round_up(n, multiple))
    if target == n:
        return x, n
    pad = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.pad(x, pad), n


def topk_dot(
    q_emb,
    s_emb,
    k: int,
    dim: int,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
    tile_q: int = 128,
    tile_s: int = 2048,
    compute: str = "int8",
    min_keep: float = -float("inf"),
    max_abs_score: int = 4608,
):
    """Dispatcher with automatic padding. Returns (vals, idx) for true rows."""
    nq = q_emb.shape[0]
    ns = s_emb.shape[0]
    if nq == 0 or ns == 0:
        return (
            jnp.full((nq, k), NEG_INF, dtype=jnp.float32),
            jnp.zeros((nq, k), dtype=jnp.int32),
        )
    if not use_pallas:
        return topk_dot_jnp(jnp.asarray(q_emb), jnp.asarray(s_emb), k, dim)
    qp, _ = pad_rows(jnp.asarray(q_emb), tile_q)
    sp, ns_valid = pad_rows(jnp.asarray(s_emb), tile_s)
    vals, idx = topk_dot_pallas(
        qp, sp, ns_valid, k, dim,
        tile_q=tile_q, tile_s=tile_s, interpret=interpret, compute=compute,
        min_keep=min_keep, max_abs_score=max_abs_score,
    )
    return vals[:nq], idx[:nq]
