"""Random-projection LSH prefilter (BASELINE.json:11; PAPERS.md:5-9).

Two-stage candidate generation that replaces the brute-force dot kernel
when the script index is large:

  stage 1 — coarse: every shingle embedding is sketched into ``bits``
    sign bits of random +-1 projections, packed 32/uint32.  Hamming
    similarity of packed codes approximates angular similarity
    (Charikar SimHash), and a Pallas kernel (XOR + SWAR popcount +
    shared running-top-k merge) keeps the best ``rerank`` per query —
    the [NQ, NS] code-score matrix never exists in HBM.

  stage 2 — exact: the ``rerank`` survivors are gathered and re-scored
    with the exact int8 dot, then reduced to top-k.  Exact-NN recall@10
    is therefore 1.0 whenever the true top-k survive stage 1; measured
    recall vs the exact kernel >= 0.99 at default settings
    (BASELINE.md target; see tests/test_lsh.py and bench.py).

Compute shape — an honest note: stage 1 touches 8x fewer bytes per
pair than the exact kernel (128 B embedding -> 16 B code), but costs
~7 VPU ops per packed word (XOR + SWAR popcount) where the exact
kernel costs one int8 MXU MAC per dim — and the MXU's MAC throughput
is an order of magnitude above the VPU's.  On TPU the linear-scan
prefilter therefore only wins when the scan is HBM-bandwidth-bound
(script indexes of ~10^6+ shingles); at typical script sizes the MXU
brute-force kernel is faster, which bench.py reports explicitly.
This mirrors the published TPU nearest-neighbor result that brute
force on the MXU is extremely hard to beat at moderate index sizes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fandom_search_tpu.config import LSHConfig, ShingleConfig
from fandom_search_tpu.ops.distance_topk import NEG_INF, pad_rows


def _round_up_pad(n: int, multiple: int) -> int:
    """Padded row count pad_rows() would produce for n rows."""
    return max(multiple, -(-n // multiple) * multiple)


def popcount32(v):
    """SWAR popcount for uint32 arrays; works in NumPy, XLA, and Mosaic."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def make_projection(cfg: LSHConfig, dim: int) -> np.ndarray:
    """Deterministic +-1 projection matrix [dim, bits] (int8)."""
    rng = np.random.default_rng(cfg.seed)
    return (rng.integers(0, 2, size=(dim, cfg.bits)) * 2 - 1).astype(np.int8)


def pack_sign_bits(proj_scores) -> jax.Array:
    """[N, bits] scores -> [N, bits//32] packed uint32 of sign bits."""
    n, bits = proj_scores.shape
    b = (proj_scores >= 0).astype(jnp.uint32).reshape(n, bits // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def encode(emb, projection) -> jax.Array:
    """int8 embeddings [N, D] -> packed sign codes [N, bits//32] uint32."""
    scores = jax.lax.dot_general(
        jnp.asarray(emb).astype(jnp.bfloat16),
        jnp.asarray(projection).astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return pack_sign_bits(scores)


@dataclass
class LSHIndex:
    """Device-resident prefilter index over the script shingle matrix."""

    projection: jax.Array    # int8 [D, bits]
    codes_t: jax.Array       # uint32 [W, NS_pad] — transposed packed codes
    ns_valid: int

    @classmethod
    def build(
        cls, s_emb: np.ndarray, cfg: LSHConfig, shingle_cfg: ShingleConfig,
        pad_multiple: int = 512,
    ) -> "LSHIndex":
        proj = jnp.asarray(make_projection(cfg, shingle_cfg.dim))
        s_pad, ns = pad_rows(jnp.asarray(s_emb), pad_multiple)
        codes = encode(s_pad, proj)                      # [NS_pad, W]
        return cls(
            projection=proj,
            codes_t=jnp.asarray(codes).T.copy(),         # [W, NS_pad]
            ns_valid=int(ns),
        )


# ---------------------------------------------------------------------------
# stage 1: fused Hamming-similarity + running top-R Pallas kernel
# ---------------------------------------------------------------------------


# packed selection constants (same trick as ops/distance_topk.py):
# packed = sim * 2^17 + (2^17 - 1 - col).  Hamming similarity is an
# integer in [-bits, bits], bits <= 8192 keeps packed within int32.
_COL_BITS = 17
_COL_MASK = (1 << _COL_BITS) - 1
_SENT = -(1 << 30)


def _hamming_topk_kernel(
    ns_valid_ref,  # SMEM (1,) int32
    q_ref,         # VMEM [TQ, W] uint32
    st_ref,        # VMEM [W, TS] uint32 (codes transposed)
    vals_ref,      # VMEM [TQ, R] f32 out (similarity = bits - 2*hamming)
    idx_ref,       # VMEM [TQ, R] i32 out
    run_ref,       # VMEM scratch [TQ, R] int32 packed, sorted desc
    p_ref,         # VMEM scratch [TQ, TS] int32 packed tile
    run_old_ref,   # VMEM scratch [TQ, R] int32 — prior run during merge
    *,
    rerank: int,
    tile_s: int,
    words: int,
    bits: int,
    min_keep_sim: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        run_ref[:] = jnp.full_like(run_ref[:], _SENT)

    tq = q_ref.shape[0]
    acc = jnp.zeros((tq, tile_s), jnp.uint32)
    for w in range(words):  # static unroll: W = bits/32
        qw = q_ref[:, w : w + 1]          # [TQ, 1]
        sw = st_ref[w : w + 1, :]         # [1, TS]
        acc = acc + popcount32(qw ^ sw)   # broadcast XOR -> [TQ, TS]

    # integer similarity; uint32 -> int32 is exact (acc <= bits)
    sim = jnp.int32(bits) - 2 * acc.astype(jnp.int32)

    # merge gate (see distance_topk): skip unless some row can either
    # improve its R-th best or clear the caller's keep threshold
    row_max = jnp.max(sim, axis=1, keepdims=True)
    kth = jax.lax.shift_right_arithmetic(
        run_ref[:, rerank - 1 : rerank], _COL_BITS
    )
    can_improve = jnp.any(
        jnp.logical_and(row_max > kth, row_max >= jnp.int32(min_keep_sim))
    )

    @pl.when(can_improve)
    def _merge():
        tile_base = j * tile_s
        inv_col = (
            jnp.int32(_COL_MASK - tile_base)
            - jax.lax.broadcasted_iota(jnp.int32, (tq, tile_s), 1)
        )
        p = sim * jnp.int32(1 << _COL_BITS) + inv_col
        col_ok = inv_col > jnp.int32(_COL_MASK) - ns_valid_ref[0]
        p_ref[:] = jnp.where(col_ok, p, jnp.int32(_SENT))
        run_old_ref[:] = run_ref[:]
        run_ref[:] = jnp.full((tq, rerank), _SENT, jnp.int32)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (tq, rerank), 1)

        # R selection passes in a fori_loop (constant compile size for
        # any R, unlike an unrolled concat merge); the winner lands in
        # run slot r via a one-hot select (dynamic lane stores are not
        # expressible in Mosaic)
        def step(r, _):
            m = jnp.maximum(
                jnp.max(p_ref[:], axis=1, keepdims=True),
                jnp.max(run_old_ref[:], axis=1, keepdims=True),
            )
            run_ref[:] = jnp.where(lane_r == r, m, run_ref[:])
            p_ref[:] = jnp.where(p_ref[:] == m, jnp.int32(_SENT), p_ref[:])
            run_old_ref[:] = jnp.where(
                run_old_ref[:] == m, jnp.int32(_SENT), run_old_ref[:]
            )
            return 0

        jax.lax.fori_loop(0, rerank, step, 0)

    @pl.when(j == nj - 1)
    def _emit():
        packed = run_ref[:]
        sim_out = jax.lax.shift_right_arithmetic(packed, _COL_BITS)
        empty = packed == jnp.int32(_SENT)
        vals_ref[:] = jnp.where(
            empty, NEG_INF, sim_out.astype(jnp.float32)
        )
        idx_ref[:] = jnp.where(
            empty, 0, jnp.int32(_COL_MASK) - (packed & jnp.int32(_COL_MASK))
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "rerank", "bits", "tile_q", "tile_s", "interpret", "min_keep_sim",
    ),
)
def hamming_topk_pallas(
    q_codes: jax.Array,   # uint32 [NQ, W], NQ % tile_q == 0
    s_codes_t: jax.Array,  # uint32 [W, NS_pad], NS_pad % tile_s == 0
    ns_valid,
    rerank: int,
    bits: int,
    *,
    tile_q: int = 256,
    tile_s: int = 512,
    interpret: bool = False,
    min_keep_sim: int = _SENT,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Hamming-similarity top-R.  ``min_keep_sim`` (bits-scale)
    declares that the caller discards candidates whose similarity is
    below it, letting sub-threshold tiles skip the selection passes —
    set it for prefiltering, leave at the sentinel for exact top-R.

    tile_s is deliberately small: the unrolled 32-word XOR+popcount
    keeps ~10 [tile_q, tile_s] u32 temporaries live, and scoped VMEM
    tops out at 16 MB (2048-wide tiles OOM the Mosaic stack)."""
    nq, words = q_codes.shape
    ns = s_codes_t.shape[1]
    assert nq % tile_q == 0 and ns % tile_s == 0, (nq, ns)

    max_cols = 1 << _COL_BITS
    if ns > max_cols:
        # Column-chunk like ops/distance_topk.py: the packed (sim, col)
        # selection carries 17 column bits, so indexes wider than 2^17
        # shingles run the kernel per chunk and merge the small
        # per-chunk top-R tables with lax.top_k (ascending chunk order
        # keeps lowest-index tie-breaking).
        vs, ids = [], []
        for c0 in range(0, ns, max_cols):
            s_c = s_codes_t[:, c0 : c0 + max_cols]
            nsv_c = jnp.clip(
                jnp.asarray(ns_valid, jnp.int32) - c0, 0, s_c.shape[1]
            )
            v, i = hamming_topk_pallas(
                q_codes, s_c, nsv_c, rerank, bits,
                tile_q=tile_q, tile_s=min(tile_s, s_c.shape[1]),
                interpret=interpret, min_keep_sim=min_keep_sim,
            )
            vs.append(v)
            ids.append(i + c0)
        allv = jnp.concatenate(vs, axis=1)
        alli = jnp.concatenate(ids, axis=1)
        mv, mp = jax.lax.top_k(allv, rerank)
        return mv, jnp.take_along_axis(alli, mp, axis=1)

    grid = (nq // tile_q, ns // tile_s)
    kernel = functools.partial(
        _hamming_topk_kernel,
        rerank=rerank, tile_s=tile_s, words=words, bits=bits,
        min_keep_sim=min_keep_sim,
    )
    ns_valid_arr = jnp.asarray(ns_valid, dtype=jnp.int32).reshape((1,))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, words), lambda i, j, ns_ref: (i, 0)),
                pl.BlockSpec((words, tile_s), lambda i, j, ns_ref: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, rerank), lambda i, j, ns_ref: (i, 0)),
                pl.BlockSpec((tile_q, rerank), lambda i, j, ns_ref: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_q, rerank), jnp.int32),
                pltpu.VMEM((tile_q, tile_s), jnp.int32),
                pltpu.VMEM((tile_q, rerank), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nq, rerank), jnp.float32),
            jax.ShapeDtypeStruct((nq, rerank), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * nq * ns * words,
            bytes_accessed=4 * (nq * words + ns * words + nq * rerank * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ns_valid_arr, q_codes, s_codes_t)


# ---------------------------------------------------------------------------
# stage 2: exact re-score of the survivors
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "dim", "chunk"))
def rerank_exact(
    q_emb: jax.Array,     # int8 [NQ, D]
    s_emb: jax.Array,     # int8 [NS_pad, D]
    cand_idx: jax.Array,  # int32 [NQ, R] from stage 1
    cand_ok: jax.Array,   # bool [NQ, R] — stage-1 validity (vals > NEG_INF)
    k: int,
    dim: int,
    chunk: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    nq, r = cand_idx.shape
    if chunk is None:
        # One gather+einsum when the gathered block fits comfortably
        # (serialized lax.map chunks at 1024 rows measured latency-
        # bound: 128 sequential dispatches per 131k-query batch);
        # otherwise the largest pow2 chunk under ~1 GB.
        chunk = 1024
        # bound the POST-doubling size, so the cap holds for the chunk
        # actually used (doubling after the check could land at 2 GB)
        while chunk < nq and 2 * chunk * r * dim < (1 << 30):
            chunk *= 2

    def one(args):
        qe, ci, ok = args                       # [c, D], [c, R], [c, R]
        se = jnp.take(s_emb, ci, axis=0)        # [c, R, D] int8
        scores = jnp.einsum(
            "crd,cd->cr",
            se.astype(jnp.bfloat16),
            qe.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) / dim
        scores = jnp.where(ok, scores, NEG_INF)
        vals, pos = jax.lax.top_k(scores, k)     # R is small; cheap sort
        idx = jnp.take_along_axis(ci, pos, axis=1)
        return vals, idx

    if nq <= chunk:
        return one((q_emb, cand_idx, cand_ok))
    pad = (-nq) % chunk
    if pad:
        q_emb = jnp.pad(q_emb, ((0, pad), (0, 0)))
        cand_idx = jnp.pad(cand_idx, ((0, pad), (0, 0)))
        cand_ok = jnp.pad(cand_ok, ((0, pad), (0, 0)))
    c = (nq + pad) // chunk
    vals, idx = jax.lax.map(
        one,
        (
            q_emb.reshape(c, chunk, -1),
            cand_idx.reshape(c, chunk, r),
            cand_ok.reshape(c, chunk, r),
        ),
    )
    return vals.reshape(-1, k)[:nq], idx.reshape(-1, k)[:nq]


def coarse_sim_threshold(
    candidate_threshold: float, n: int, bits: int, sigmas: float = 6.0
) -> int:
    """Hamming-similarity floor equivalent to the engine's candidate
    threshold, minus a ``sigmas`` safety margin of code noise.

    A candidate with m matching words of n has expected similarity
    bits*(1 - 2*acos(m/n)/pi) with sd 2*sqrt(bits*p*(1-p)); anything
    the engine could keep sits ``sigmas`` deviations above this floor,
    so gating the kernel on it loses ~nothing while letting noise
    tiles skip the selection passes entirely."""
    import math

    ct = min(max(candidate_threshold / n, 0.0), 1.0)
    theta = math.acos(ct)
    p = theta / math.pi
    mean_sim = bits * (1.0 - 2.0 * p)
    sigma = 2.0 * math.sqrt(bits * p * (1.0 - p))
    return max(int(mean_sim - sigmas * sigma), -bits)


def lsh_topk(
    q_emb: jax.Array,
    lsh: LSHIndex,
    s_emb_padded: jax.Array,
    k: int,
    dim: int,
    cfg: LSHConfig,
    *,
    interpret: bool = False,
    tile_q: int = 256,
    min_keep_sim: int = _SENT,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k: Hamming prefilter -> exact rerank."""
    nq = q_emb.shape[0]
    qp, _ = pad_rows(jnp.asarray(q_emb), tile_q)
    q_codes = encode(qp, lsh.projection)
    ns_pad = lsh.codes_t.shape[1]
    tile_s = next(t for t in (512, 1024, 2048) if ns_pad % t == 0)
    vals1, idx1 = hamming_topk_pallas(
        q_codes, lsh.codes_t, lsh.ns_valid, cfg.rerank, cfg.bits,
        tile_q=tile_q, tile_s=tile_s, interpret=interpret,
        min_keep_sim=min_keep_sim,
    )
    ok = vals1 > NEG_INF / 2
    vals, idx = rerank_exact(qp, s_emb_padded, idx1, ok, k, dim)
    return vals[:nq], idx[:nq]


def attach_lsh_prefilter(engine, cfg: LSHConfig, lsh: "LSHIndex" = None) -> None:
    """Swap a SearchEngine's candidate stage for the LSH pipeline.

    ``lsh`` may be a prebuilt (e.g. persisted — search/persist.py
    save_lsh/load_lsh) index; it must match the engine's script index
    and pad multiple, which is validated cheaply by shape.
    """
    from fandom_search_tpu.data.shingler import embed_shingles

    if engine.cfg.search.k > cfg.rerank:
        raise ValueError(
            f"k ({engine.cfg.search.k}) cannot exceed the LSH rerank "
            f"width ({cfg.rerank}): stage 2 re-scores only rerank "
            f"candidates per query — raise rerank or lower --k"
        )

    if lsh is not None:
        ns_pad = _round_up_pad(
            engine.index.num_shingles, engine.cfg.search.script_pad_multiple
        )
        if (
            int(lsh.ns_valid) != engine.index.num_shingles
            or lsh.codes_t.shape != (cfg.bits // 32, ns_pad)
        ):
            raise ValueError(
                "persisted LSH index does not match the script index "
                f"(codes {tuple(lsh.codes_t.shape)}, ns_valid {lsh.ns_valid} "
                f"vs expected ({cfg.bits // 32}, {ns_pad}), "
                f"{engine.index.num_shingles}) — rebuild with "
                "`fandomsearch index --lsh`"
            )
        lsh = LSHIndex(
            projection=jax.device_put(jnp.asarray(lsh.projection)),
            codes_t=jax.device_put(jnp.asarray(lsh.codes_t)),
            ns_valid=int(lsh.ns_valid),
        )
    else:
        lsh = LSHIndex.build(
            engine.index.embeddings, cfg, engine.cfg.shingle,
            pad_multiple=engine.cfg.search.script_pad_multiple,
        )
    engine.lsh = lsh
    scfg = engine.cfg.shingle
    xcfg = engine.cfg.search
    # stage 1 is always the Pallas Hamming kernel; on a CPU backend it
    # must run in interpret mode regardless of the engine's flags
    interpret = engine.interpret or jax.devices()[0].platform == "cpu"
    s_emb_padded = engine._s_emb_padded

    ns_true = engine.index.num_shingles

    # the engine only keeps candidates >= candidate_threshold: gate the
    # Hamming kernel on the equivalent similarity floor (6-sigma slack)
    keep_sim = coarse_sim_threshold(
        xcfg.candidate_threshold, scfg.n, cfg.bits
    )

    @functools.partial(jax.jit, static_argnames=("max_out",))
    def candidates(stream, s_emb, ns_valid, mults, *, max_out):
        from fandom_search_tpu.search.engine import compact_candidates

        q_emb = embed_shingles(stream, scfg, mults=mults)
        vals, idx = lsh_topk(
            q_emb, lsh, s_emb, xcfg.k, scfg.dim, cfg, interpret=interpret,
            min_keep_sim=keep_sim,
        )
        return compact_candidates(
            vals, idx, xcfg.candidate_threshold, ns_true,
            xcfg.k, max_out,
        )

    # keep the engine call signature (stream, s_emb, ns_valid, mults);
    # the prefilter replaces the candidate stage, so the engine drops
    # back to the two-stage batch flow
    engine._use_fused = False
    engine._candidates_fn = (
        lambda stream, s_emb, ns_valid, mults, max_out: candidates(
            stream, s_emb_padded, ns_valid, mults, max_out=max_out
        )
    )
