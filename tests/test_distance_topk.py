import numpy as np
import pytest

from fandom_search_tpu.ops.distance_topk import topk_dot, topk_dot_jnp
from fandom_search_tpu.search.oracle import topk_scores_np

K, DIM = 10, 128


def _rand_emb(rng, n):
    return rng.integers(-6, 7, size=(n, DIM)).astype(np.int8)


def _check_against_oracle(vals, idx, q, s):
    """vals must equal oracle vals exactly; idx must be score-consistent."""
    ovals, _ = topk_scores_np(q, s, K, DIM)
    np.testing.assert_allclose(np.asarray(vals), ovals, atol=1e-6)
    full = q.astype(np.int32) @ s.astype(np.int32).T / DIM
    picked = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(picked, np.asarray(vals), atol=1e-6)


def test_jnp_matches_oracle(rng):
    q, s = _rand_emb(rng, 100), _rand_emb(rng, 300)
    vals, idx = topk_dot_jnp(q, s, K, DIM)
    _check_against_oracle(vals, idx, q, s)


def test_pallas_matches_oracle_aligned(rng):
    q, s = _rand_emb(rng, 512), _rand_emb(rng, 1024)
    vals, idx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    _check_against_oracle(vals, idx, q, s)


def test_pallas_matches_oracle_ragged(rng):
    # Unaligned sizes exercise padding + the ns_valid mask.
    q, s = _rand_emb(rng, 300), _rand_emb(rng, 777)
    vals, idx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    assert vals.shape == (300, K)
    _check_against_oracle(vals, idx, q, s)


def test_pallas_multi_s_tile_merge(rng):
    # >2 script tiles so the running merge really accumulates.
    q, s = _rand_emb(rng, 256), _rand_emb(rng, 2048 + 100)
    vals, idx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    _check_against_oracle(vals, idx, q, s)


def test_pallas_q_transposed_matches_row_major(rng):
    """Lane-major q ([D, NQ]) returns identical (vals, idx)."""
    import jax.numpy as jnp

    from fandom_search_tpu.ops.distance_topk import pad_rows, topk_dot_pallas

    q, s = _rand_emb(rng, 256), _rand_emb(rng, 1500)
    s_pad, ns = pad_rows(jnp.asarray(s), 2048)
    v1, i1 = topk_dot_pallas(
        jnp.asarray(q), s_pad, ns, K, DIM, interpret=True
    )
    v2, i2 = topk_dot_pallas(
        jnp.asarray(q.T.copy()), s_pad, ns, K, DIM, interpret=True,
        q_transposed=True,
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("dim2", [256, 512, 2048])
def test_wide_dim_adapts_col_bits_or_falls_back_exact(rng, dim2):
    """Wide embeddings produce |score| past the 17-column-bit packing
    budget.  Round 4 (VERDICT r3 #6): the packed kernel now trades
    column bits for score bits (dim=256 -> 16 bits, 512 -> 15), so
    these run the FAST kernel; dim=2048 (|score| 73728 > the 14-bit
    budget 65535) still takes the exact unpacked fallback.  All must
    return exact results (regression: the packed kernel silently
    corrupted top-k above the budget)."""
    q = rng.integers(-6, 7, size=(128, dim2)).astype(np.int8)
    s = rng.integers(-6, 7, size=(64, dim2)).astype(np.int8)
    # a strong planted match: dot = 36*dim, past the 17-bit budget
    s[5] = q[0] = np.full(dim2, 6, np.int8)
    vals, idx = topk_dot(
        q, s, K, dim2, use_pallas=True, interpret=True,
        max_abs_score=6 * 6 * dim2,
    )
    full = q.astype(np.int32) @ s.astype(np.int32).T / dim2
    want = np.sort(full, axis=1)[:, ::-1][:, :K]
    np.testing.assert_allclose(np.asarray(vals), want, atol=1e-6)
    assert int(np.asarray(idx)[0, 0]) == 5


def test_pallas_duplicate_rows_ties(rng):
    # Duplicate script shingles -> exact score ties; vals must still match.
    s_half = _rand_emb(rng, 256)
    s = np.concatenate([s_half, s_half], axis=0)
    q = s_half[:64]
    vals, idx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    _check_against_oracle(vals, idx, q, s)
    # self-match must be in the top-k of each query (huge self-dot)
    self_scores = (q.astype(np.int32) * q.astype(np.int32)).sum(1) / DIM
    assert np.allclose(np.asarray(vals)[:, 0], self_scores)


def test_empty_inputs():
    q = np.zeros((0, DIM), dtype=np.int8)
    s = np.zeros((5, DIM), dtype=np.int8)
    vals, idx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    assert vals.shape == (0, K) and idx.shape == (0, K)


def test_oracle_boundary_ties_lowest_index(rng):
    # >k exactly-tied scores at the k-th boundary: the oracle must pick
    # the LOWEST indices, matching lax.top_k and the Pallas merge rule
    # (argpartition alone picks an arbitrary tied subset).
    base = rng.integers(-3, 4, size=(5, DIM)).astype(np.int8)
    s = base[rng.integers(0, 5, size=300)]
    q = base[rng.integers(0, 5, size=64)]
    ovals, oidx = topk_scores_np(q, s, K, DIM)
    jvals, jidx = topk_dot_jnp(q, s, K, DIM)
    np.testing.assert_allclose(ovals, np.asarray(jvals), atol=1e-6)
    np.testing.assert_array_equal(oidx, np.asarray(jidx))
    pvals, pidx = topk_dot(q, s, K, DIM, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(oidx, np.asarray(pidx))


def test_min_keep_gating_exact_above_threshold(rng):
    # With min_keep set, entries >= min_keep must be exactly the
    # oracle's (sub-threshold rows may return padding).
    thr = 3.5
    q, s = _rand_emb(rng, 300), _rand_emb(rng, 3000)
    # plant strong matches for some queries so gating has both regimes
    s[100:150] = q[:50]
    vals, idx = topk_dot(
        q, s, K, DIM, use_pallas=True, interpret=True, min_keep=thr
    )
    ovals, oidx = topk_scores_np(q, s, K, DIM)
    g, o = np.asarray(vals), ovals
    keep = o >= thr
    np.testing.assert_allclose(g[keep], o[keep], atol=1e-6)
    gi = np.asarray(idx)
    np.testing.assert_array_equal(gi[keep], oidx[keep])
    # padding never fabricates an above-threshold score
    fake = (g >= thr) & ~keep
    assert not fake.any()


def test_column_chunking_beyond_pack_range(rng, monkeypatch):
    # Scripts wider than 2^COL_BITS shingles process in column chunks
    # with a cross-chunk lax.top_k merge.  Exercise the chunk logic with
    # shrunken constants (8 column bits -> 256-column chunks).
    import fandom_search_tpu.ops.distance_topk as D

    monkeypatch.setattr(D, "_COL_BITS", 8)  # _col_bits_for reads it live
    q, s = _rand_emb(rng, 64), _rand_emb(rng, 700)  # 3 chunks of <=256
    vals, idx = D.topk_dot_pallas(
        jnp_pad(q, 128), jnp_pad(s, 128), s.shape[0], K, DIM,
        tile_q=64, tile_s=128, interpret=True,
    )
    vals, idx = vals[: q.shape[0]], idx[: q.shape[0]]
    _check_against_oracle(vals, idx, q, s)


def jnp_pad(x, mult):
    import jax.numpy as jnp
    from fandom_search_tpu.ops.distance_topk import pad_rows

    p, _ = pad_rows(jnp.asarray(x), mult)
    return p


def test_insert_merge_equals_rebuild_merge(rng):
    """The round-2 insert merge must reproduce the round-1 rebuild merge
    bit-for-bit, in exact mode and in min_keep (engine) mode, including
    adversarial rows with many tied/above-threshold entries."""
    from fandom_search_tpu.config import ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import (
        pad_rows, topk_dot_pallas,
    )

    scfg = ShingleConfig()
    nq, ns = 512, 4096
    q_stream = rng.integers(0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32)
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    # dense plants: some rows get MANY above-threshold entries so the
    # insert loop must run all k iterations
    for qi in range(0, nq, 3):
        si = int(rng.integers(0, ns - 20))
        q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
    s_stream[100:130] = s_stream[100]  # repeated script region -> ties
    q_emb = embed_shingles_np(q_stream, scfg)
    s_emb = embed_shingles_np(s_stream, scfg)
    import jax.numpy as jnp

    sp, nsv = pad_rows(jnp.asarray(s_emb), 512)
    # exact mode: bit-identical
    vi, ii = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=-float("inf"), merge="insert",
    )
    vr, ir = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=-float("inf"), merge="rebuild",
    )
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(ir))
    # the round-3 fast-path insert must match its loop-only A/B control
    vl, il = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=-float("inf"), merge="insertloop",
    )
    np.testing.assert_array_equal(np.asarray(vl), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(il), np.asarray(ir))

    # min_keep (engine) mode: the contract only covers entries >= the
    # threshold (sub-threshold rows may legally return padding, and the
    # insert merge skips them more aggressively than rebuild did) — the
    # above-threshold (value, index) prefix must agree exactly
    mk = 3.5
    vi, ii = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=mk, merge="insert",
    )
    vr, ir = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=mk, merge="rebuild",
    )
    vi, ii, vr, ir = (np.asarray(x) for x in (vi, ii, vr, ir))
    keep_i, keep_r = vi >= mk, vr >= mk
    np.testing.assert_array_equal(keep_i, keep_r)
    np.testing.assert_array_equal(vi[keep_i], vr[keep_r])
    np.testing.assert_array_equal(ii[keep_i], ir[keep_r])
    assert keep_i.sum() > 100  # plants actually exercised this

    # static-dispatch boundary: min_keep_i == 1 takes the raw-score
    # fast path, min_keep_i == 0 the staged loop — both must agree
    # with rebuild on the above-threshold prefix
    for mk_b in (1.0 / DIM, 0.0):
        vb, ib = topk_dot_pallas(
            jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
            interpret=True, min_keep=mk_b, merge="insert",
        )
        vc, ic = topk_dot_pallas(
            jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
            interpret=True, min_keep=mk_b, merge="rebuild",
        )
        vb, ib, vc, ic = (np.asarray(x) for x in (vb, ib, vc, ic))
        kb, kc = vb >= mk_b, vc >= mk_b
        np.testing.assert_array_equal(kb, kc)
        np.testing.assert_array_equal(vb[kb], vc[kc])
        np.testing.assert_array_equal(ib[kb], ic[kc])


def test_gate_cols_subtile_gating_parity(rng):
    """Sub-tile column gating (gate_cols > 1) must reproduce the
    single-gate insert merge on the above-threshold prefix — same
    adversarial world as the merge-parity test (dense plants, tied
    script regions), plus a padded-edge corpus so each block's
    padded-column reasoning is exercised."""
    from fandom_search_tpu.config import ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import (
        pad_rows, topk_dot_pallas,
    )
    import jax.numpy as jnp

    scfg = ShingleConfig()
    nq, ns = 512, 3100  # ragged: padding lands inside the last tile
    q_stream = rng.integers(0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32)
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    for qi in range(0, nq, 3):
        si = int(rng.integers(0, ns - 20))
        q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
    s_stream[100:130] = s_stream[100]  # ties
    q_emb = embed_shingles_np(q_stream, scfg)
    s_emb = embed_shingles_np(s_stream, scfg)
    sp, nsv = pad_rows(jnp.asarray(s_emb), 1024)
    mk = 3.5
    v1, i1 = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=1024,
        interpret=True, min_keep=mk, merge="insert",
    )
    v1, i1 = np.asarray(v1), np.asarray(i1)
    k1 = v1 >= mk
    assert k1.sum() > 100
    qt = jnp.asarray(np.ascontiguousarray(q_emb.T))
    for gc in (2, 4, 8):
        vg, ig = topk_dot_pallas(
            jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=1024,
            interpret=True, min_keep=mk, merge="insert", gate_cols=gc,
        )
        vg, ig = np.asarray(vg), np.asarray(ig)
        kg = vg >= mk
        np.testing.assert_array_equal(kg, k1)
        np.testing.assert_array_equal(vg[kg], v1[k1])
        np.testing.assert_array_equal(ig[kg], i1[k1])
        # the engine's lane-major layout (q_transposed) must agree too
        vt, it = topk_dot_pallas(
            qt, sp, nsv, K, DIM, tile_s=1024, interpret=True,
            min_keep=mk, merge="insert", gate_cols=gc,
            q_transposed=True,
        )
        vt, it = np.asarray(vt), np.asarray(it)
        kt = vt >= mk
        np.testing.assert_array_equal(kt, k1)
        np.testing.assert_array_equal(vt[kt], v1[k1])
        np.testing.assert_array_equal(it[kt], i1[k1])


def test_gate_cols_validation():
    """gate_cols must divide tile_s into 128-multiple blocks."""
    import jax.numpy as jnp
    import pytest

    from fandom_search_tpu.ops.distance_topk import topk_dot_pallas

    q = jnp.zeros((128, DIM), jnp.int8)
    s = jnp.zeros((2048, DIM), jnp.int8)
    with pytest.raises(ValueError, match="gate_cols"):
        topk_dot_pallas(
            q, s, 2048, K, DIM, tile_s=2048, interpret=True,
            min_keep=3.5, gate_cols=3,
        )


def test_rows_merge_equals_insert_merge(rng):
    """The round-4 row-extraction merge (VERDICT r3 #5) must reproduce
    the insert merge's above-threshold prefix at every density: sparse
    (one entrant per firing tile — the one-hot fast path), dense
    (multi-entrant rows + more entrant rows than max_rows, forcing the
    staged-fallback branch), and with repeated script regions (packed
    tie-breaking through the per-row kill loop)."""
    from fandom_search_tpu.config import ShingleConfig
    from fandom_search_tpu.data.shingler import embed_shingles_np
    from fandom_search_tpu.ops.distance_topk import (
        pad_rows, topk_dot_pallas,
    )

    scfg = ShingleConfig()
    nq, ns = 512, 4096
    s_stream = rng.integers(0, 2**32, size=ns + scfg.n - 1, dtype=np.uint32)
    s_stream[100:130] = s_stream[100]  # repeated script region -> ties
    s_emb = embed_shingles_np(s_stream, scfg)
    import jax.numpy as jnp

    sp, nsv = pad_rows(jnp.asarray(s_emb), 512)
    for stride, mk in ((101, 3.5), (3, 3.5), (3, 1.0 / DIM)):
        q_stream = rng.integers(
            0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32
        )
        for qi in range(0, nq, stride):
            si = int(rng.integers(0, ns - 20))
            q_stream[qi : qi + scfg.n] = s_stream[si : si + scfg.n]
        q_emb = embed_shingles_np(q_stream, scfg)
        qt = jnp.asarray(np.ascontiguousarray(q_emb.T))
        vi, ii = topk_dot_pallas(
            qt, sp, nsv, K, DIM, tile_s=512, interpret=True,
            min_keep=mk, q_transposed=True, merge="insert",
        )
        vr, ir = topk_dot_pallas(
            qt, sp, nsv, K, DIM, tile_s=512, interpret=True,
            min_keep=mk, q_transposed=True, merge="rows",
        )
        vi, ii, vr, ir = (np.asarray(x) for x in (vi, ii, vr, ir))
        keep_i, keep_r = vi >= mk, vr >= mk
        np.testing.assert_array_equal(keep_i, keep_r)
        np.testing.assert_array_equal(vi[keep_i], vr[keep_r])
        np.testing.assert_array_equal(ii[keep_i], ir[keep_r])
        assert keep_i.sum() > (20 if stride > 50 else 50)

    # exact mode routes rows -> insertloop statically; must equal insert
    q_emb = embed_shingles_np(
        rng.integers(0, 2**32, size=nq + scfg.n - 1, dtype=np.uint32), scfg
    )
    vi, ii = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=-float("inf"), merge="insert",
    )
    vr, ir = topk_dot_pallas(
        jnp.asarray(q_emb), sp, nsv, K, DIM, tile_s=512,
        interpret=True, min_keep=-float("inf"), merge="rows",
    )
    np.testing.assert_array_equal(np.asarray(vi), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(ir))
