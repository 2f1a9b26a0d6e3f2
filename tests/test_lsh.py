import dataclasses

import numpy as np

from fandom_search_tpu.config import LSHConfig, PipelineConfig, ShingleConfig
from fandom_search_tpu.data.script_parser import parse_script
from fandom_search_tpu.ops.distance_topk import topk_dot_jnp
from fandom_search_tpu.ops.lsh import (
    LSHIndex,
    lsh_topk,
    make_projection,
    popcount32,
)
from fandom_search_tpu.data.shingler import embed_shingles_np
from fandom_search_tpu.search.engine import SearchEngine
from fandom_search_tpu.ops.lsh import attach_lsh_prefilter
from fandom_search_tpu.search.index import build_script_index
from fandom_search_tpu.utils.synthetic import (
    make_corpus_with_quotes,
    make_script,
    make_vocab,
)

K, DIM = 10, 128
SCFG = ShingleConfig()
LCFG = LSHConfig()


def test_popcount32_matches_python(rng):
    v = rng.integers(0, 2**32, size=1000, dtype=np.uint32)
    got = popcount32(v)
    want = np.array([bin(x).count("1") for x in v], dtype=np.uint32)
    assert np.array_equal(got, want)


def test_projection_deterministic():
    p1 = make_projection(LCFG, DIM)
    p2 = make_projection(LCFG, DIM)
    assert np.array_equal(p1, p2)
    assert set(np.unique(p1)) == {-1, 1}


def _embeddings_from_text(rng, num_tokens):
    t = rng.integers(0, 2**32, size=num_tokens, dtype=np.uint32)
    return embed_shingles_np(t, SCFG)


def test_lsh_recall_at_10(rng):
    """recall@10 vs the exact kernel must be >= 0.99 (BASELINE.md)."""
    s_emb = _embeddings_from_text(rng, 1540)
    q_emb = _embeddings_from_text(rng, 645)
    # plant near-duplicates so top-k has structure, not just noise
    q_emb[:256] = s_emb[1000:1256]

    lsh = LSHIndex.build(s_emb, LCFG, SCFG)
    from fandom_search_tpu.ops.distance_topk import pad_rows
    import jax.numpy as jnp

    s_pad, _ = pad_rows(jnp.asarray(s_emb), 512)
    vals, idx = lsh_topk(
        q_emb, lsh, s_pad, K, DIM, LCFG, interpret=True
    )
    evals, eidx = topk_dot_jnp(q_emb, s_emb, K, DIM)

    got = np.asarray(idx)
    want = np.asarray(eidx)
    wv = np.asarray(evals)
    recall = 0.0
    for i in range(got.shape[0]):
        # count by score (ties make index sets ambiguous)
        gv = np.asarray(vals)[i]
        recall += np.sum(np.isin(np.round(wv[i] * DIM), np.round(gv * DIM))) / K
    recall /= got.shape[0]
    assert recall >= 0.99, recall


def test_lsh_exact_match_always_survives(rng):
    s_emb = _embeddings_from_text(rng, 2000)
    q_emb = s_emb[500:600].copy()
    lsh = LSHIndex.build(s_emb, LCFG, SCFG)
    from fandom_search_tpu.ops.distance_topk import pad_rows
    import jax.numpy as jnp

    s_pad, _ = pad_rows(jnp.asarray(s_emb), 512)
    vals, idx = lsh_topk(q_emb, lsh, s_pad, K, DIM, LCFG, interpret=True)
    # identical codes -> hamming 0 -> always reranked; exact dot wins
    assert np.array_equal(np.asarray(idx)[:, 0], np.arange(500, 600))


def test_engine_with_lsh_matches_oracle_rows(rng):
    vocab = make_vocab(rng, 1000)
    script_text = make_script(rng, vocab, num_lines=18, words_per_line=(7, 12))
    lines = parse_script(script_text)
    cfg = PipelineConfig()
    index = build_script_index(lines, cfg.shingle, cfg.search)
    works, planted = make_corpus_with_quotes(
        rng, [ln.text for ln in lines], num_works=6, words_per_work=200,
        quotes_per_work=2, num_edits=0, vocab=vocab,
    )
    base = SearchEngine(index, cfg, use_pallas=False)
    rows_exact, _ = base.search_works(works)

    eng = SearchEngine(index, cfg, use_pallas=True, interpret=True)
    # smaller sketch in interpret mode: the unrolled 32-word popcount
    # loop is minutes-slow on the interpreter; 256 bits is plenty at
    # this corpus size and exercises the identical code path
    attach_lsh_prefilter(eng, dataclasses.replace(cfg.lsh, bits=256, rerank=128))
    rows_lsh, _ = eng.search_works(works)

    key = lambda r: (r.work_id, r.fan_token_start, r.fan_token_end, r.line_no)
    # LSH may miss borderline noise candidates but must find all planted
    found = {(r.work_id, r.line_no) for r in rows_lsh}
    assert all((p.work_id, p.line_no) in found for p in planted)
    # and at least 95% agreement with the exact engine overall
    a, b = {key(r) for r in rows_exact}, {key(r) for r in rows_lsh}
    assert len(a & b) >= 0.95 * len(a)


def test_gated_prefilter_keeps_thresholded_candidates(rng):
    # With the coarse similarity gate set from the candidate threshold,
    # every candidate the ENGINE would keep (exact score >= threshold)
    # must survive the prefilter.
    from fandom_search_tpu.ops.lsh import coarse_sim_threshold
    from fandom_search_tpu.ops.distance_topk import pad_rows, topk_dot_jnp
    import jax.numpy as jnp

    s_emb = _embeddings_from_text(rng, 1540)
    q_emb = _embeddings_from_text(rng, 645)
    q_emb[:200] = s_emb[700:900]  # exact matches (score 6.0)

    thr = 3.5
    keep_sim = coarse_sim_threshold(thr, SCFG.n, LCFG.bits)
    lsh = LSHIndex.build(s_emb, LCFG, SCFG)
    s_pad, _ = pad_rows(jnp.asarray(s_emb), 512)
    gvals, gidx = lsh_topk(
        q_emb, lsh, s_pad, K, DIM, LCFG, interpret=True,
        min_keep_sim=keep_sim,
    )
    evals, eidx = topk_dot_jnp(q_emb, s_emb, K, DIM)
    ev, gi = np.asarray(evals), np.asarray(gidx)
    ei, gv = np.asarray(eidx), np.asarray(gvals)
    missed = 0
    total = 0
    for i in range(ev.shape[0]):
        want = set(ei[i][ev[i] >= thr].tolist())
        got = set(gi[i][np.asarray(gv[i]) >= thr].tolist())
        total += len(want)
        missed += len(want - got)
    assert total > 0
    assert missed == 0, f"gated prefilter lost {missed}/{total} candidates"


def test_lsh_column_chunking_beyond_pack_range(rng, monkeypatch):
    # Indexes wider than 2^COL_BITS shingles must column-chunk, not
    # crash (the regime where a prefilter matters most).  Exercise the
    # chunk logic with shrunken constants: 9 column bits -> 512-col
    # chunks, ns_pad 1536 -> 3 chunks.
    import fandom_search_tpu.ops.lsh as L

    monkeypatch.setattr(L, "_COL_BITS", 9)
    monkeypatch.setattr(L, "_COL_MASK", (1 << 9) - 1)

    s_emb = _embeddings_from_text(rng, 1300)
    q_emb = _embeddings_from_text(rng, 200)
    q_emb[:64] = s_emb[600:664]
    from fandom_search_tpu.ops.distance_topk import pad_rows, topk_dot_jnp
    import jax.numpy as jnp

    lsh = LSHIndex.build(s_emb, LCFG, SCFG)
    assert lsh.codes_t.shape[1] > (1 << 9)  # chunking actually engaged
    s_pad, _ = pad_rows(jnp.asarray(s_emb), 512)
    vals, idx = lsh_topk(q_emb, lsh, s_pad, K, DIM, LCFG, interpret=True)
    evals, _ = topk_dot_jnp(q_emb, s_emb, K, DIM)
    # planted exact matches must rank first with full score
    np.testing.assert_allclose(
        np.asarray(vals)[:64, 0], np.asarray(evals)[:64, 0], atol=1e-6
    )
