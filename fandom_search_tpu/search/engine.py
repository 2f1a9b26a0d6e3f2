"""The TPU search engine — reference `search` subcommand, device-first.

Where the reference fans a process pool over fanwork files and walks a
BallTree per shingle (SURVEY.md section 4.2), this engine:

  1. concatenates a *batch* of fanworks into one fixed-size token
     stream (static shapes; per-work offsets kept on host),
  2. embeds every stream position on device (data/shingler.py),
  3. runs the fused distance+top-k Pallas kernel against the
     HBM-resident script embeddings (ops/distance_topk.py),
  4. gathers verification windows on device and scores them with the
     wavefront Smith-Waterman kernel (ops/smith_waterman.py),
  5. chains surviving hits into spans on host (search/chain.py — the
     same code path the oracle uses, so outputs are comparable).

Shapes are bucketed so JIT compiles once per bucket, not per work
(SURVEY.md section 8 "Raggedness").
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fandom_search_tpu.config import PipelineConfig
from fandom_search_tpu.data.hashing import derive_salts
from fandom_search_tpu.data.shingler import embed_shingles
from fandom_search_tpu.ops.embed import embed_shingles_pallas
from fandom_search_tpu.data.tokenizer import Tokenized
from fandom_search_tpu.data.fast_tokenizer import tokenize_many
from fandom_search_tpu.ops.distance_topk import NEG_INF, pad_rows, topk_dot_jnp, topk_dot_pallas
from fandom_search_tpu.ops.smith_waterman import sw_normalized_jnp, sw_normalized_pallas
from fandom_search_tpu.search.chain import chain_hits
from fandom_search_tpu.search.common import line_segment
from fandom_search_tpu.search.index import ScriptIndex
from fandom_search_tpu.search.types import CandidateHit, MatchRow

log = logging.getLogger(__name__)


@dataclass
class EngineStats:
    num_works: int = 0
    num_query_shingles: int = 0
    num_candidates: int = 0
    num_verified: int = 0
    num_batches: int = 0
    seconds_device_topk: float = 0.0
    seconds_device_verify: float = 0.0
    seconds_host: float = 0.0
    extra: Dict[str, float] = field(default_factory=dict)

    @property
    def shingle_pairs(self) -> int:
        """Query-shingle x script-shingle pairs scored (the BASELINE metric)."""
        return self.num_query_shingles * int(self.extra.get("ns", 0))


def _next_pow2(n: int, floor: int) -> int:
    v = floor
    while v < n:
        v *= 2
    return v


class SearchEngine:
    """Index once, search many fanwork batches."""

    def __init__(
        self,
        index: ScriptIndex,
        cfg: PipelineConfig,
        *,
        use_pallas: bool = True,
        interpret: bool = False,
    ):
        self.index = index
        self.cfg = cfg
        self.use_pallas = use_pallas
        self.interpret = interpret
        scfg, xcfg = cfg.shingle, cfg.search

        self._salts = jnp.asarray(derive_salts(scfg.seed, scfg.n, scfg.sign_rounds))
        s_emb = jnp.asarray(index.embeddings)
        self._s_emb_padded, self._ns_valid = pad_rows(
            s_emb, xcfg.script_pad_multiple
        )
        self._s_emb_padded = jax.device_put(self._s_emb_padded)
        # script token stream for line-side verify segments (padded so
        # the clip-gather always has one valid element)
        stream = index.stream_hashes
        if stream.shape[0] == 0:
            stream = np.zeros((1,), dtype=np.uint32)
        self._script_stream = jax.device_put(jnp.asarray(stream))

        # Candidate budget grows (pow2) whenever a batch overflows, so
        # no candidate is ever dropped; the budget is sticky across
        # batches to amortize the recompile.
        self._cand_budget = xcfg.max_candidates_per_batch

        self._candidates_fn = functools.partial(
            _candidates_jit,
            k=xcfg.k,
            dim=scfg.dim,
            shingle_cfg=scfg,
            use_pallas=use_pallas,
            interpret=interpret,
            threshold=xcfg.candidate_threshold,
        )
        self._verify_fn = functools.partial(
            _verify_jit,
            window=xcfg.window_tokens,
            max_lt=xcfg.max_line_tokens,
            search_cfg=xcfg,
            use_pallas=use_pallas,
            interpret=interpret,
        )

    # -- batching ----------------------------------------------------------

    def _batches(
        self, tokenized: Dict[str, Tokenized]
    ) -> Iterable[Tuple[List[str], np.ndarray, List[Tuple[str, int, int]]]]:
        """Pack works into fixed-size token streams.

        Yields (work_ids, stream uint32 [T_pad], spans) where spans is
        [(work_id, stream_offset, num_tokens)].
        """
        cap = self.cfg.search.batch_queries
        n = self.cfg.shingle.n
        t_pad = cap + n - 1

        cur: List[Tuple[str, Tokenized]] = []
        cur_len = 0
        for wid in sorted(tokenized):
            tk = tokenized[wid]
            need = len(tk)
            if need == 0:
                continue
            if need > cap:
                # Pathological work: split into overlapping chunks.
                # Overlap window_tokens-1 (not just n-1) so every
                # shingle sees its FULL verification window inside at
                # least one chunk — chunk starts are cap-ov apart and
                # each chunk fully covers windows starting in its first
                # cap-w+1 positions, so ov >= w-1 guarantees coverage.
                # Duplicated hits in the overlap dedup later by
                # (work, fan_pos, line) keeping the max verify score.
                ov = min(
                    max(n - 1, self.cfg.search.window_tokens - 1), cap - 1
                )
                pos = 0
                while pos < need:
                    end = min(need, pos + cap)
                    piece = Tokenized(
                        text=tk.text,
                        offsets=tk.offsets[pos:end],
                        hashes=tk.hashes[pos:end],
                    )
                    yield from self._flush([(f"{wid}\x00{pos}", piece)], t_pad)
                    if end == need:
                        break
                    pos = end - ov
                continue
            if cur_len + need > cap and cur:
                yield from self._flush(cur, t_pad)
                cur, cur_len = [], 0
            cur.append((wid, tk))
            cur_len += need
        if cur:
            yield from self._flush(cur, t_pad)

    @staticmethod
    def _flush(items, t_pad):
        stream = np.zeros((t_pad,), dtype=np.uint32)
        spans = []
        off = 0
        for wid, tk in items:
            m = len(tk)
            stream[off : off + m] = tk.hashes
            spans.append((wid, off, m))
            off += m
        yield [w for w, _, _ in spans], stream, spans

    # -- search ------------------------------------------------------------

    def search_works(
        self,
        works: Dict[str, str] | Dict[str, Tokenized],
    ) -> Tuple[List[MatchRow], EngineStats]:
        stats = EngineStats()
        scfg, xcfg = self.cfg.shingle, self.cfg.search
        t0 = time.perf_counter()
        raw = {w: t for w, t in works.items() if not isinstance(t, Tokenized)}
        tokenized: Dict[str, Tokenized] = {
            wid: t for wid, t in works.items() if isinstance(t, Tokenized)
        }
        if raw:
            tokenized.update(tokenize_many(raw))  # native C++ when available
        stats.num_works = len(tokenized)
        stats.extra["ns"] = float(self.index.num_shingles)
        stats.seconds_host += time.perf_counter() - t0
        if self.index.num_shingles == 0:
            return [], stats

        # Pipelined execution: submit batch N+1's candidate kernel BEFORE
        # syncing batch N's results, so the device runs ahead while the
        # host dedups/preps the previous batch (jax dispatch is async;
        # the device executes in order).  One batch of lookahead keeps
        # at most two streams + compacted outputs in flight.
        all_hits: List[CandidateHit] = []
        pending: List[Tuple] = []
        for wids, stream, spans in self._batches(tokenized):
            stats.num_batches += 1
            t0 = time.perf_counter()
            stream_dev = jnp.asarray(stream)
            out = self._candidates_fn(
                stream_dev, self._s_emb_padded, self._ns_valid, self._salts,
                max_out=self._cand_budget,
            )
            stats.seconds_device_topk += time.perf_counter() - t0
            pending.append((stream_dev, spans, self._cand_budget, out))
            if len(pending) == 2:
                all_hits.extend(self._process_batch(*pending.pop(0), stats))
        while pending:
            all_hits.extend(self._process_batch(*pending.pop(0), stats))

        t0 = time.perf_counter()
        # Split-work chunk ids ("wid\x00offset") fold back to the work.
        folded: List[CandidateHit] = []
        for h in all_hits:
            if "\x00" in h.work_id:
                wid, off = h.work_id.split("\x00")
                folded.append(
                    CandidateHit(wid, h.fan_pos + int(off), h.line_no,
                                 h.score, h.verify_score)
                )
            else:
                folded.append(h)
        # Dedup (overlapping chunks can verify the same hit twice).
        uniq: Dict[Tuple[str, int, int], CandidateHit] = {}
        for h in folded:
            key = (h.work_id, h.fan_pos, h.line_no)
            if key not in uniq or h.verify_score > uniq[key].verify_score:
                uniq[key] = h
        rows = chain_hits(list(uniq.values()), tokenized, self.index, scfg, xcfg)
        stats.seconds_host += time.perf_counter() - t0
        return rows, stats

    def _process_batch(
        self,
        stream_dev,
        spans: Sequence[Tuple[str, int, int]],
        budget: int,
        out: Tuple,
        stats: EngineStats,
    ) -> List[CandidateHit]:
        scfg, xcfg = self.cfg.shingle, self.cfg.search

        t0 = time.perf_counter()
        qpos_d, sidx_d, score_d, count_d = out
        while True:
            # only the compacted candidate triples cross device->host
            count = int(np.asarray(count_d))
            if count <= budget:
                break
            # Overflow: rerun the batch with a bigger (pow2) budget so
            # nothing is dropped.  The budget is sticky, so a quote-
            # dense corpus pays the recompile once, not per batch.
            budget = _next_pow2(count, budget * 2)
            log.info(
                "candidate budget exceeded (%d); retrying batch with "
                "budget %d", count, budget,
            )
            self._cand_budget = max(self._cand_budget, budget)
            qpos_d, sidx_d, score_d, count_d = self._candidates_fn(
                stream_dev, self._s_emb_padded, self._ns_valid, self._salts,
                max_out=budget,
            )
        n_kept = count
        # Device->host transfers ride a ~10ms-latency / ~30MB/s tunnel
        # here: slice the compacted outputs to a pow2 bucket of the
        # true count before pulling (24KB instead of 768KB per batch).
        pull = min(budget, _next_pow2(max(n_kept, 1), 2048))
        qpos = np.asarray(qpos_d[:pull])[:n_kept].astype(np.int64)
        sidx = np.asarray(sidx_d[:pull])[:n_kept]
        score = np.asarray(score_d[:pull])[:n_kept]
        stats.seconds_device_topk += time.perf_counter() - t0

        t0 = time.perf_counter()

        starts = np.array([off for _, off, _ in spans], dtype=np.int64)
        lens = np.array([m for _, _, m in spans], dtype=np.int64)
        wids = [w for w, _, _ in spans]
        for _, off, m in spans:
            stats.num_query_shingles += max(0, m - scfg.n + 1)

        if n_kept == 0:
            stats.seconds_host += time.perf_counter() - t0
            return []
        # Valid query positions: inside one work's token range. Fully
        # vectorized dedup of (work, fan_pos, line) keeping the max score.
        span_of = np.searchsorted(starts, qpos, side="right") - 1
        ok = (span_of >= 0) & (qpos <= starts[span_of] + lens[span_of] - scfg.n)
        qpos, sidx, score, span_of = qpos[ok], sidx[ok], score[ok], span_of[ok]
        if len(qpos) == 0:
            stats.seconds_host += time.perf_counter() - t0
            return []

        local_pos = (qpos - starts[span_of]).astype(np.int64)
        line = self.index.shingle_line[sidx].astype(np.int64)
        # dedup on (span, pos, line) keeping max score: sort by key then
        # score descending, keep first of each key group (stable, so
        # score ties keep the earliest flat candidate — same winner as
        # the oracle's strictly-greater rule)
        order = np.lexsort((-score, line, local_pos, span_of))
        sp_s, pos_s, ln_s, sc_s, si_s = (
            span_of[order], local_pos[order], line[order], score[order],
            sidx[order],
        )
        first = np.ones(len(sp_s), dtype=bool)
        first[1:] = (
            (sp_s[1:] != sp_s[:-1])
            | (pos_s[1:] != pos_s[:-1])
            | (ln_s[1:] != ln_s[:-1])
        )
        sp_u, pos_u, ln_u, sc_u, si_u = (
            sp_s[first], pos_s[first], ln_s[first], sc_s[first], si_s[first]
        )
        ncand = len(sp_u)
        stats.num_candidates += ncand
        stats.seconds_host += time.perf_counter() - t0

        # ---- verification batch (device) --------------------------------
        t0 = time.perf_counter()
        w = xcfg.window_tokens
        lead = (w - scfg.n) // 2
        span_lens = lens[sp_u]
        a0 = np.minimum(
            np.maximum(0, pos_u - lead), np.maximum(0, span_lens - w)
        )
        a1 = np.minimum(span_lens, a0 + w)
        starts_a = (starts[sp_u] + a0).astype(np.int32)
        len_a = (a1 - a0).astype(np.int32)

        # line-side segment anchored at the matched script shingle
        # (full coverage of arbitrarily long lines; common.line_segment)
        anchor = self.index.shingle_anchor[si_u]
        llen = self.index.line_lengths[ln_u]
        b0, len_b = line_segment(anchor, llen, scfg, xcfg)
        starts_b = (self.index.line_start[ln_u] + b0).astype(np.int32)
        len_b = len_b.astype(np.int32)

        # Bucket floor 2048 on real devices: one steady compile variant
        # (a 2048-pair SW call is ~6ms) instead of one per pow2 size;
        # small floor in interpret mode where big buckets are slow.
        floor = 2048 if (self.use_pallas and not self.interpret) else 256
        bucket = _next_pow2(ncand, floor)
        # one packed upload (4 x latency -> 1 x latency on the tunnel)
        packed = np.zeros((4, bucket), dtype=np.int32)
        packed[0, :ncand] = starts_a
        packed[1, :ncand] = len_a
        packed[2, :ncand] = starts_b
        packed[3, :ncand] = len_b
        scores = self._verify_fn(
            stream_dev, jnp.asarray(packed), self._script_stream
        )
        scores = np.asarray(jax.block_until_ready(scores))[:ncand]
        stats.seconds_device_verify += time.perf_counter() - t0

        t0 = time.perf_counter()
        keep = np.nonzero(scores >= xcfg.verify_threshold)[0]
        hits = [
            CandidateHit(
                wids[sp_u[i]], int(pos_u[i]), int(ln_u[i]),
                float(sc_u[i]), float(scores[i]),
            )
            for i in keep
        ]
        stats.num_verified += len(hits)
        stats.seconds_host += time.perf_counter() - t0
        return hits


# ---------------------------------------------------------------------------
# jitted device functions (module-level so the cache is shared)
# ---------------------------------------------------------------------------


def compact_candidates(vals, idx, threshold, ns, k: int, max_out: int):
    """Threshold-compact the [NQ, k] top-k ON DEVICE.

    Only candidate hits cross the device->host boundary: returns
    (qpos i32 [max_out] with -1 padding, script_idx i32, score f32,
    true_count).  true_count can exceed max_out — the engine detects
    that and reruns the batch with a doubled (pow2) budget, so no
    candidate is ever dropped.
    """
    ok = jnp.logical_and(vals >= threshold, idx < ns)     # [NQ, k]
    flat = ok.ravel()
    (pos,) = jnp.nonzero(flat, size=max_out, fill_value=-1)
    safe = jnp.maximum(pos, 0)
    qpos = (safe // k).astype(jnp.int32)
    score = vals.ravel()[safe]
    sidx = idx.ravel()[safe]
    valid = pos >= 0
    return (
        jnp.where(valid, qpos, -1),
        jnp.where(valid, sidx, 0),
        score,
        jnp.sum(flat.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "dim", "shingle_cfg", "use_pallas", "interpret",
        "threshold", "max_out",
    ),
)
def _candidates_jit(stream, s_emb_padded, ns_valid, salts, *, k, dim,
                    shingle_cfg, use_pallas, interpret, threshold, max_out):
    if use_pallas:
        # single-pass fused embedding (ops/embed.py)
        q_emb = embed_shingles_pallas(
            stream, shingle_cfg, salts=salts, interpret=interpret
        )
        qp, _ = pad_rows(q_emb, 128)
        # min_keep = the compaction threshold: sub-threshold rows skip
        # the top-k merge entirely (the engine never reads them)
        vals, idx = topk_dot_pallas(
            qp, s_emb_padded, ns_valid, k, dim, interpret=interpret,
            min_keep=threshold,
        )
        vals, idx = vals[: q_emb.shape[0]], idx[: q_emb.shape[0]]
    else:
        # jnp path: mask padded script rows via a validity column
        q_emb = embed_shingles(stream, shingle_cfg, salts=salts)
        scores = jax.lax.dot_general(
            q_emb.astype(jnp.bfloat16),
            s_emb_padded.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = jnp.arange(s_emb_padded.shape[0], dtype=jnp.int32)[None, :]
        scores = jnp.where(col < ns_valid, scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, k)
        vals, idx = vals / dim, idx.astype(jnp.int32)
    return compact_candidates(vals, idx, threshold, ns_valid, k, max_out)


@functools.partial(
    jax.jit,
    static_argnames=("window", "max_lt", "search_cfg", "use_pallas",
                     "interpret"),
)
def _verify_jit(stream, packed, script_stream,
                *, window, max_lt, search_cfg, use_pallas, interpret):
    # packed int32 [4, C]: starts_a, len_a, starts_b, len_b (one upload)
    starts_a, len_a, starts_b, len_b = (
        packed[0], packed[1], packed[2], packed[3]
    )
    offs = jnp.arange(window, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(starts_a[:, None] + offs, 0, stream.shape[0] - 1)
    a = jnp.take(stream, gather_idx)                      # [C, window]
    offs_b = jnp.arange(max_lt, dtype=jnp.int32)[None, :]
    gather_b = jnp.clip(
        starts_b[:, None] + offs_b, 0, script_stream.shape[0] - 1
    )
    b = jnp.take(script_stream, gather_b)                 # [C, max_lt]
    if use_pallas:
        return sw_normalized_pallas(
            a, b, len_a, len_b, search_cfg, interpret=interpret
        )
    return sw_normalized_jnp(a, b, len_a, len_b, search_cfg)
