"""Span chaining — merge verified shingle hits into maximal match spans.

Reference behavior (SURVEY.md section 3 "Chainer"; BASELINE.json:5 "candidate
chaining"): overlapping/adjacent verified hits against the same script
line merge into one contiguous match span.  Chaining is a linear pass
over a few surviving hits per work, so it stays host-side (the heavy
lifting — candidate gen + verification — already happened on device).
Both the CPU oracle and the TPU engine call THIS function, so their
outputs are comparable row-for-row.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from fandom_search_tpu.config import SearchConfig, ShingleConfig
from fandom_search_tpu.data.tokenizer import Tokenized
from fandom_search_tpu.search.index import ScriptIndex
from fandom_search_tpu.search.types import CandidateHit, MatchRow


def chain_hits(
    hits: Sequence[CandidateHit],
    fan_tokenized: Dict[str, Tokenized],
    index: ScriptIndex,
    shingle_cfg: ShingleConfig,
    search_cfg: SearchConfig,
) -> List[MatchRow]:
    """Merge hits into spans, grouped by (work, script line)."""
    grouped: Dict[Tuple[str, int], List[CandidateHit]] = defaultdict(list)
    for h in hits:
        grouped[(h.work_id, h.line_no)].append(h)

    rows: List[MatchRow] = []
    for (work_id, line_no), group in grouped.items():
        group.sort(key=lambda h: h.fan_pos)
        tk = fan_tokenized[work_id]
        start = group[0].fan_pos
        prev = group[0].fan_pos
        best_score = group[0].score
        best_verify = group[0].verify_score
        count = 1
        for h in group[1:]:
            if h.fan_pos - prev <= search_cfg.chain_gap:
                prev = h.fan_pos
                best_score = max(best_score, h.score)
                best_verify = max(best_verify, h.verify_score)
                count += 1
            else:
                rows.append(
                    _emit(work_id, start, prev, best_score, best_verify, count,
                          tk, index, line_no, shingle_cfg)
                )
                start = prev = h.fan_pos
                best_score, best_verify, count = h.score, h.verify_score, 1
        rows.append(
            _emit(work_id, start, prev, best_score, best_verify, count,
                  tk, index, line_no, shingle_cfg)
        )
    rows.sort(key=lambda r: (r.work_id, r.fan_token_start, r.line_no))
    return rows


def chain_hits_arrays(
    work_idx: np.ndarray,      # int64 [H] — index into work_ids
    fan_pos: np.ndarray,       # int64 [H]
    line_no: np.ndarray,       # int64 [H]
    score: np.ndarray,         # f32 [H]
    verify: np.ndarray,        # f32 [H]
    work_ids: Sequence[str],
    fan_tokenized: Dict[str, Tokenized],
    index: ScriptIndex,
    shingle_cfg: ShingleConfig,
    search_cfg: SearchConfig,
) -> List[MatchRow]:
    """Vectorized chain_hits over hit ARRAYS (the engine's hot path).

    Semantics identical to chain_hits on the equivalent CandidateHit
    list: group by (work, line), sort by fan_pos, merge runs whose
    consecutive gaps are <= chain_gap, emit one row per run with the
    run's max score / max verify / hit count.  (work, fan_pos, line)
    triples must be unique — the engine dedups before chaining.  The
    per-hit Python loop this replaces measured ~1s per 250k hits at the
    10k-works benchmark; reduceat makes it ~milliseconds.
    """
    if len(work_idx) == 0:
        return []
    order = np.lexsort((fan_pos, line_no, work_idx))
    wx, fp, ln = work_idx[order], fan_pos[order], line_no[order]
    sc, vs = score[order], verify[order]
    new = np.ones(len(wx), dtype=bool)
    new[1:] = (
        (wx[1:] != wx[:-1])
        | (ln[1:] != ln[:-1])
        | ((fp[1:] - fp[:-1]) > search_cfg.chain_gap)
    )
    seg = np.nonzero(new)[0]
    seg_end = np.r_[seg[1:], len(wx)]
    best_sc = np.maximum.reduceat(sc, seg)
    best_vs = np.maximum.reduceat(vs, seg)
    rows = [
        _emit(
            work_ids[wx[s]], int(fp[s]), int(fp[e - 1]),
            float(best_sc[j]), float(best_vs[j]), int(e - s),
            fan_tokenized[work_ids[wx[s]]], index, int(ln[s]), shingle_cfg,
        )
        for j, (s, e) in enumerate(zip(seg, seg_end))
    ]
    rows.sort(key=lambda r: (r.work_id, r.fan_token_start, r.line_no))
    return rows


def _emit(
    work_id: str,
    tok_start: int,
    last_pos: int,
    score: float,
    verify: float,
    count: int,
    tk: Tokenized,
    index: ScriptIndex,
    line_no: int,
    shingle_cfg: ShingleConfig,
) -> MatchRow:
    tok_end = min(last_pos + shingle_cfg.n, len(tk))
    char_start = int(tk.offsets[tok_start, 0]) if len(tk) else 0
    char_end = int(tk.offsets[tok_end - 1, 1]) if tok_end > tok_start else char_start
    return MatchRow(
        work_id=work_id,
        fan_token_start=tok_start,
        fan_token_end=tok_end,
        fan_char_start=char_start,
        fan_char_end=char_end,
        fan_text=tk.span_text(tok_start, tok_end),
        line_no=line_no,
        speaker=index.speaker(line_no),
        script_text=index.line_text(line_no),
        score=round(float(score), 4),
        verify_score=round(float(verify), 4),
        num_shingles=count,
        script=index.script_of(line_no),
    )
