"""Script-side index: tokenized lines, shingle stream, embeddings.

The reference builds a BallTree over the script's shingle matrix
(SURVEY.md section 2 layer L3).  Here the "index" is the raw material the
TPU kernels consume: an HBM-resident embedding matrix plus the
shingle -> script-line attribution table and per-line token matrices
for on-device verification.

Design choice vs the reference: the script is shingled as ONE token
stream (with a token -> line map) rather than per line, so lines
shorter than the shingle width still participate via shingles that
cross line boundaries; attribution uses the line of the shingle's
middle token.  Verification then checks the fan window against a
``max_line_tokens``-wide segment of the attributed line centered on the
matched shingle (search/common.py line_segment), which restores
per-line precision without truncating long lines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from fandom_search_tpu.config import SearchConfig, ShingleConfig
from fandom_search_tpu.data.script_parser import ScriptLine
from fandom_search_tpu.data.tokenizer import Tokenized, tokenize
from fandom_search_tpu.data.shingler import embed_shingles_np, shingle_hashes


@dataclass
class ScriptIndex:
    lines: List[ScriptLine]
    tokenized: List[Tokenized]          # per line
    stream_hashes: np.ndarray           # uint32[T] all line tokens, in order
    token_line: np.ndarray              # int32[T] line_no per stream token
    shingle_line: np.ndarray            # int32[NS] attributed line per shingle
    shingle_anchor: np.ndarray          # int32[NS] shingle start offset in line
    shingle_windows: np.ndarray         # uint32[NS, n] raw shingle word hashes
    embeddings: np.ndarray              # int8[NS, dim]
    line_start: np.ndarray              # int32[L] line offset in stream_hashes
    line_lengths: np.ndarray            # int32[L] TRUE token counts (unclipped)

    @property
    def num_shingles(self) -> int:
        return int(self.embeddings.shape[0])

    def line_text(self, line_no: int) -> str:
        return self.lines[line_no].text

    def speaker(self, line_no: int) -> str:
        return self.lines[line_no].speaker


def build_script_index(
    lines: Sequence[ScriptLine],
    shingle_cfg: ShingleConfig,
    search_cfg: SearchConfig,
) -> ScriptIndex:
    tokenized = [tokenize(ln.text) for ln in lines]
    hashes = [t.hashes for t in tokenized]
    stream = (
        np.concatenate(hashes)
        if hashes
        else np.zeros((0,), dtype=np.uint32)
    )
    token_line = np.concatenate(
        [np.full(len(t), ln.line_no, dtype=np.int32) for t, ln in zip(tokenized, lines)]
    ) if tokenized else np.zeros((0,), dtype=np.int32)

    windows = shingle_hashes(stream, shingle_cfg)          # [NS, n]
    emb = embed_shingles_np(stream, shingle_cfg)           # [NS, dim]
    ns = windows.shape[0]
    mid = shingle_cfg.n // 2
    shingle_line = (
        token_line[mid : mid + ns].astype(np.int32)
        if ns
        else np.zeros((0,), dtype=np.int32)
    )

    line_lengths = np.array([len(t) for t in tokenized], dtype=np.int32)
    line_start = np.zeros((len(lines),), dtype=np.int32)
    if len(lines):
        line_start[1:] = np.cumsum(line_lengths)[:-1]

    # Shingle start offset within its attributed line (cross-line
    # shingles can start in the previous line; clamp into the line so
    # the verify segment stays line-local).
    if ns:
        ll = line_lengths[shingle_line]
        shingle_anchor = np.clip(
            np.arange(ns, dtype=np.int32) - line_start[shingle_line],
            0,
            np.maximum(0, ll - 1),
        ).astype(np.int32)
    else:
        shingle_anchor = np.zeros((0,), dtype=np.int32)

    return ScriptIndex(
        lines=list(lines),
        tokenized=tokenized,
        stream_hashes=stream,
        token_line=token_line,
        shingle_line=shingle_line,
        shingle_anchor=shingle_anchor,
        shingle_windows=windows,
        embeddings=emb,
        line_start=line_start,
        line_lengths=line_lengths,
    )
