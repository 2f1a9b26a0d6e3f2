"""Deterministic word tokenizer shared by index and query paths.

The reference lowercases and word-splits both corpora (SURVEY.md section 3,
"Tokenizer").  Determinism matters more than linguistic nuance here: the
same function must tokenize the script (index side) and the fanworks
(query side), and the C++ fast-ingest path must reproduce it byte-for-
byte.  Tokens are maximal runs of ASCII alphanumerics plus in-word
apostrophes on the lowercased text; everything else is a separator.
Offsets into the *original* string are kept so matches can be reported
as exact character spans (the reference reports matched text in its CSV,
SURVEY.md section 3 "CSV reporter").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from fandom_search_tpu.data.hashing import hash_words

# A token: letters/digits, with apostrophes allowed inside (don't, o'clock).
_TOKEN_RE = re.compile(r"[0-9a-z]+(?:'[0-9a-z]+)*")


@dataclass
class Tokenized:
    """Tokens of one text plus everything needed to map back to it."""

    text: str
    tokens: List[str]
    # [num_tokens, 2] int64 (start, end) character offsets into `text`.
    offsets: np.ndarray
    # uint32[num_tokens] word hashes (fmix32(FNV-1a(token))).
    hashes: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.hashes is None:
            self.hashes = hash_words(self.tokens)

    def __len__(self) -> int:
        return len(self.tokens)

    def span_text(self, tok_start: int, tok_end: int) -> str:
        """Original text covered by tokens [tok_start, tok_end)."""
        if tok_end <= tok_start or len(self.tokens) == 0:
            return ""
        a = int(self.offsets[tok_start, 0])
        b = int(self.offsets[tok_end - 1, 1])
        return self.text[a:b]


def tokenize(text: str) -> Tokenized:
    """Lowercase + word-split with original-string offsets."""
    low = text.lower()
    if len(low) != len(text):
        # Rare unicode chars lowercase to multiple chars (e.g. 'İ'),
        # which would desync offsets; lower per-char, keeping length.
        low = "".join(c.lower() if len(c.lower()) == 1 else c for c in text)
    tokens: List[str] = []
    spans: List[Tuple[int, int]] = []
    for m in _TOKEN_RE.finditer(low):
        tokens.append(m.group(0))
        spans.append((m.start(), m.end()))
    offsets = (
        np.array(spans, dtype=np.int64)
        if spans
        else np.zeros((0, 2), dtype=np.int64)
    )
    return Tokenized(text=text, tokens=tokens, offsets=offsets)
