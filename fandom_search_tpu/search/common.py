"""Helpers shared by the CPU oracle and the TPU engine.

Keeping window extraction in ONE place guarantees the two paths verify
the exact same (fan window, script line) pairs, which is what makes the
oracle a usable golden test (SURVEY.md section 5, "Golden-pipeline oracle").
"""

from __future__ import annotations

from fandom_search_tpu.config import SearchConfig, ShingleConfig


def verify_window(
    fan_pos: int,
    num_tokens: int,
    shingle_cfg: ShingleConfig,
    search_cfg: SearchConfig,
) -> tuple[int, int]:
    """Token range [start, end) of the fan-side verification window.

    The window is ``window_tokens`` wide when the work allows, centered
    on the candidate shingle so a quote of up to ~window length around
    the shingle is fully visible to the aligner.
    """
    w = search_cfg.window_tokens
    lead = (w - shingle_cfg.n) // 2
    start = min(max(0, fan_pos - lead), max(0, num_tokens - w))
    end = min(num_tokens, start + w)
    return start, end
