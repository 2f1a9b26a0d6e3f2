"""Index persistence — decouple index build from query (SURVEY.md section 6).

The reference's only checkpointing is filesystem-as-checkpoint between
pipeline stages.  Here the device-side index (script shingle embeddings,
attribution tables, optional LSH codes — ``save_lsh``/``load_lsh``)
persists via orbax-checkpoint, and the host-side line records via JSON,
so a large corpus can be searched repeatedly without re-parsing or
re-embedding the script.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Tuple

import numpy as np

from fandom_search_tpu.config import (
    BucketedConfig,
    LSHConfig,
    PipelineConfig,
    SearchConfig,
    ShingleConfig,
)
from fandom_search_tpu.data.script_parser import ScriptLine
from fandom_search_tpu.data.tokenizer import tokenize
from fandom_search_tpu.search.index import ScriptIndex

_VERSION = 3  # v3: multiply-shift sign embedding (v2 indices must rebuild)

_ARRAY_FIELDS = (
    "stream_hashes",
    "token_line",
    "shingle_line",
    "shingle_anchor",
    "shingle_windows",
    "embeddings",
    "line_start",
    "line_lengths",
)


def save_index(index: ScriptIndex, cfg: PipelineConfig, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    arrays = {f: np.asarray(getattr(index, f)) for f in _ARRAY_FIELDS}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "arrays", arrays, force=True)
    meta = {
        "version": _VERSION,
        "lines": [
            {"line_no": ln.line_no, "speaker": ln.speaker, "text": ln.text,
             "script": ln.script}
            for ln in index.lines
        ],
        "shingle": dataclasses.asdict(cfg.shingle),
        "search": dataclasses.asdict(cfg.search),
        "lsh": dataclasses.asdict(cfg.lsh),
        # Persisted so a `search --index idx --bucketed` run compares
        # load_bucketed's identity against the config the tables were
        # BUILT with, not the default (an `index --bucketed-pairs all`
        # index would otherwise silently rebuild default 'triangles'
        # tables, discarding the stronger guarantee the user built).
        "bucketed": dataclasses.asdict(cfg.bucketed),
    }
    (path / "meta.json").write_text(json.dumps(meta), encoding="utf-8")


def load_index(path: str | Path) -> Tuple[ScriptIndex, PipelineConfig]:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    meta = json.loads((path / "meta.json").read_text(encoding="utf-8"))
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"index at {path} is format v{meta.get('version')}; this build "
            f"reads v{_VERSION} — rebuild it with `fandomsearch index`"
        )
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(path / "arrays")
    lines = [
        ScriptLine(d["line_no"], d["speaker"], d["text"], d.get("script", ""))
        for d in meta["lines"]
    ]
    tokenized = [tokenize(ln.text) for ln in lines]
    index = ScriptIndex(
        lines=lines,
        tokenized=tokenized,
        **{
            f: np.asarray(arrays[f])
            for f in _ARRAY_FIELDS
        },
    )
    # restore dtypes orbax may widen
    index.stream_hashes = index.stream_hashes.astype(np.uint32)
    index.shingle_windows = index.shingle_windows.astype(np.uint32)
    index.embeddings = index.embeddings.astype(np.int8)
    cfg = PipelineConfig(
        shingle=ShingleConfig(**meta["shingle"]),
        search=SearchConfig(**meta["search"]),
        lsh=LSHConfig(**meta["lsh"]),
        # pre-bucketed-persistence v3 saves lack the key: default
        bucketed=BucketedConfig(**meta.get("bucketed") or {}),
    )
    return index, cfg


def save_lsh(path: str | Path, lsh, cfg: LSHConfig) -> None:
    """Persist a built LSHIndex next to the script index.

    Saves the projection matrix and the packed (transposed) sign codes
    so ``attach_lsh_prefilter`` on a loaded index costs ~nothing and is
    bit-identical to an in-process build.
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    arrays = {
        "projection": np.asarray(lsh.projection),
        "codes_t": np.asarray(lsh.codes_t),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "lsh_arrays", arrays, force=True)
    meta = {
        "ns_valid": int(lsh.ns_valid),
        "lsh": dataclasses.asdict(cfg),
    }
    (path / "lsh_meta.json").write_text(json.dumps(meta), encoding="utf-8")


def _bucketed_identity(cfg) -> dict:
    """The BucketedConfig fields that determine the built tables.

    ``hybrid`` is a runtime routing choice (exact-kernel fallback for
    at-risk queries) — the same persisted tables serve both modes, so
    it must not participate in the saved-index identity."""
    d = dataclasses.asdict(cfg)
    d.pop("hybrid", None)
    return d


def save_bucketed(path: str | Path, bidx, cfg) -> None:
    """Persist a built BucketedIndex (ops/bucketed.py) next to the
    script index — the inverted tables are ~1s to build (native
    counting sort) + upload at 10^6 shingles, ~4s at 4*10^6; loading
    still beats rebuilding and keeps attach deterministic."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    arrays = {
        "entries": np.asarray(bidx.entries),
        "offsets": np.asarray(bidx.offsets),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "bucketed_arrays", arrays, force=True)
    meta = {
        "num_buckets": int(bidx.num_buckets),
        "salts": list(bidx.salts),
        "ns_valid": int(bidx.ns_valid),
        "overflow_frac": float(bidx.overflow_frac),
        "bucketed": _bucketed_identity(cfg),
    }
    (path / "bucketed_meta.json").write_text(
        json.dumps(meta), encoding="utf-8"
    )


def load_bucketed(path: str | Path, cfg):
    """Load a persisted BucketedIndex; None if absent or
    config-mismatched."""
    import orbax.checkpoint as ocp

    from fandom_search_tpu.ops.bucketed import BucketedIndex

    path = Path(path).resolve()
    meta_path = path / "bucketed_meta.json"
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text(encoding="utf-8"))
    saved = dict(meta.get("bucketed") or {})
    saved.pop("hybrid", None)  # saves from before the field existed
    if saved != _bucketed_identity(cfg):
        import sys

        print(
            f"warning: persisted bucketed tables at {path} were built "
            f"with {saved}, requested {_bucketed_identity(cfg)}; "
            f"rebuilding from the requested config",
            file=sys.stderr,
        )
        return None
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(path / "bucketed_arrays")
    return BucketedIndex(
        entries=np.asarray(arrays["entries"]).astype(np.int32),
        offsets=np.asarray(arrays["offsets"]).astype(np.int32),
        num_buckets=int(meta["num_buckets"]),
        salts=tuple(int(s) for s in meta["salts"]),
        ns_valid=int(meta["ns_valid"]),
        overflow_frac=float(meta["overflow_frac"]),
    )


def load_lsh(path: str | Path, cfg: LSHConfig):
    """Load a persisted LSHIndex; None if absent or config-mismatched
    (a mismatch means the caller wants different bits/seed — rebuild)."""
    import orbax.checkpoint as ocp

    from fandom_search_tpu.ops.lsh import LSHIndex

    path = Path(path).resolve()
    meta_path = path / "lsh_meta.json"
    if not meta_path.exists():
        return None
    meta = json.loads(meta_path.read_text(encoding="utf-8"))
    if meta.get("lsh") != dataclasses.asdict(cfg):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(path / "lsh_arrays")
    return LSHIndex(
        projection=np.asarray(arrays["projection"]).astype(np.int8),
        codes_t=np.asarray(arrays["codes_t"]).astype(np.uint32),
        ns_valid=int(meta["ns_valid"]),
    )
