"""fandom_search_tpu — a TPU-native text-reuse search engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
``senderle/fandom-search`` (see SURVEY.md): find every quotation and
near-quotation of a source script inside a large fan-fiction corpus.

Pipeline (reference behavior, TPU-first realization):

  scrape (host)  ->  clean/extract (host)  ->  tokenize+hash (host/C++)
      ->  shingle-embed (device, signed random features)
      ->  fused distance + top-k (Pallas kernel, MXU matmul)
      ->  Smith-Waterman wavefront verification (Pallas kernel)
      ->  span chaining  ->  CSV / engagement matrix (host)

Reference parity map is documented per-module; the reference mount was
empty at survey time, so citations point at SURVEY.md sections instead
of reference file:line (see SURVEY.md section 0 for the evidence basis).
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml [project].version

from fandom_search_tpu.config import (  # noqa: F401
    ShingleConfig,
    SearchConfig,
    LSHConfig,
    MeshConfig,
    PipelineConfig,
)
