"""Device-mesh construction (SURVEY.md section 3 parallelism table).

The reference's only parallelism is a host process pool over fanwork
files; the TPU equivalent is an SPMD mesh with two logical axes:

  ``works``  — the fanwork/query dimension (pure data parallel; the
               moral successor of Pool.map over files),
  ``script`` — the index dimension (each device holds a slice of the
               script's shingle matrix; per-shard top-k results merge
               with an all_gather + re-top-k over ICI,
               BASELINE.json:10).

Mesh-size-agnostic by construction: tests run the same code on a
virtual 8-device CPU mesh (SURVEY.md section 5).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from fandom_search_tpu.config import MeshConfig

AXIS_WORKS = "works"
AXIS_SCRIPT = "script"


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.num_devices
    if len(devices) < need:
        raise ValueError(
            f"mesh {cfg.works}x{cfg.script} needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(cfg.works, cfg.script)
    return Mesh(grid, (AXIS_WORKS, AXIS_SCRIPT))
