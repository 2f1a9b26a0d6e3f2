from fandom_search_tpu.ops.distance_topk import (  # noqa: F401
    topk_dot_jnp,
    topk_dot_pallas,
    topk_dot,
)
