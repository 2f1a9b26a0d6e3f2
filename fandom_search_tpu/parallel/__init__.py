from fandom_search_tpu.parallel.mesh import make_mesh  # noqa: F401
from fandom_search_tpu.parallel.sharded import (  # noqa: F401
    ShardedSearchEngine,
    sharded_topk,
)
