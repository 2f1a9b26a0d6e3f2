from fandom_search_tpu.search.index import ScriptIndex, build_script_index  # noqa: F401
from fandom_search_tpu.search.types import MatchRow, CandidateHit  # noqa: F401
from fandom_search_tpu.search.chain import chain_hits  # noqa: F401
