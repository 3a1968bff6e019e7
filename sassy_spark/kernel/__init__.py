from .myers import (
    edit_distances,
    semiglobal_search,
    semiglobal_scores,
    local_minima,
    traceback,
)

__all__ = [
    "edit_distances",
    "semiglobal_search",
    "semiglobal_scores",
    "local_minima",
    "traceback",
]
