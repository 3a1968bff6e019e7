from .myers import (
    all_optimal_tracebacks,
    all_tracebacks_within_k,
    banded_edit_distances,
    edit_distances,
    local_minima,
    semiglobal_scores,
    semiglobal_search,
    traceback,
)

__all__ = [
    "all_optimal_tracebacks",
    "all_tracebacks_within_k",
    "banded_edit_distances",
    "edit_distances",
    "semiglobal_search",
    "semiglobal_scores",
    "local_minima",
    "traceback",
]
