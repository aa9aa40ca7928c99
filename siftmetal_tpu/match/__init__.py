from .matcher import (
    Matches,
    geometry_score,
    index_keys,
    match_bruteforce,
    match_two_stage,
    pairwise_sq_dists,
)

__all__ = [
    "Matches", "geometry_score", "index_keys", "match_bruteforce",
    "match_two_stage", "pairwise_sq_dists",
]
