from .matcher import (
    Matches,
    geometry_score,
    match_bruteforce,
    match_guided,
    pairwise_sq_dists,
    pairwise_sq_dists_u8,
)

__all__ = [
    "Matches", "geometry_score", "match_bruteforce", "match_guided",
    "pairwise_sq_dists", "pairwise_sq_dists_u8",
]
