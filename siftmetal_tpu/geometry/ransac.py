"""Batched RANSAC: every hypothesis evaluated in parallel, no early exit.

TPU-native robust estimation (SURVEY.md §7 step 5): data-dependent loop
counts don't exist under jit, so instead of the classical
sample-until-confident loop this draws a FIXED number of minimal samples
up front, solves all models with one vmapped solver, scores all models
against all correspondences with one [H, N] error matrix, and picks the
best by (masked) inlier count. A final least-squares refit on the winner's
inliers replaces the usual local optimization step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class RansacResult(NamedTuple):
    model: jnp.ndarray        # best (refit) model parameters
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # scalar int32
    ok: jnp.ndarray           # bool — enough valid points to attempt


def _sample_indices(key, n_hypotheses, sample_size, valid):
    """[H, S] indices drawn from the valid entries of a padded point set.

    Draws positions uniformly in [0, count) and maps through the compacted
    valid-index list; duplicate indices within a sample yield a degenerate
    model which scores ~0 inliers and is naturally ignored.
    """
    n = valid.shape[0]
    count = jnp.sum(valid.astype(jnp.int32))
    order = jnp.nonzero(valid, size=n, fill_value=0)[0]
    pos = jax.random.randint(
        key, (n_hypotheses, sample_size), 0, jnp.maximum(count, 1)
    )
    return order[pos]


def ransac(
    key: jax.Array,
    points_a: jnp.ndarray,
    points_b: jnp.ndarray,
    valid: jnp.ndarray,
    solver: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    error_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sample_size: int,
    n_hypotheses: int = 512,
    inlier_threshold: float = 3.0,
    refit: bool = True,
) -> RansacResult:
    """Generic parallel RANSAC over padded correspondences.

    solver([S,2],[S,2]) -> model; error_fn(model, [N,2], [N,2]) -> [N]
    residuals compared against ``inlier_threshold``.

    Solves run at HIGHEST matmul precision: the TPU default (bf16) path
    degrades the SVDs behind the minimal solvers.
    """
    idx = _sample_indices(key, n_hypotheses, sample_size, valid)
    with jax.default_matmul_precision("highest"):
        models = jax.vmap(lambda i: solver(points_a[i], points_b[i]))(idx)

    def count_inliers(model):
        err = error_fn(model, points_a, points_b)
        inl = (err < inlier_threshold) & valid
        return inl, jnp.sum(inl.astype(jnp.int32))

    inls, counts = jax.vmap(count_inliers)(models)
    best = jnp.argmax(counts)
    model = models[best]
    inliers = inls[best]
    n_in = counts[best]

    if refit:
        # Least-squares refit on the winning inlier set: re-run the solver
        # on the gathered inliers, padding the remaining slots by REPEATING
        # THE FIRST INLIER (nonzero's fill_value=0 would inject array index
        # 0 — an arbitrary point that may be a gross outlier). Repetition
        # of a genuine inlier only reweights it; every refit equation stays
        # an inlier constraint.
        m = points_a.shape[0]
        order = jnp.nonzero(inliers, size=m, fill_value=0)[0]
        order = jnp.where(jnp.arange(m) < n_in, order, order[0])
        with jax.default_matmul_precision("highest"):
            refit_model = solver(points_a[order], points_b[order])
        err = error_fn(refit_model, points_a, points_b)
        refit_inl = (err < inlier_threshold) & valid
        refit_n = jnp.sum(refit_inl.astype(jnp.int32))
        better = refit_n >= n_in
        model = jnp.where(better, refit_model, model)
        inliers = jnp.where(better, refit_inl, inliers)
        n_in = jnp.where(better, refit_n, n_in)

    ok = jnp.sum(valid.astype(jnp.int32)) >= sample_size
    return RansacResult(
        model=model, inliers=inliers & ok, n_inliers=n_in * ok, ok=ok
    )


def find_homography(
    key, src, dst, valid, n_hypotheses=512, inlier_threshold=3.0
) -> RansacResult:
    from .twoview import homography_from_points, homography_transfer_error

    return ransac(
        key, src, dst, valid,
        solver=homography_from_points,
        error_fn=homography_transfer_error,
        sample_size=4,
        n_hypotheses=n_hypotheses,
        inlier_threshold=inlier_threshold,
    )


def find_fundamental(
    key, src, dst, valid, n_hypotheses=512, inlier_threshold=2.0
) -> RansacResult:
    from .twoview import fundamental_from_points, sampson_error

    return ransac(
        key, src, dst, valid,
        solver=fundamental_from_points,
        error_fn=sampson_error,
        sample_size=8,
        n_hypotheses=n_hypotheses,
        # Sampson error is squared-distance-like; threshold in px^2.
        inlier_threshold=inlier_threshold,
    )
