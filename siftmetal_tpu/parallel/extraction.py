"""Multi-chip data-parallel extraction and sharded matching.

The reference is single-device by construction (SURVEY.md §2c: no batch
axis anywhere, one texture per call, Sources/SIFTMetal/SIFT/SIFT.swift:147).
Here the frame axis is the data-parallel axis: frames are sharded over a
1-D device mesh and the whole extract pipeline runs SPMD; descriptor
matching shards the *target* set and combines per-shard top-2 candidates
with one all-gather over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SiftConfig
from ..sift.extract import extract_gray
from ..match.matcher import Matches, raw_features, pairwise_sq_dists, _accept


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def make_batch_extractor(
    mesh: Mesh,
    height: int,
    width: int,
    config: SiftConfig,
    n_octaves: int | None = None,
    axis: str = "batch",
):
    """Compiled SPMD extractor for [B, H, W] gray frame batches, B a
    multiple of the mesh size. Outputs are sharded along the same axis."""
    n_oct = (
        n_octaves if n_octaves is not None else config.num_octaves(height, width)
    )
    sharding = NamedSharding(mesh, P(axis))

    from ..sift.batched import extract_gray_batch

    # shard_map (not jit+in_shardings): each device runs the batched
    # pipeline (vmapped XLA stages + frame-flattened Pallas kernels) on
    # its LOCAL shard of the frame axis — the Pallas calls stay
    # single-device programs instead of asking GSPMD to partition them.
    run = jax.jit(
        jax.shard_map(
            lambda frames: extract_gray_batch(frames, config, n_oct),
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    return run


def make_sharded_matcher(
    mesh: Mesh,
    absolute_threshold: float = 1.176,
    ratio_threshold: float = 0.6,
    axis: str = "batch",
):
    """Matcher with the target descriptor set sharded across the mesh.

    Each device computes exact top-2 against its target shard (one local
    MXU matmul); the [n_dev, Q, 2] candidates are all-gathered over ICI and
    reduced to a global top-2 — the multi-chip form of the single matmul
    matcher (and the scale-out answer to Trie.swift's single-threaded ANN).
    """

    def local_top2(qf, tf, tv):
        from ..match.matcher import _top2

        d2 = pairwise_sq_dists(raw_features(qf), raw_features(tf))
        d2 = jnp.where(tv[None, :], d2, jnp.inf)
        b1, b2, idx, idx2 = _top2(d2)
        shard = lax.axis_index(axis)
        return (
            jnp.stack([b1, b2], axis=1),
            jnp.stack(
                [idx + shard * tf.shape[0], idx2 + shard * tf.shape[0]],
                axis=1,
            ),
        )

    def merged(qf, qv, tf, tv):
        d2_l, idx_l = local_top2(qf, tf, tv)
        d2_all = lax.all_gather(d2_l, axis)  # [n_dev, Q, 2]
        idx_all = lax.all_gather(idx_l, axis)
        n_dev = d2_all.shape[0]
        d2_flat = jnp.moveaxis(d2_all, 0, 1).reshape(-1, 2 * n_dev)
        idx_flat = jnp.moveaxis(idx_all, 0, 1).reshape(-1, 2 * n_dev)
        neg, pos = lax.top_k(-d2_flat, 2)
        best_idx = jnp.take_along_axis(idx_flat, pos[:, :1], axis=1)[:, 0]
        second_idx = jnp.take_along_axis(idx_flat, pos[:, 1:2], axis=1)[:, 0]
        d1 = jnp.sqrt(jnp.maximum(-neg[:, 0], 0.0))
        d2nd = jnp.sqrt(jnp.maximum(-neg[:, 1], 0.0))
        return _accept(
            d1, d2nd, best_idx, second_idx, qv,
            absolute_threshold, ratio_threshold,
        )

    return jax.jit(
        jax.shard_map(
            merged,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False,
        )
    )
