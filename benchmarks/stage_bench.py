"""Per-stage throughput profile of the BATCHED extraction pipeline on TPU.

Times CUMULATIVE pipeline prefixes (seed, pyramid, +detect, +compact,
+orient, full extract) with the same honest methodology as bench.py: N
iterations inside one jitted fori_loop with a threaded data dependency and
a single host fetch (block_until_ready through the axon tunnel reads
10-600x too fast — never use it here).

Usage: python benchmarks/stage_bench.py [batch] [iters] [stage ...]
Optional env: BENCH_CONFIG=fast selects the delta_min=1 standard config.
Stages default to all. Prints one JSON line per stage with ms/frame.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siftmetal_tpu.config import FAST_CONFIG, SiftConfig
    from siftmetal_tpu.sift import detect as _detect
    from siftmetal_tpu.sift import describe as _describe
    from siftmetal_tpu.sift.batched import (
        build_pyramid_batch,
        extract_gray_batch,
    )
    from siftmetal_tpu.sift.pyramid import seed_image

    config = (
        FAST_CONFIG if os.environ.get("BENCH_CONFIG") == "fast" else SiftConfig()
    )
    h, w = 480, 640
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    only = set(sys.argv[3:])
    n_oct = config.num_octaves(h, w)

    def stage_seed(g):
        return jnp.sum(seed_image(g, config))

    def stage_pyramid(g):
        gaussians, dogs = build_pyramid_batch(g, config, n_oct)
        return sum(jnp.sum(d) for d in dogs)

    def detect_all(g):
        _, dogs = build_pyramid_batch(g, config, n_oct)
        per_octave = []
        total = 0
        for o in range(n_oct):
            kp_b, ctr = jax.vmap(
                lambda d, o=o: _detect.detect_octave(d, o, config)
            )(dogs[o])
            per_octave.append(kp_b)
            total = total + jnp.sum(ctr["n_border"])
        return dogs, per_octave, total

    def stage_detect(g):
        _, _, total = detect_all(g)
        return total

    def stage_compact(g):
        dogs, per_octave, acc = detect_all(g)
        for o in range(n_oct):
            hh, ww = dogs[o].shape[-2], dogs[o].shape[-1]
            budget = _detect.keypoint_budget(config, (hh, ww), o)
            kpc, _ = jax.vmap(
                lambda kp, o=o, budget=budget: _detect.compact_octave_keypoints(
                    kp, o, config, budget
                )
            )(per_octave[o])
            acc = acc + jnp.sum(kpc.valid)
        return acc

    def stage_full(g):
        _, descs, counters = extract_gray_batch(g, config, n_oct)
        # Sum over the feature bytes so the descriptor stage cannot be
        # dead-code-eliminated (counters alone don't depend on it).
        return jnp.sum(counters["n_descriptors"]) + jnp.sum(
            descs.features.astype(jnp.int32)
        )

    def stage_mask(g):
        _, dogs = build_pyramid_batch(g, config, n_oct)
        acc = 0
        for o in range(n_oct):
            m = jax.vmap(_detect.extrema_mask)(dogs[o])
            acc = acc + jnp.sum(m.astype(jnp.int32))
        return acc

    def stage_fields(g):
        _, dogs = build_pyramid_batch(g, config, n_oct)
        acc = 0.0
        for o in range(n_oct):
            f = jax.vmap(_detect.dense_taylor_fields)(dogs[o])
            acc = acc + jnp.sum(f)
        return acc

    def stage_nonzero(g):
        _, dogs = build_pyramid_batch(g, config, n_oct)
        acc = 0
        for o in range(n_oct):
            hh, ww = dogs[o].shape[-2], dogs[o].shape[-1]
            k = _detect.extrema_candidate_budget(config, (hh, ww))
            m = jax.vmap(_detect.extrema_mask)(dogs[o])
            idx, cnt, drp = jax.vmap(
                lambda mm, k=k: _detect.masked_nonzero(
                    mm.reshape(-1), k
                )
            )(m)
            acc = acc + jnp.sum(cnt) + jnp.sum(idx[:, ::64])
        return acc

    def stage_edge(g):
        _, dogs = build_pyramid_batch(g, config, n_oct)
        acc = 0
        for o in range(n_oct):
            e = jax.vmap(
                lambda d: _detect.dense_edge_ok(d, config.edge_threshold)
            )(dogs[o])
            acc = acc + jnp.sum(e.astype(jnp.int32))
        return acc

    stages = {
        "seed": stage_seed,
        "pyramid": stage_pyramid,
        "mask": stage_mask,
        "fields": stage_fields,
        "edge": stage_edge,
        "nonzero": stage_nonzero,
        "detect": stage_detect,
        "compact": stage_compact,
        "full": stage_full,
    }

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0.0, 1.0, (batch, h, w)).astype(np.float32)
    )

    for name, fn in stages.items():
        if only and name not in only:
            continue

        @jax.jit
        def bench_n(frames, fn=fn):
            def body(_, carry):
                frames, acc = carry
                out = fn(frames)
                acc = acc + jnp.sum(out).astype(jnp.float32)
                frames = frames + 1e-12 * acc
                return frames, acc

            frames, acc = lax.fori_loop(
                0, iters, body, (frames, jnp.float32(0))
            )
            return acc

        _ = float(np.asarray(bench_n(frames)))  # warmup/compile
        t0 = time.perf_counter()
        _ = float(np.asarray(bench_n(frames)))
        dt = time.perf_counter() - t0
        ms = dt / (batch * iters) * 1e3
        print(
            json.dumps(
                {
                    "stage": name,
                    "ms_per_frame": round(ms, 3),
                    "fps": round(1e3 / ms, 1),
                    "batch": batch,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
