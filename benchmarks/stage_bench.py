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

import dataclasses
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from siftmetal_tpu.utils.bench_env import setup as _setup_bench_env


def main() -> None:
    _setup_bench_env()  # persistent compile cache + tunnel warm-up thread
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
    # A/B knobs: BENCH_MXU=0 forces the VPU shift-add blur cascade,
    # BENCH_PALLAS_DETECT=0 the XLA detection path.
    if os.environ.get("BENCH_MXU") == "0":
        config = dataclasses.replace(config, use_mxu_pyramid=False)
    if os.environ.get("BENCH_PALLAS_DETECT") == "0":
        config = dataclasses.replace(config, use_pallas_detect=False)
    if os.environ.get("BENCH_MULTIKP") == "0":
        # A/B the multi-keypoint packed patch kernels (ROADMAP lever #1;
        # default ON since r4, so the knob disables it for the baseline).
        config = dataclasses.replace(config, use_multikp_pack=False)
    if os.environ.get("BENCH_BAND") == "1":
        # A/B the band-resident patch kernels (VERDICT r5 lever).
        config = dataclasses.replace(config, use_band_patches=True)
    if os.environ.get("BENCH_PALLAS_PYR") == "1":
        # A/B the fused cascade+DoG Pallas pyramid (ROADMAP lever #2).
        config = dataclasses.replace(config, use_pallas_pyramid=True)
    if os.environ.get("BENCH_ONESHOT"):
        # A/B the batched one-shot Pallas pyramid (r5 lever; =0 forces
        # it off once the flag defaults ON).
        config = dataclasses.replace(
            config,
            use_oneshot_pyramid=os.environ["BENCH_ONESHOT"] == "1",
        )
    if os.environ.get("BENCH_ITER1") == "1":
        # Isolate the refinement walk: iteration-1-only detection (the
        # slot path then never gathers; NOT parity-correct, A/B only).
        config = dataclasses.replace(config, max_interpolation_iterations=1)
    if os.environ.get("BENCH_ITERS"):
        # Finer walk-cost isolation: cap the interpolation iterations.
        config = dataclasses.replace(
            config,
            max_interpolation_iterations=int(os.environ["BENCH_ITERS"]),
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

    def stage_detect(g):
        return extract_gray_batch(g, config, n_oct, _profile_stop="detect")

    def stage_compact(g):
        return extract_gray_batch(g, config, n_oct, _profile_stop="compact")

    def stage_orient(g):
        return extract_gray_batch(g, config, n_oct, _profile_stop="orient")

    def stage_describe(g):
        return extract_gray_batch(g, config, n_oct, _profile_stop="describe")

    def stage_full(g):
        _, descs, counters = extract_gray_batch(g, config, n_oct)
        # Sum over the feature bytes so the descriptor stage cannot be
        # dead-code-eliminated (counters alone don't depend on it).
        return jnp.sum(counters["n_descriptors"]) + jnp.sum(
            descs.features.astype(jnp.int32)
        )

    stages = {
        "seed": stage_seed,
        "pyramid": stage_pyramid,
        "detect": stage_detect,
        "compact": stage_compact,
        "orient": stage_orient,
        "describe": stage_describe,
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
