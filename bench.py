"""Headline benchmark: SIFT extraction throughput at 640x480 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 2000 frames/s/chip (BASELINE.md, driver-provided north
star; the reference publishes no numbers — SURVEY.md §6).

Methodology: N pipeline iterations run inside ONE jitted lax.fori_loop
whose carry threads a data dependency (frames perturbed by the previous
iteration's keypoint count), so neither XLA nor an async dispatch tunnel
can overlap/elide iterations; a single host fetch closes the timing. This
matters: naive per-call timing with ``block_until_ready`` measured 10-600x
too fast through the remote-TPU tunnel used in CI.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.sift.batched import extract_gray_batch

    config = SiftConfig()
    h, w = 480, 640
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if batch < 1 or iters < 1:
        raise SystemExit(f"batch and iters must be >= 1 (got {batch}, {iters})")
    n_oct = config.num_octaves(h, w)

    extract = lambda frames: extract_gray_batch(frames, config, n_oct)

    @jax.jit
    def bench_n(frames):
        def body(_, carry):
            frames, acc = carry
            _, descs, counters = extract(frames)
            # The dependency must cover the DESCRIPTOR VALUES, not just the
            # counters: n_descriptors alone depends only on lane validity,
            # and XLA dead-code-eliminates the whole descriptor stage
            # (measured: identical time with/without it — round 1's number
            # silently skipped descriptors).
            acc = acc + jnp.sum(counters["n_descriptors"]) + jnp.sum(
                descs.features.astype(jnp.int32)
            )
            # Thread a real data dependency between iterations (the 1e-12
            # nudge is numerically invisible but forces sequencing).
            frames = frames + 1e-12 * acc.astype(jnp.float32)
            return frames, acc
        frames, acc = lax.fori_loop(
            0, iters, body, (frames, jnp.int32(0))
        )
        return acc

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0.0, 1.0, (batch, h, w)).astype(np.float32)
    )

    _ = int(np.asarray(bench_n(frames)))  # warmup / compile

    t0 = time.perf_counter()
    total = int(np.asarray(bench_n(frames)))
    dt = time.perf_counter() - t0
    assert total > 0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "sift_extract_fps_640x480",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 2000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
