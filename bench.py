"""Headline benchmark: SIFT extraction throughput at 640x480 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 2000 frames/s/chip (BASELINE.md, driver-provided north
star; the reference publishes no numbers — SURVEY.md §6).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.sift.extract import extract_gray

    config = SiftConfig()
    h, w = 480, 640
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_oct = config.num_octaves(h, w)

    fn = jax.jit(jax.vmap(lambda g: extract_gray(g, config, n_oct)))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0.0, 1.0, (batch, h, w)).astype(np.float32)
    )

    # Warmup / compile.
    out = fn(frames)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

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
