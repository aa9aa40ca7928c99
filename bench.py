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

Wall-time budget: the driver runs this with a hard timeout (~6 min; round
3's run at 6 m 50 s was killed, rc=124, and captured nothing). Two fixed
costs dominate cold wall time through the axon tunnel and are both
mitigated here:
  1. The FIRST device->host fetch in a process pays a one-time tunnel
     warm-up measured at 2-6+ minutes (later fetches: ~25 ms). A daemon
     thread issues a 4-byte fetch immediately so the warm-up overlaps
     tracing + compilation instead of serializing after them.
  2. XLA/Mosaic compilation of the pipeline. A persistent compilation
     cache (.jax_cache/, committed warm) makes re-runs near-free; keep it
     warm after any change to the compiled program.
"""

import json
import pathlib
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from siftmetal_tpu.utils.bench_env import setup as _setup_bench_env

    _setup_bench_env()  # persistent compile cache + tunnel warm-up thread

    import jax
    import jax.numpy as jnp
    from jax import lax

    from siftmetal_tpu.config import (
        FAST_BF16_CONFIG,
        FAST_CONFIG,
        SiftConfig,
    )
    from siftmetal_tpu.sift.batched import extract_gray_batch

    # --config=fast / --config=fast_bf16 select the documented presets
    # (config.py FAST_CONFIG / FAST_BF16_CONFIG); default is the
    # IPOL-parity configuration whose number is the headline metric.
    preset = "default"
    for a in sys.argv[1:]:
        if a.startswith("--config="):
            preset = a.split("=", 1)[1]
    config = {
        "default": SiftConfig(),
        "fast": FAST_CONFIG,
        "fast_bf16": FAST_BF16_CONFIG,
    }[preset]
    h, w = 480, 640
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    natural = "--natural" in sys.argv[1:]
    batch = int(args[0]) if len(args) > 0 else 8
    iters = int(args[1]) if len(args) > 1 else 10
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

    def natural_frames():
        # Tile the IPOL butterfly fixture to 480x640 — dense fine-scale
        # texture. Noise frames carry ~40% FEWER surviving keypoints than
        # this (measured r4, overturning the earlier noise-is-worst-case
        # claim), so the realistic-content number is the lower one and
        # must be captured in the driver artifact, not just prose
        # (VERDICT r4 weak #3).
        from siftmetal_tpu.utils.io import load_image

        img = np.asarray(
            load_image(
                str(
                    pathlib.Path(__file__).parent
                    / "tests/fixtures/butterfly.png"
                )
            )
        ).astype(np.float32)
        if img.ndim == 3:
            img = img[..., :3] @ np.array(
                [0.2126, 0.7152, 0.0722], np.float32
            )
        tile = np.pad(
            img,
            ((0, max(0, h - img.shape[0])), (0, max(0, w - img.shape[1]))),
            mode="wrap",
        )[:h, :w]
        return jnp.asarray(
            np.stack([tile * (1.0 - 0.02 * b / batch) for b in range(batch)])
        )

    def measure(frames):
        # The frames' H2D transfer must land BEFORE the timed region
        # (through the axon tunnel a 10 MB upload costs whole seconds
        # and measured -20% on the natural figure when left inside).
        jax.block_until_ready(frames)
        t0 = time.perf_counter()
        total = int(np.asarray(bench_n(frames)))
        dt = time.perf_counter() - t0
        # != 0, not > 0: the guard's only job is proving the descriptor
        # values were computed (DCE check); the i32 accumulator wraps
        # negative at batch >= 16 x 10 iterations.
        assert total != 0
        return batch * iters / dt

    noise = jnp.asarray(
        rng.uniform(0.0, 1.0, (batch, h, w)).astype(np.float32)
    )
    primary = natural_frames() if natural else noise
    _ = int(np.asarray(bench_n(primary)))  # warmup / compile

    fps = measure(primary)
    record = {
        "metric": (
            "sift_extract_fps_640x480_natural"
            if natural
            else "sift_extract_fps_640x480"
        ),
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 2000.0, 4),
    }
    if not natural:
        # Same compiled program, different data: the natural-content
        # variant costs one more timed run (~1 s), so the default
        # invocation captures BOTH figures in the one JSON line.
        nat_fps = measure(natural_frames())
        record["natural_fps"] = round(nat_fps, 2)
        record["natural_vs_baseline"] = round(nat_fps / 2000.0, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
