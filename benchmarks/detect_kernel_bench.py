"""Micro-bench of the fused detect Pallas kernel in isolation.

Times detect_candidates_pallas on octave-0-shaped DoG input (batch 8)
with the honest fori_loop pattern, for emit_fields True/False, to
locate where the detect stage's kernel time actually goes.

Usage: python benchmarks/detect_kernel_bench.py [batch] [iters]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from siftmetal_tpu.utils.bench_env import setup as _setup_bench_env


def main() -> None:
    _setup_bench_env()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.ops.pallas.detect import detect_candidates_pallas

    config = SiftConfig()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    rng = np.random.default_rng(0)
    # Octave 0 of the 480x640 parity pipeline: upsampled 960x1280,
    # s_dim = n_scales + 2 DoG slices.
    s_dim = config.n_scales_per_octave + 2
    shapes = [(960, 1280), (480, 640), (240, 320), (120, 160)]

    for h, w in shapes:
        dog = jnp.asarray(
            rng.normal(0, 0.02, (batch, s_dim, h, w)).astype(np.float32)
        )

        for emit_fields in (True, False):
            @jax.jit
            def bench_n(dog, emit_fields=emit_fields):
                def body(_, carry):
                    dog, acc = carry
                    outs = detect_candidates_pallas(
                        dog, 0.8 * config.dog_threshold,
                        config.edge_threshold,
                        tile_h=min(128, (h - 2 + 7) // 8 * 8),
                        emit_fields=emit_fields,
                    )
                    cand = outs[0]
                    acc = acc + jnp.sum(cand).astype(jnp.float32)
                    if emit_fields:
                        acc = acc + jnp.sum(outs[2][0])
                    dog = dog + 1e-12 * acc
                    return dog, acc

                dog, acc = lax.fori_loop(
                    0, iters, body, (dog, jnp.float32(0))
                )
                return acc

            _ = float(np.asarray(bench_n(dog)))
            t0 = time.perf_counter()
            _ = float(np.asarray(bench_n(dog)))
            dt = time.perf_counter() - t0
            ms = dt / (batch * iters) * 1e3
            print(
                json.dumps(
                    {
                        "shape": f"{h}x{w}",
                        "emit_fields": emit_fields,
                        "ms_per_frame": round(ms, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
