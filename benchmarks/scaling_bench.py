"""Multi-device scaling-efficiency harness: DP extraction + distributed BA.

BASELINE.md's north-star bar is >= 80% scaling efficiency from 1 chip to N
(the reference has no multi-device capability at all, SURVEY.md §2c — this
is pure new-framework ground). The dryrun entry proves the sharded programs
COMPILE and RUN; this harness measures throughput-vs-devices so the
efficiency number is one command away whenever a real multi-chip slice is
attached:

    python benchmarks/scaling_bench.py                 # virtual CPU mesh
    SCALING_BACKEND=native python benchmarks/scaling_bench.py  # real devices

Prints one JSON line per (task, n_devices) with throughput, plus one
summary line per task with per-device-count efficiency
``eff(n) = throughput(n) / (n * throughput(1))``.

On the default virtual CPU mesh (xla_force_host_platform_device_count) all
"devices" time-share the same host cores, so absolute efficiency there is
NOT the hardware number — the virtual run validates the harness and the
sharded programs end to end (CI sanity; tests/test_scaling_bench.py). On a
real TPU slice the same script, unchanged, produces the BASELINE.md
figure (`"virtual": false` in the output rows).

Timing uses the same honest pattern as bench.py: N iterations inside one
jitted fori_loop with a threaded data dependency and a single host fetch.

Tasks:
  * ``extract`` — weak-scaling DP extraction (fixed frames PER DEVICE, the
    video-front-end deployment shape): make_batch_extractor over a 1-D
    mesh; ideal scaling is flat ms/frame as devices grow.
  * ``ba``      — weak-scaling distributed Schur BA (fixed landmarks per
    device): make_distributed_ba; communication is O(C^2) psums/iter,
    independent of the landmark count, so near-flat time/iter is ideal.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _setup_backend(n_devices_max: int) -> bool:
    """Configure the JAX backend BEFORE the first jax import downstream.
    Returns True when running on the virtual (forced-CPU) mesh."""
    if os.environ.get("SCALING_BACKEND") == "native":
        return False
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={n_devices_max}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True


def _bench_loop(fn, args, iters: int) -> float:
    """Median-of-3 wall time of ``iters`` dependent fn applications inside
    one jitted fori_loop (single host fetch at the end)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(args):
        def body(_, carry):
            args, acc = carry
            out = fn(*args)
            acc = acc + out
            # Thread a (numerically negligible) dependency through the
            # first argument so XLA cannot overlap/elide iterations.
            args = (args[0] + 1e-12 * acc,) + args[1:]
            return args, acc

        _, acc = lax.fori_loop(0, iters, body, (args, jnp.float32(0)))
        return acc

    _ = float(np.asarray(run(args)))  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(args)))
        times.append(time.perf_counter() - t0)
    return sorted(times)[1]


def bench_extract(n_dev: int, per_device: int, iters: int, h: int, w: int):
    """Weak-scaling DP extraction: returns frames/s over the whole mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from siftmetal_tpu.config import SiftConfig
    from siftmetal_tpu.parallel.extraction import make_mesh
    from siftmetal_tpu.sift.batched import extract_gray_batch

    config = SiftConfig(
        max_extrema_per_octave=2048, max_keypoints=1024, max_descriptors=1536
    )
    mesh = make_mesh(n_dev)
    b = n_dev * per_device
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.uniform(0.0, 1.0, (b, h, w)).astype(np.float32),
        NamedSharding(mesh, P("batch")),
    )
    n_oct = config.num_octaves(h, w)

    def step(fr):
        _, descs, counters = jax.shard_map(
            lambda f: extract_gray_batch(f, config, n_oct),
            mesh=mesh,
            in_specs=P("batch"),
            out_specs=P("batch"),
            check_vma=False,
        )(fr)
        return (
            jnp.sum(counters["n_descriptors"]).astype(jnp.float32)
            + jnp.sum(descs.features.astype(jnp.int32)).astype(jnp.float32)
        )

    dt = _bench_loop(step, (frames,), iters)
    return b * iters / dt


def _synthetic_ba(n_cam: int, n_lm: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from siftmetal_tpu.slam.ba import BAProblem
    from siftmetal_tpu.slam.camera import project

    rng = np.random.default_rng(seed)
    k = np.array(
        [[400, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=np.float32
    )
    lms = rng.uniform([-4, -4, 6], [4, 4, 14], (n_lm, 3)).astype(np.float32)
    cams = np.zeros((n_cam, 6), dtype=np.float32)
    cams[:, 3] = np.linspace(-1.5, 1.5, n_cam)
    # Each landmark observed by 4 cameras (sparse, SfM-shaped).
    deg = 4
    cam_idx = (
        (np.arange(n_lm)[:, None] + np.arange(deg)[None, :]) % n_cam
    ).reshape(-1).astype(np.int32)
    lm_idx = np.repeat(np.arange(n_lm), deg).astype(np.int32)
    uv = np.asarray(
        jax.vmap(
            lambda c, l: project(
                jnp.asarray(cams)[c], jnp.asarray(k), jnp.asarray(lms)[l]
            )
        )(cam_idx, lm_idx)
    )
    noisy_cams = cams + rng.normal(0, 0.01, cams.shape).astype(np.float32)
    noisy_cams[:2] = cams[:2]
    noisy_lms = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)
    return BAProblem(
        cameras=jnp.asarray(noisy_cams),
        landmarks=jnp.asarray(noisy_lms),
        k=jnp.asarray(k),
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv),
        valid=jnp.ones(len(uv), dtype=bool),
        fixed_cameras=2,
    )


def bench_ba(n_dev: int, lm_per_device: int, iters: int, n_cam: int):
    """Weak-scaling distributed BA: returns BA solves/s (10 fixed
    Gauss-Newton iterations each) over the whole mesh.

    The SPMD body below is make_distributed_ba's per-shard program minus
    the cost-gated accept/reject (a fixed iteration count keeps the
    per-solve work identical at every device count, which a trust-region
    accept path would not guarantee)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from siftmetal_tpu.parallel.extraction import make_mesh
    from siftmetal_tpu.parallel.distributed_ba import shard_ba_problem
    from siftmetal_tpu.slam.ba import (
        GroupedObs,
        finish_step,
        grouped_cost,
        schur_pieces,
    )

    mesh = make_mesh(n_dev)
    problem = _synthetic_ba(n_cam, n_dev * lm_per_device)
    sharded = shard_ba_problem(problem, n_dev)

    merge = lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
    cam_g = merge(sharded.cam)
    uv_g = merge(sharded.uv)
    val_g = merge(sharded.valid)
    lms0 = merge(sharded.landmarks)

    def ba_shard(cameras, landmarks, cam_g, uv_g, val_g, k, fixed):
        c_n = cameras.shape[0]
        g = GroupedObs(
            cam=cam_g, uv=uv_g, valid=val_g, dropped=jnp.int32(0)
        )

        def body(_, state):
            cams, lms, lam = state
            with jax.default_matmul_precision("highest"):
                hcc, cross, rhs, hll_inv, G, b_l = schur_pieces(
                    cams, lms, k, g, c_n, lam, 1e12, fixed[0]
                )
                hcc = lax.psum(hcc, "batch")
                cross = lax.psum(cross, "batch")
                rhs = lax.psum(rhs, "batch")
                d_cam, d_lm = finish_step(
                    hcc, cross, rhs, hll_inv, G, b_l, g.cam, c_n, lam,
                    fixed[0],
                )
            return cams + d_cam, lms + d_lm, lam

        cams, lms, _ = lax.fori_loop(
            0, 10, body, (cameras, landmarks, jnp.float32(1e-4))
        )
        return lax.psum(grouped_cost(cams, lms, k, g, 0.0), "batch")

    spmd = jax.shard_map(
        ba_shard,
        mesh=mesh,
        in_specs=(
            P(), P("batch"), P("batch"), P("batch"), P("batch"), P(), P(),
        ),
        out_specs=P(),
        check_vma=False,
    )

    def step(cams):
        return spmd(
            cams, lms0, cam_g, uv_g, val_g, sharded.k, sharded.fixed_cameras
        ).astype(jnp.float32)

    dt = _bench_loop(step, (sharded.cameras,), iters)
    return iters / dt


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--devices", default="1,2,4,8",
        help="comma-separated device counts (default 1,2,4,8)",
    )
    ap.add_argument(
        "--tasks", default="extract,ba", help="subset of extract,ba"
    )
    ap.add_argument("--frames-per-device", type=int, default=2)
    ap.add_argument("--landmarks-per-device", type=int, default=512)
    ap.add_argument("--cameras", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    args = ap.parse_args()

    counts = [int(c) for c in args.devices.split(",")]
    virtual = _setup_backend(max(counts))
    import jax

    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    backend = jax.default_backend()

    for task in args.tasks.split(","):
        results = {}
        for n in counts:
            if task == "extract":
                thr = bench_extract(
                    n, args.frames_per_device, args.iters,
                    args.height, args.width,
                )
                unit = "frames/s"
            elif task == "ba":
                thr = bench_ba(
                    n, args.landmarks_per_device, args.iters, args.cameras
                )
                unit = "solves/s"
            else:
                raise SystemExit(f"unknown task {task!r}")
            results[n] = thr
            print(
                json.dumps(
                    {
                        "task": task,
                        "n_devices": n,
                        "throughput": round(thr, 3),
                        "unit": unit,
                        "backend": backend,
                        "virtual": virtual,
                        "weak_scaling": True,
                    }
                ),
                flush=True,
            )
        base = results.get(1)
        if base:
            eff = {
                str(n): round(results[n] / (n * base), 3) for n in results
            }
            print(
                json.dumps(
                    {
                        "task": task,
                        "efficiency_vs_1dev": eff,
                        "backend": backend,
                        "virtual": virtual,
                        "note": (
                            "virtual CPU devices time-share host cores; "
                            "hardware efficiency requires a real slice"
                            if virtual
                            else "hardware figure"
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
