"""Matcher throughput microbenchmark (run on TPU; honest chained timing).

Reports exact 2-NN matching rates for typical set sizes — the workload the
reference's trie ANN existed to accelerate on CPU (Utilities/Trie.swift);
on the MXU the EXACT matmul matcher covers it with headroom.

Usage: python benchmarks/matching_bench.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from siftmetal_tpu.utils.bench_env import setup as _setup_bench_env

_setup_bench_env()  # persistent compile cache + tunnel warm-up thread

import jax
import jax.numpy as jnp
from jax import lax


def bench(q_n, t_n, iters=30):
    from siftmetal_tpu.match.matcher import match_bruteforce

    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.integers(0, 200, (q_n, 128)).astype(np.uint8))
    tf = jnp.asarray(rng.integers(0, 200, (t_n, 128)).astype(np.uint8))
    qv = jnp.ones(q_n, bool)
    tv = jnp.ones(t_n, bool)

    for name, fn in [
        ("exact", match_bruteforce),
    ]:
        @jax.jit
        def loop(qf):
            def body(_, carry):
                qf, acc = carry
                m = fn(qf, tf, qv, tv)
                acc = acc + m.count
                qf = (qf.astype(jnp.int32) + acc % 2).astype(jnp.uint8)
                return qf, acc
            return lax.fori_loop(0, iters, body, (qf, jnp.int32(0)))[1]

        _ = int(np.asarray(loop(qf)))
        t0 = time.perf_counter()
        _ = int(np.asarray(loop(qf)))
        dt = (time.perf_counter() - t0) / iters
        rate = q_n / dt / 1e6
        print(
            f"{name:9s} {q_n:5d} x {t_n:6d}: {dt*1e3:7.3f} ms "
            f"({rate:6.1f} M queries/s)",
            flush=True,
        )


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend())
    sizes = [(2048, 2048), (4096, 8192), (4096, 65536)]
    if "--map-scale" in sys.argv:
        # The trie-removal measurement (PARITY.md): exact 2-NN vs a
        # map-scale target set. 4096 x 1M uint8 descriptors = 128 MB of
        # targets + a [4096, 1M] f32 distance pass.
        sizes += [(4096, 262144), (4096, 1048576)]
    for q, t in sizes:
        bench(q, t, iters=10 if t > 100_000 else 30)
