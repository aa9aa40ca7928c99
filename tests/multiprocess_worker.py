"""Worker for the 2-process jax.distributed CPU validation test.

Launched by tests/test_multiprocess.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID exported. Exercises the REAL
``jax.distributed.initialize`` path in parallel/multihost.py (the
in-suite tests can only reach the single-host no-op branch), a cross-
process device barrier, a psum collective over all processes' devices,
and an elastic step loop with one injected failure.

Prints "WORKER-OK <pid>" on success; the parent asserts both.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from siftmetal_tpu.parallel import multihost


def main() -> None:
    pid, nproc = multihost.initialize()
    assert nproc == int(os.environ["JAX_NUM_PROCESSES"]), (pid, nproc)
    assert pid == int(os.environ["JAX_PROCESS_ID"])
    assert jax.process_count() == nproc

    # The barrier's psum IS a real cross-process collective; its result
    # equals the GLOBAL device count only if every process participated.
    total = multihost.barrier("startup")
    assert int(total) == len(jax.devices()) and int(total) == 4, total

    # Elastic loop across processes with one injected transient failure.
    saved = {}
    fail_at = {3} if pid == 0 else set()

    def step_fn(step, state):
        if step in fail_at:
            fail_at.discard(step)
            raise RuntimeError("injected failure")
        return state + 1

    step, state = multihost.run_elastic(
        step_fn, 0, n_steps=5, checkpoint_every=1,
        save_fn=lambda s, st: saved.__setitem__("c", (s, st)),
        restore_fn=lambda: saved.get("c"),
        backoff_s=0.0,
    )
    assert step == 5 and state == 5

    multihost.barrier("shutdown")
    print(f"WORKER-OK {pid}", flush=True)


if __name__ == "__main__":
    main()
