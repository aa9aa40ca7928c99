"""Multi-host runtime: initialization, barriers, and elastic recovery.

The reference has no failure handling at all — errors are force-unwraps
and preconditions that crash the process (SURVEY.md §5 "Failure detection
/ elastic recovery: absent"). A multi-host TPU mapping job needs:

  * coordinated startup (``jax.distributed.initialize`` + a device-level
    barrier so no host races ahead while others are still compiling),
  * periodic checkpointing of the map state (utils/checkpoint.py), and
  * a supervised step loop that turns transient worker failures into a
    restore-from-last-checkpoint instead of a dead job.

Collectives themselves need no extra failure logic: XLA collectives either
complete on all participants or the runtime surfaces an error on every
host, which the supervisor below treats as a restart signal.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Optional, Tuple

logger = logging.getLogger("siftmetal_tpu.multihost")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host job and return (process_id, num_processes).

    No-op on single-host (returns (0, 1)). Arguments default to the
    standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    environment variables, so launchers only need to export those.
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return 0, 1
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def barrier(name: str = "barrier") -> float:
    """Device-level barrier across all hosts: a tiny psum over every
    device must complete everywhere before anyone proceeds.

    The input is a GLOBAL array assembled from each process's local
    shard (``make_array_from_process_local_data``) — a plain ``jnp.ones``
    would be host-local and rejected by the global mesh under true
    multi-process SPMD. Returns the psum result (= global device count)
    so callers/tests can assert every host participated."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("all",))
    sharding = NamedSharding(mesh, P("all"))
    local = np.ones((jax.local_device_count(),), np.float32)
    garr = jax.make_array_from_process_local_data(
        sharding, local, (len(devs),)
    )
    out = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "all"),
            mesh=mesh,
            in_specs=P("all"),
            out_specs=P(),
            check_vma=False,
        )
    )(garr)
    jax.block_until_ready(out)
    logger.debug("barrier %s passed (%d devices)", name, len(devs))
    # .item() on the explicit first element: float(array-of-ndim>0) is a
    # numpy DeprecationWarning that fired on every suite run.
    return float(np.asarray(out).reshape(-1)[0])


def run_elastic(
    step_fn: Callable[[int, object], object],
    init_state: object,
    n_steps: int,
    checkpoint_every: int = 50,
    save_fn: Optional[Callable[[int, object], None]] = None,
    restore_fn: Optional[Callable[[], Optional[Tuple[int, object]]]] = None,
    max_restarts: int = 3,
    backoff_s: float = 5.0,
):
    """Supervised step loop with checkpoint/restore-based recovery.

    ``step_fn(step, state) -> state`` runs the (jitted, possibly
    collective) work; ``save_fn(step, state)`` checkpoints; ``restore_fn()``
    returns (step, state) or None. A failed step restores the last
    checkpoint and retries, up to ``max_restarts`` times — the recovery
    discipline SURVEY.md §5 calls for and the reference lacks.
    """
    state = init_state
    step = 0
    if restore_fn is not None:
        restored = restore_fn()
        if restored is not None:
            step, state = restored
            logger.info("resumed from checkpoint at step %d", step)

    restarts = 0
    while step < n_steps:
        try:
            state = step_fn(step, state)
            step += 1
            if save_fn is not None and step % checkpoint_every == 0:
                save_fn(step, state)
        except Exception:  # noqa: BLE001 — any runtime/collective failure
            restarts += 1
            logger.exception("step %d failed (restart %d)", step, restarts)
            if restarts > max_restarts:
                raise
            time.sleep(backoff_s * restarts)
            if restore_fn is not None:
                restored = restore_fn()
                if restored is not None:
                    step, state = restored
                    logger.info("restored to step %d", step)
    return step, state
