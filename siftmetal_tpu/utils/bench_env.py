"""Shared benchmark environment setup for the remote-TPU (axon) tunnel.

Two fixed costs dominate cold benchmark wall time through the tunnel and
both are mitigated here (measured 2026-08-20, bench.py: 6 m 50 s -> 4 m
25 s cold, and warm re-runs drop the compile entirely):

  1. The FIRST device->host fetch in a process pays a one-time tunnel
     warm-up of 2-6+ minutes (later fetches: ~25 ms). ``setup()`` issues
     a 4-byte fetch on a daemon thread immediately, so the warm-up
     overlaps tracing + compilation instead of serializing after them.
  2. XLA/Mosaic compilation. ``setup()`` points JAX's persistent
     compilation cache at <repo>/.jax_cache (committed warm; re-warm
     after changing any compiled program: ``python bench.py`` writes it).

Keep this importable before any other jax use in a benchmark
(jax.config.update is safe pre- and post-backend-init for these keys).
"""

from __future__ import annotations

import pathlib
import threading

_REPO = pathlib.Path(__file__).resolve().parent.parent.parent


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache + start the device->host
    tunnel warm-up fetch on a daemon thread. Idempotent; harmless on
    local (CPU) backends."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", cache_dir or str(_REPO / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    def _warm() -> None:
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.zeros((1,)))

    threading.Thread(target=_warm, daemon=True).start()
