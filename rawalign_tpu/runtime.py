"""Runtime helpers: compilation cache and transfer utilities.

The TPU in this environment sits behind a high-latency tunnel
(~60 ms per host<->device round trip) and compiles are expensive, so:

* the persistent compilation cache is enabled process-wide (compiled
  executables survive across runs — critical for short benchmark runs);
* hosts fetch device results with ONE device_get per pipeline stage
  rather than per-array np.asarray calls.
"""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "RAWALIGN_JAX_CACHE", "/tmp/rawalign_tpu_jax_cache"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    _CACHE_ENABLED = True
