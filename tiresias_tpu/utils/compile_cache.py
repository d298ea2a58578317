"""Persistent XLA compilation cache.

The framework's CLI and serving entry points run as separate processes; on
TPU, first-time XLA compiles of the fingerprint/match graphs can be slow
(and, over remote-compile transports, occasionally pathologically so).
Enabling JAX's persistent compilation cache makes every process after the
first reuse the compiled executables from disk.

The reference has no analogue — it is C compiled ahead of time; this is the
JIT-world equivalent of shipping a compiled module.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/tiresias_tpu/jax")
_enabled = False


def enable_compilation_cache(directory: str | None = None) -> None:
    """Idempotently enable the on-disk compilation cache.

    Respects an externally-set ``JAX_COMPILATION_CACHE_DIR``; the
    ``TIRESIAS_NO_COMPILE_CACHE`` env var disables entirely.
    """
    global _enabled
    if _enabled or os.environ.get("TIRESIAS_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        path = (
            directory
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_DIR
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
