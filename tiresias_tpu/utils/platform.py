"""Backend detection for kernel dispatch."""

from __future__ import annotations

import os


def is_tpu() -> bool:
    """True when the default JAX backend is a TPU (including tunneled PJRT
    plugins whose platform string differs, e.g. 'axon' exposing 'TPU v5'
    devices) and Pallas kernels are not disabled via TIRESIAS_NO_PALLAS.

    GPUs and CPUs return False — the Pallas kernels here use pltpu memory
    spaces and must not be dispatched on other backends.
    """
    if os.environ.get("TIRESIAS_NO_PALLAS"):
        return False
    try:
        import jax

        dev = jax.devices()[0]
    except Exception:  # noqa: BLE001 - no backend at all
        return False
    text = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
    return "tpu" in text
