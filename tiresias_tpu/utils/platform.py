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


def mesh_is_tpu(mesh) -> bool:
    """True when the mesh's devices are TPUs (same platform-string rule as
    :func:`is_tpu`, applied to the mesh instead of the default backend) and
    Pallas kernels are not disabled via TIRESIAS_NO_PALLAS. Drives the
    shard-mapped fused-kernel dispatch: a CPU-simulated test mesh must run
    Mosaic in interpret mode, a real TPU mesh must not."""
    if os.environ.get("TIRESIAS_NO_PALLAS"):
        return False
    try:
        dev = mesh.devices.flat[0]
    except Exception:  # noqa: BLE001 - not a Mesh / empty
        return False
    text = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
    return "tpu" in text
