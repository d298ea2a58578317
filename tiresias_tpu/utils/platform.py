"""Backend detection for kernel dispatch."""

from __future__ import annotations

import os


def _device_is_tpu(dev) -> bool:
    """The one platform-string rule both gates share: TPU devices are
    recognised by 'tpu' in the platform or device_kind (tunneled PJRT
    plugins report platform strings like 'axon' but device kinds like
    'TPU v5'). Honors the TIRESIAS_NO_PALLAS kill switch."""
    if os.environ.get("TIRESIAS_NO_PALLAS"):
        return False
    text = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
    return "tpu" in text


def is_tpu() -> bool:
    """True when the default JAX backend is a TPU (including tunneled PJRT
    plugins whose platform string differs, e.g. 'axon' exposing 'TPU v5'
    devices) and Pallas kernels are not disabled via TIRESIAS_NO_PALLAS.

    GPUs and CPUs return False — the Pallas kernels here use pltpu memory
    spaces and must not be dispatched on other backends.
    """
    try:
        import jax

        dev = jax.devices()[0]
    except Exception:  # noqa: BLE001 - no backend at all
        return False
    return _device_is_tpu(dev)


def mesh_is_tpu(mesh) -> bool:
    """:func:`is_tpu`'s rule applied to a mesh's devices instead of the
    default backend. Drives the shard-mapped fused-kernel dispatch: a
    CPU-simulated test mesh must run Mosaic in interpret mode, a real TPU
    mesh must not."""
    try:
        dev = mesh.devices.flat[0]
    except Exception:  # noqa: BLE001 - not a Mesh / empty
        return False
    return _device_is_tpu(dev)
