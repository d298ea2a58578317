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


def _pinned_cpu() -> bool:
    """True when this process already pinned the CPU platform via the
    config API (the only pin a force-registering PJRT plugin honors)."""
    try:
        import jax

        return str(jax.config.jax_platforms or "").startswith("cpu")
    except Exception:  # noqa: BLE001 - jax absent/odd: nothing is pinned
        return False


def backend_alive(timeout: float = 120.0, attempts: int = 2,
                  wait: float = 60.0) -> bool:
    """True when the DEFAULT JAX backend initializes within ``timeout``
    seconds, probed in a fresh subprocess.

    A dead tunneled-PJRT relay hangs backend init *forever* (no deadline
    anywhere in the plugin path), and it hangs every thread that touches
    ``jax.devices()`` — so the only safe probe is a subprocess that can be
    killed. Returns True immediately when this process already pinned CPU
    (no relay involved). Retries ``attempts`` times ``wait`` s apart so a
    briefly-restarting relay isn't misread as dead.
    """
    if _pinned_cpu():
        return True
    import subprocess
    import sys
    import time

    code = "import jax; jax.devices(); print(jax.default_backend())"
    for i in range(attempts):
        if i:
            time.sleep(wait)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def ensure_live_backend(**probe_kw) -> str:
    """Pin CPU when the default backend is unreachable; return the
    platform actually in effect ('default' or 'cpu').

    Entry points that MUST terminate (the driver's bench and dry run) call
    this before first device use: a hung relay otherwise turns them into
    silent no-output timeouts."""
    if backend_alive(**probe_kw):
        return "default"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu"


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
