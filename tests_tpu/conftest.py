"""TPU-gated test suite.

Unlike ``tests/`` (which forces an 8-virtual-device CPU backend so sharding
logic runs anywhere), this suite runs on the REAL default backend and skips
itself entirely when that backend is not a TPU. It exists to make
"Pallas output is bit-identical to XLA on device" a tested claim rather
than a bench observation (VERDICT round-1 item 6).

Run on TPU hardware:  python -m pytest tests_tpu/ -q
"""

import numpy as np
import pytest


def pytest_configure(config):
    # the real-backend suite compiles a dozen Pallas/XLA programs; over a
    # remote-compile transport a cold run can take minutes per program, so
    # reuse the same persistent executable cache the CLI/serve entry
    # points use (utils/compile_cache.py)
    from tiresias_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # cold-cache CI tier: `pytest tests_tpu -m smoke` compiles ~1/4 of
    # the programs (one test per kernel family — MFCC, bag match,
    # lattice, aligned, engine end-to-end), bounding a cold first run;
    # the full suite is the warm-cache / release gate
    config.addinivalue_line(
        "markers", "smoke: cold-cache CI subset (one test per kernel family)"
    )


def pytest_collection_modifyitems(config, items):
    from tiresias_tpu.utils.platform import backend_alive, is_tpu

    # a dead tunnel relay hangs backend init forever — probe bounded
    # BEFORE is_tpu() touches jax.devices(), so the suite skips instead
    # of freezing collection (one attempt: a skip costs nothing)
    if not backend_alive(timeout=90.0, attempts=1):
        skip = pytest.mark.skip(reason="default backend unreachable")
        for item in items:
            item.add_marker(skip)
        return
    if is_tpu():
        return
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(20260816)
