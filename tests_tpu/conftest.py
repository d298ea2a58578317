"""TPU-gated test suite.

Unlike ``tests/`` (which forces an 8-virtual-device CPU backend so sharding
logic runs anywhere), this suite runs on the REAL default backend and skips
itself entirely when that backend is not a TPU. It exists to make
"Pallas output is bit-identical to XLA on device" a tested claim rather
than a bench observation (VERDICT round-1 item 6).

Run on TPU hardware:  python -m pytest tests_tpu/ -q

A transient tunnel blip must not masquerade as a green on-chip run
(VERDICT r4 #7: one 90 s probe failure skipped all 9 smoke tests with
exit 0, then passed a minute later): the backend probe now RETRIES, and
``TIRESIAS_TPU_REQUIRED=1`` makes a fully-skipped suite exit non-zero —
set it on the release gate.
"""

import os

import numpy as np
import pytest

_ALL_SKIPPED_REASON: str | None = None


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
    global _ALL_SKIPPED_REASON
    from tiresias_tpu.utils.platform import backend_alive, is_tpu

    # a dead tunnel relay hangs backend init forever — probe bounded
    # BEFORE is_tpu() touches jax.devices(), so the suite skips instead
    # of freezing collection. THREE attempts: a transient blip skipped
    # the whole suite in round 4 and the backend answered 60 s later —
    # a retried probe is cheap next to a silently-green release gate.
    if os.environ.get("_TIRESIAS_TPU_PROBE_DEAD"):
        # test hook: tests/test_backend_probe.py rehearses the release
        # gate's fully-skipped shape without a dead relay to hand
        _ALL_SKIPPED_REASON = "forced dead by _TIRESIAS_TPU_PROBE_DEAD"
    elif not backend_alive(timeout=90.0, attempts=3):
        _ALL_SKIPPED_REASON = "default backend unreachable (3 probes)"
    elif not is_tpu():
        _ALL_SKIPPED_REASON = "requires a real TPU backend"
    else:
        return
    skip = pytest.mark.skip(reason=_ALL_SKIPPED_REASON)
    for item in items:
        item.add_marker(skip)


def pytest_sessionfinish(session, exitstatus):
    # strict mode for the release gate: a run where EVERY test skipped
    # (dead relay, wrong backend) must not exit 0 — indistinguishable
    # from a pass in CI otherwise
    if _ALL_SKIPPED_REASON and os.environ.get("TIRESIAS_TPU_REQUIRED"):
        print(
            f"\ntests_tpu: FAILING a fully-skipped run "
            f"({_ALL_SKIPPED_REASON}) because TIRESIAS_TPU_REQUIRED is set",
        )
        session.exitstatus = 1


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(20260816)
