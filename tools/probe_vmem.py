"""Hardware probe for the fused matchers' VMEM budget model.

The dispatch gates in :mod:`tiresias_tpu.ops.match_pallas` rest on a
measured VMEM model (``_VMEM_MATCH_BUDGET`` and ``_aligned_rows``): shapes
the model admits must compile and run under real Mosaic, shapes just past
the modeled hardware ceiling are expected to fail. Whenever a kernel's
scratch layout changes (e.g. the sliding-window accumulator and its
carried-copy term), re-run this probe ON THE REAL CHIP and adjust the
model if any ADMIT shape fails or a clear margin opens up.

Usage:  python tools/probe_vmem.py          (needs a TPU backend)

Prints one line per probe: PASS/FAIL vs the gate's expectation. Exit code
0 iff every probe matches the model's prediction.
"""

from __future__ import annotations

import sys

import numpy as np


def probes():
    """(name, t, f, coefs, aligned) — shapes bracketing the model."""
    return [
        # aligned monolithic: near the ceiling from below
        ("aligned mono 3072x937", 3072, 937, 2, True),
        # aligned sliding: chunked shapes the gate admits
        ("aligned slide 4096x937@8", 4096, 937, 8, True),
        ("aligned slide 32768x93", 32768, 93, 2, True),
        # window-dominated sliding: ~8000 rows of carry-over per slide
        # (chunk 1024, o_buf 9024 — the carried-copy term dominates)
        ("aligned wide-window 8192x8000", 8192, 8000, 2, True),
        # bag kernel near its ceiling
        ("bag 4096x64", 4096, 64, 2, False),
    ]


def run_probe(t: int, f: int, coefs: int, aligned: bool) -> tuple[bool, str]:
    """Returns (ran_ok, detail). Compile+run the kernel at the shape."""
    import jax.numpy as jnp

    from tiresias_tpu.ops import match_jax
    from tiresias_tpu.ops.match_pallas import search_batch_pallas
    from tiresias_tpu.ops.mfcc_jax import PAD_VALUE

    rng = np.random.default_rng(3)
    a = 128
    db = rng.uniform(-40, 25, size=(a, t, max(coefs, 2))).astype(np.float32)
    n_frames = rng.integers(t // 2, t, size=a)
    mask = np.arange(t)[None, :] < n_frames[:, None]
    db = np.where(mask[:, :, None], db, PAD_VALUE).astype(np.float32)
    valid = int(n_frames[3])
    q = db[3, 16 : 16 + f][None].copy()
    if 16 + f > valid:
        # the slice would include PAD_VALUE frames beyond the audio's
        # valid length: the value-encoded Pallas matcher and the masked
        # XLA matcher legitimately diverge on such a query (pad frames
        # "match" pad frames by value) — synthesize real values instead
        q = np.concatenate(
            [db[3, 16:valid][None],
             rng.uniform(-40, 25, size=(1, f - (valid - 16), max(coefs, 2)))],
            axis=1,
        ).astype(np.float32)
    try:
        best, count, votes = search_batch_pallas(
            jnp.asarray(db), q, None, coefs=coefs, tolerance=0.1,
            trunc_coef1=False, aligned=aligned,
        )
        votes_np = np.asarray(votes)
    except Exception as exc:  # noqa: BLE001 - Mosaic/XLA compile failures
        return False, f"{type(exc).__name__}: {str(exc)[:120]}"
    # cheap correctness spot check vs the XLA matcher
    _, _, votes_x = match_jax.search_batch(
        jnp.asarray(db), jnp.asarray(mask), q, None, coefs=coefs,
        tolerance=0.1, trunc_coef1=False, aligned=aligned,
    )
    if not np.array_equal(votes_np, np.asarray(votes_x)):
        return False, "ran but votes diverge from the XLA matcher"
    return True, f"ok (top votes {int(votes_np.max())})"


def main() -> int:
    from tiresias_tpu.ops.match_pallas import (
        aligned_kernel_fits,
        bag_kernel_fits,
    )
    from tiresias_tpu.utils.platform import backend_alive, is_tpu

    # bounded probe BEFORE is_tpu() touches jax.devices(): a dead tunnel
    # relay would hang this tool forever instead of exiting 2
    if not backend_alive(timeout=90.0, attempts=1) or not is_tpu():
        print("probe_vmem: needs a real TPU backend", file=sys.stderr)
        return 2

    failures = 0
    for name, t, f, coefs, aligned in probes():
        admits = (
            aligned_kernel_fits(t, f, coefs)
            if aligned
            else bag_kernel_fits(t, f, coefs)
        )
        if not admits:
            print(f"[probe] {name}: gate REJECTS (model over budget) — "
                  "skipped; widen the model if hardware headroom exists")
            continue
        ok, detail = run_probe(t, f, coefs, aligned)
        verdict = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"[probe] {name}: gate admits -> {verdict} ({detail})")
    if failures:
        print(f"probe_vmem: {failures} admitted shape(s) failed on "
              "hardware — tighten _VMEM_MATCH_BUDGET/_aligned_rows",
              file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
