"""Fused Pallas tolerance-vote matcher (generic search path).

Hand-fused kernel for the configurations the MXU lattice path
(:mod:`tiresias_tpu.ops.match_lattice`) cannot serve — ``coefs=2`` (the
joint per-frame condition does not factorize over the value lattice) and the
D8 no-truncation mode. Replaces :func:`tiresias_tpu.ops.match_jax.match_votes`'
blocked XLA broadcast with a kernel that keeps a DB tile resident in VMEM
while sweeping every query frame over it:

    per audio tile i (grid), per query frame f (fori):
      ok = |d0 − q0[f]| ≤ tol  [∧ (|d1 − q1[f]| ≤ tol ∨ ¬use2[f])]
      votes[i·T .. i·T+T) += any_T(ok)

One kernel invocation scores ONE query against the whole DB; the batch axis
is ``lax.map``-ed over inside the same jit (device-side launches, no host
round trips). Mosaic block-shape rules drive this design: an output block
must either tile (8k, 128k) or equal the array's trailing dims, so the
kernel owns the full ``[1, A_pad]`` output and each grid step writes its
disjoint 128-lane slice.

Masking is value-encoded, mirroring the store's layout: padding/invalid DB
frames hold ``PAD_VALUE`` (−1e6) so no tolerance band can reach them, and
inactive query frames are pre-set to ``+1e6`` on the host side — the kernel
needs no boolean operands. Semantics are identical to match_jax / the SQL
oracle (PARITY.md §3): one vote per frame per audio, inclusive band,
out-of-band max2 drops only the max2 condition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiresias_tpu.config import DEF_SEARCH_TOLERANCE
from tiresias_tpu.ops import match_jax
from tiresias_tpu.ops.mfcc_jax import PAD_VALUE

AUDIO_TILE = 128
INACTIVE_Q = 1.0e6  # pushed out of every tolerance band (PAD_VALUE is -1e6)


def _kernel_c2(q0_ref, q1_ref, use2_ref, d0_ref, d1_ref, tol_ref, out_ref):
    d0 = d0_ref[...]  # [AT, T]
    d1 = d1_ref[...]
    tol = tol_ref[0]
    f_total = q0_ref.shape[1]

    def body(f, votes):
        ok = jnp.abs(d0 - q0_ref[0, f]) <= tol
        ok1 = jnp.abs(d1 - q1_ref[0, f]) <= tol
        # use2 <= 0 → max2 condition dropped (PARITY.md §3.3)
        ok &= ok1 | (use2_ref[0, f] <= 0.0)
        # Mosaic has no bool reductions: any-over-T as an f32 max
        return votes + ok.astype(jnp.float32).max(axis=1)

    votes = jax.lax.fori_loop(
        0, f_total, body, jnp.zeros((d0.shape[0],), jnp.float32)
    )
    i = pl.program_id(0)
    out_ref[0, pl.ds(pl.multiple_of(i * AUDIO_TILE, AUDIO_TILE), AUDIO_TILE)] = votes


def _kernel_c1(q0_ref, d0_ref, tol_ref, out_ref):
    d0 = d0_ref[...]
    tol = tol_ref[0]
    f_total = q0_ref.shape[1]

    def body(f, votes):
        ok = jnp.abs(d0 - q0_ref[0, f]) <= tol
        return votes + ok.astype(jnp.float32).max(axis=1)

    votes = jax.lax.fori_loop(
        0, f_total, body, jnp.zeros((d0.shape[0],), jnp.float32)
    )
    i = pl.program_id(0)
    out_ref[0, pl.ds(pl.multiple_of(i * AUDIO_TILE, AUDIO_TILE), AUDIO_TILE)] = votes


@functools.partial(jax.jit, static_argnames=("coefs", "interpret"))
def match_votes_pallas(
    db: jax.Array,
    q: jax.Array,
    active: jax.Array,
    use2: jax.Array,
    tolerance: jax.Array | float,
    coefs: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Votes ``[B, A]`` (int32) — fused-kernel ``match_votes``.

    Args:
      db: ``[A, T, C]`` with PAD_VALUE in padding (store layout); T must be
        a multiple of 128 (the store's FRAME_BUCKET guarantees it).
      q / active / use2: from :func:`match_jax.prepare_query`.
    """
    a, t, c = db.shape
    b, f, _ = q.shape
    if coefs < 1 or coefs > min(2, c):
        raise ValueError(f"coefs must be in [1, {min(2, c)}]")
    tol = jnp.asarray(tolerance, dtype=jnp.float32).reshape(1)

    a_pad = -(-a // AUDIO_TILE) * AUDIO_TILE
    if a_pad != a:
        # padding audios hold PAD_VALUE → zero votes
        db = jnp.pad(db, ((0, a_pad - a), (0, 0), (0, 0)),
                     constant_values=PAD_VALUE)
    # value-encode the active mask: inactive query frames leave every band
    q0 = jnp.where(active, q[..., 0], INACTIVE_Q)
    n_tiles = a_pad // AUDIO_TILE
    d0 = db[..., 0]

    common = dict(
        out_shape=jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
        # the full [1, A_pad] output is the block; grid steps write
        # disjoint 128-lane slices (Mosaic block-shape constraint)
        out_specs=pl.BlockSpec((1, a_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        grid=(n_tiles,),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * f * a_pad * t * coefs,
            bytes_accessed=4 * (a_pad * t * coefs + f * 3 + a_pad),
            transcendentals=0,
        ),
    )
    # per-frame scalars are read at dynamic indices inside the fori loop —
    # that must be SMEM (Mosaic cannot prove dynamic VMEM lane alignment)
    qspec = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dspec = pl.BlockSpec(
        (AUDIO_TILE, t), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if coefs == 1:
        call = pl.pallas_call(_kernel_c1, in_specs=[qspec, dspec, tspec], **common)

        def one(q0_b):
            return call(q0_b[None, :], d0, tol)[0]

        votes = jax.lax.map(one, q0)
    else:
        d1 = db[..., 1]
        call = pl.pallas_call(
            _kernel_c2,
            in_specs=[qspec, qspec, qspec, dspec, dspec, tspec],
            **common,
        )
        use2_f = use2.astype(jnp.float32)

        def one(args):
            q0_b, q1_b, u2_b = args
            return call(
                q0_b[None, :], q1_b[None, :], u2_b[None, :], d0, d1, tol
            )[0]

        votes = jax.lax.map(one, (q0, q[..., 1], use2_f))
    return votes[:, :a].astype(jnp.int32)


def search_batch_pallas(
    db: jax.Array,
    query: np.ndarray | jax.Array,
    n_frames: np.ndarray | jax.Array | None = None,
    coefs: int = 1,
    tolerance: float = DEF_SEARCH_TOLERANCE,
    freq_ignore_low: int = -1,
    freq_ignore_high: int = -1,
    audio_filter: jax.Array | None = None,
    trunc_coef1: bool = True,
    interpret: bool = False,
):
    """Drop-in fused-kernel equivalent of ``match_jax.search_batch``.

    Takes the store-layout ``db`` (PAD_VALUE padding) directly — no mask
    operand. Returns (best [B], match_count [B], votes [B, A]).
    """
    if tolerance < 0:
        tolerance = DEF_SEARCH_TOLERANCE  # fp_handler.c:252-256
    q, active, use2 = match_jax.prepare_query(
        query, n_frames, freq_ignore_low, freq_ignore_high, trunc_coef1
    )
    votes = match_votes_pallas(
        db, q, active, use2, jnp.float32(tolerance), coefs=coefs,
        interpret=interpret,
    )
    best, count = match_jax.top1(votes, audio_filter)
    return best, count, votes
