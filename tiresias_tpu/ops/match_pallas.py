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


def _query_rows(q, active, use2, coefs: int):
    """Shared operand prep for BOTH fused matchers: query coef values with
    the active mask value-encoded into row 0 (INACTIVE_Q falls outside
    every tolerance band) plus the use2 flag as the last row — one
    definition so a masking-semantics fix cannot reach only one kernel."""
    q_rows = [jnp.where(active, q[..., 0], INACTIVE_Q)]
    q_rows += [q[..., ci] for ci in range(1, coefs)]
    q_rows.append(use2.astype(jnp.float32))
    return jnp.stack(q_rows, axis=1)


def _make_kernel(coefs: int):
    """Kernel for a static coefficient count.

    Inputs: ``q_ref [coefs+1, F]`` SMEM — rows 0..coefs-1 are the query
    values, the last row is the use2 flag (≤0 drops the coef-2 condition,
    PARITY.md §3.3); ``d_ref [coefs, AT, T]`` VMEM (coef-major so each
    coef's slice has full lane utilisation); ``tol_ref`` SMEM.
    """

    def kernel(q_ref, d_ref, tol_ref, out_ref):
        tol = tol_ref[0]
        f_total = q_ref.shape[1]
        d = [d_ref[c] for c in range(coefs)]  # [AT, T] each

        def body(f, votes):
            ok = jnp.abs(d[0] - q_ref[0, f]) <= tol
            for c in range(1, coefs):
                okc = jnp.abs(d[c] - q_ref[c, f]) <= tol
                if c == 1:
                    # use2 <= 0 → max2 condition dropped (PARITY.md §3.3);
                    # coefs > 2 (extension) uses plain AND semantics
                    okc |= q_ref[coefs, f] <= 0.0
                ok &= okc
            # Mosaic has no bool reductions: any-over-T as an f32 max
            return votes + ok.astype(jnp.float32).max(axis=1)

        votes = jax.lax.fori_loop(
            0, f_total, body, jnp.zeros((d[0].shape[0],), jnp.float32)
        )
        i = pl.program_id(0)
        out_ref[
            0, pl.ds(pl.multiple_of(i * AUDIO_TILE, AUDIO_TILE), AUDIO_TILE)
        ] = votes

    return kernel


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
    if coefs < 1 or coefs > c:
        raise ValueError(f"coefs must be in [1, {c}]")
    a_pad = -(-a // AUDIO_TILE) * AUDIO_TILE
    if not bag_kernel_fits(t, f, coefs, a_pad):
        raise ValueError(
            f"bag kernel cannot serve tier={t}, query_frames={f}, "
            f"coefs={coefs}, audios={a} within its VMEM/SMEM budgets — "
            f"use the XLA matcher (see bag_kernel_fits)"
        )
    tol = jnp.asarray(tolerance, dtype=jnp.float32).reshape(1)

    if a_pad != a:
        # padding audios hold PAD_VALUE → zero votes
        db = jnp.pad(db, ((0, a_pad - a), (0, 0), (0, 0)),
                     constant_values=PAD_VALUE)
    n_tiles = a_pad // AUDIO_TILE
    # coef-major layout [C, A_pad, T]: each coef's [AT, T] slice keeps full
    # lane utilisation (the [A, T, C] layout would put C in the lane dim)
    d_cm = jnp.moveaxis(db[..., :coefs], -1, 0)

    # query rows: coef values with the active mask value-encoded into row 0,
    # plus the use2 flag as the last row
    q_all = _query_rows(q, active, use2, coefs)  # [B, coefs+1, F]

    call = pl.pallas_call(
        _make_kernel(coefs),
        in_specs=[
            # per-frame scalars are read at dynamic indices inside the fori
            # loop — that must be SMEM (Mosaic cannot prove dynamic VMEM
            # lane alignment)
            pl.BlockSpec((coefs + 1, f), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((coefs, AUDIO_TILE, t), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
        # the full [1, A_pad] output is the block; grid steps write
        # disjoint 128-lane slices (Mosaic block-shape constraint)
        out_specs=pl.BlockSpec((1, a_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        grid=(n_tiles,),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * f * a_pad * t * coefs,
            bytes_accessed=4 * (a_pad * t * coefs + f * (coefs + 1) + a_pad),
            transcendentals=0,
        ),
    )

    def one(q_b):  # [coefs+1, F]
        return call(q_b, d_cm, tol)[0]

    votes = jax.lax.map(one, q_all)
    return votes[:, :a].astype(jnp.int32)


def _make_aligned_kernel(
    coefs: int, f_total: int, t_chunk: int, o_buf: int, n_tchunks: int
):
    """Aligned-voting kernel (PARITY.md D9 extension as a fused device path).

    Layout is TRANSPOSED vs the bag-of-frames kernel: DB tiles arrive as
    ``[coefs, T_chunk, AT]`` — time on SUBLANES, audios on lanes — because
    the offset accumulation writes ``acc[start : start+T_chunk, :] += ok``
    with a dynamic start: sublane-dim dynamic slices are cheap vector shifts
    on TPU, while lane-dim dynamic offsets force expensive relayouts. The
    aligned score is the max over offset buckets (o = t − f + F − 1) of the
    per-bucket hit count — the best single time-alignment, exactly
    :func:`tiresias_tpu.ops.match_jax.match_votes` with ``aligned=True``.

    The time axis is STREAMED over the second (fastest) grid dimension, so
    the tier length is unbounded: each step holds one ``[coefs, T_chunk,
    AT]`` db tile, and — the key observation — chunk j only touches the
    offset window ``[j·T_chunk, (j+1)·T_chunk + F − 2]``, while offsets
    below ``j·T_chunk`` are already complete. So a SLIDING accumulator of
    just ``T_chunk + F − 1`` rows suffices: at each chunk boundary the
    lowest ``T_chunk`` rows (now complete) fold into a running per-audio
    max, the window shifts down by ``T_chunk`` (static-slice vector
    copies), and its tail is re-zeroed. Within a chunk, frame f's hits
    land at window-local rows ``[F−1−f, F−1−f+T_chunk)`` — the same
    dynamic sublane slice as a monolithic kernel with T = T_chunk. VMEM
    therefore scales with the CHUNK, not the tier: hours-long audio rows
    stream through the same few-MB footprint, bit-identical to a
    full-offset accumulation (votes are non-negative, so the extra zero
    pad rows never win the max).
    """

    def kernel(q_ref, d_ref, tol_ref, out_ref, acc_ref, max_ref):
        tol = tol_ref[0]
        # program_id must be read at kernel top level (the interpret-mode
        # HLO lowering doesn't substitute it inside cond branches)
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _start():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            max_ref[:] = jnp.zeros_like(max_ref)

        if n_tchunks > 1:  # single-chunk kernels carry no slide code at all

            @pl.when(j > 0)
            def _slide():
                # offsets below j·T_chunk are complete: fold them into the
                # running max, shift the window down, zero the fresh tail
                max_ref[0, :] = jnp.maximum(
                    max_ref[0, :], acc_ref[:t_chunk, :].max(axis=0)
                )
                if o_buf > t_chunk:
                    kept = acc_ref[t_chunk:, :]  # value read pre-overwrite
                    acc_ref[: o_buf - t_chunk, :] = kept
                acc_ref[o_buf - t_chunk :, :] = jnp.zeros(
                    (t_chunk, acc_ref.shape[1]), jnp.float32
                )

        d = [d_ref[c] for c in range(coefs)]  # [T_chunk, AT] each

        def body(f, _):
            ok = jnp.abs(d[0] - q_ref[0, f]) <= tol
            for c in range(1, coefs):
                okc = jnp.abs(d[c] - q_ref[c, f]) <= tol
                if c == 1:
                    okc |= q_ref[coefs, f] <= 0.0  # PARITY.md §3.3
                ok &= okc
            acc_ref[pl.ds(f_total - 1 - f, t_chunk), :] += ok.astype(
                jnp.float32
            )
            return 0

        jax.lax.fori_loop(0, f_total, body, 0)

        @pl.when(j == n_tchunks - 1)
        def _emit():
            out_ref[
                0,
                pl.ds(pl.multiple_of(i * AUDIO_TILE, AUDIO_TILE), AUDIO_TILE),
            ] = jnp.maximum(max_ref[0, :], acc_ref[:].max(axis=0))

    return kernel


# Both fused kernels read the query as an SMEM block of (coefs+1)·F f32.
# Hardware-measured: blocks up to 450 KiB compile and run; 512 KiB is the
# budget. Larger windows fall back to the XLA matcher instead of failing
# Mosaic compilation.
_SMEM_QUERY_BUDGET = 512 * 1024
# VMEM model for the fused matchers, calibrated on hardware: the db tile
# [coefs, T, 128] costs ~3 buffers (Mosaic pipelining + layout copies)
# and the aligned kernel adds its [o_pad, 128] f32 accumulator:
#   bytes = 4 * 128 * (o_pad + 3 * coefs * T)      (o_pad = 0 for bag)
# Measured: 12.0 MiB by this model compiles and runs; 14.1 MiB fails —
# 12.5 MiB is the verified boundary. Ineligible shapes fall back to the
# (exact, slower) XLA matcher.
_VMEM_MATCH_BUDGET = 12 * 1024 * 1024 + 512 * 1024


# Value-encoded masking breaks down for absurd tolerances: INACTIVE_Q
# (1e6) and PAD_VALUE (-1e6) sit ~1e6 away from every reachable
# fingerprint value ([-417, 127]), so any tolerance approaching that gap
# would let inactive query frames and padding DB frames "match". The XLA
# matcher masks explicitly and serves such requests exactly.
PALLAS_TOL_MAX = 1e5


def pallas_query_fits(f: int, coefs: int) -> bool:
    """Whether an F-frame query fits the fused kernels' SMEM block."""
    return (coefs + 1) * f * 4 <= _SMEM_QUERY_BUDGET


def bag_kernel_fits(t: int, f: int, coefs: int, a_pad: int = 0) -> bool:
    """Whether the bag-of-frames kernel can serve (tier_frames,
    query_frames, coefs) within its VMEM/SMEM budgets — the engine's
    dispatch gate; ineligible shapes (e.g. hours-long audio tiers whose
    [coefs, T, 128] db tile exceeds VMEM) run the XLA matcher.
    ``a_pad``: padded audio-row count — the full [1, A_pad] f32 output
    block stays VMEM-resident (out_specs), an A-dependent term the db-tile
    model alone misses on very large unsharded views."""
    if not pallas_query_fits(f, coefs):
        return False
    return 4 * 128 * 3 * coefs * t + 4 * a_pad <= _VMEM_MATCH_BUDGET


def _aligned_rows(chunk: int, f: int, coefs: int, sliding: bool) -> int:
    """Per-step VMEM cost of the aligned kernel, in f32 [*, 128] rows:
    the sliding [chunk + F − 1, 128] accumulator window plus ~3 buffered
    copies of the [coefs, chunk, 128] db tile (see _VMEM_MATCH_BUDGET).
    A multi-chunk kernel's slide additionally materialises the carried
    window (the ``kept`` value read before the overlapping overwrite) —
    ``o_buf − chunk`` extra rows at its peak; single-chunk kernels emit
    no slide code (see _make_aligned_kernel) and don't pay it."""
    o_buf = -(-(chunk + f - 1) // 8) * 8
    rows = o_buf + 3 * coefs * chunk
    if sliding and o_buf > chunk:
        rows += o_buf - chunk
    return rows


def _aligned_time_chunk(
    t: int, f: int, coefs: int, a_pad: int = 0
) -> int | None:
    """Largest time-chunk length the aligned kernel can hold in VMEM for
    (tier_frames, query_frames, coefs), or None if no valid chunking
    exists. A chunk must divide T exactly (every grid step sees a full
    tile) and be a multiple of 8 (the chunk is the block's sublane dim).
    The accumulator is a sliding window of chunk + F − 1 offsets (see
    _make_aligned_kernel), so VMEM cost scales with the CHUNK, not the
    tier — any multiple-of-8 tier length is servable as long as one
    query-window's offsets (plus the slide's carried copy) fit.
    ``a_pad`` reserves the resident [1, A_pad] output block's bytes."""
    return _aligned_time_chunk_cached(
        t, f, coefs, max(0, _VMEM_MATCH_BUDGET - 4 * a_pad)
    )


@functools.lru_cache(maxsize=4096)
def _aligned_time_chunk_cached(
    t: int, f: int, coefs: int, vmem_budget: int
) -> int | None:
    """Memoized and O(divisors(t/8)): the chunk selection runs in the
    engine's dispatch gate on every search, where a linear scan over
    hours-long tiers (t ~ 10^6) would cost milliseconds per request. The
    budget is part of the cache key so tests that monkeypatch
    _VMEM_MATCH_BUDGET never see (or leave behind) stale entries."""
    budget_rows = vmem_budget // (4 * 128)
    if _aligned_rows(t, f, coefs, sliding=False) <= budget_rows:
        return t  # monolithic tile (no slide code, no carried copy)
    if t % 8 != 0:
        return None  # only the monolithic tile divides T
    if _aligned_rows(8, f, coefs, sliding=True) > budget_rows:
        return None  # one query-window of offsets alone busts VMEM
    # chunks are 8*d for divisors d of t/8 — enumerate them in O(sqrt)
    m = t // 8
    best = None
    for lo in range(1, int(m**0.5) + 1):
        if m % lo:
            continue
        for d in (lo, m // lo):
            chunk = 8 * d
            if (
                chunk < t
                and _aligned_rows(chunk, f, coefs, sliding=True)
                <= budget_rows
                and (best is None or chunk > best)
            ):
                best = chunk
    return best


def aligned_kernel_fits(
    t: int, f: int, coefs: int, a_pad: int = 0
) -> bool:
    """Whether the aligned kernel can serve (tier_frames, query_frames,
    coefs) within its VMEM/SMEM budgets — the engine's dispatch gate;
    ineligible shapes run the (exact, slower) XLA aligned matcher.
    Tier length is unbounded (the sliding-window accumulator streams
    time chunks through a fixed footprint), so this only rejects shapes
    whose single query-window of offsets busts VMEM, whose query busts
    SMEM, or whose tier has no multiple-of-8 chunking. ``a_pad`` counts
    the resident [1, A_pad] output block (see bag_kernel_fits)."""
    if not pallas_query_fits(f, coefs):
        return False
    return _aligned_time_chunk(t, f, coefs, a_pad) is not None


@functools.partial(jax.jit, static_argnames=("coefs", "interpret"))
def match_votes_pallas_aligned(
    db: jax.Array,
    q: jax.Array,
    active: jax.Array,
    use2: jax.Array,
    tolerance: jax.Array | float,
    coefs: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Aligned (offset-consistent) votes ``[B, A]`` — fused-kernel twin of
    ``match_jax.match_votes(aligned=True)``. See :func:`match_votes_pallas`
    for operand conventions."""
    a, t, c = db.shape
    b, f, _ = q.shape
    if coefs < 1 or coefs > c:
        raise ValueError(f"coefs must be in [1, {c}]")
    a_pad = -(-a // AUDIO_TILE) * AUDIO_TILE
    if not aligned_kernel_fits(t, f, coefs, a_pad):
        raise ValueError(
            f"aligned kernel cannot serve tier={t}, query_frames={f}, "
            f"coefs={coefs}, audios={a} within its VMEM/SMEM budgets — "
            f"use the XLA matcher (see aligned_kernel_fits)"
        )
    tol = jnp.asarray(tolerance, dtype=jnp.float32).reshape(1)

    if a_pad != a:
        db = jnp.pad(db, ((0, a_pad - a), (0, 0), (0, 0)),
                     constant_values=PAD_VALUE)
    n_tiles = a_pad // AUDIO_TILE
    # [C, T, A_pad]: time on sublanes (see _make_aligned_kernel)
    d_tm = jnp.transpose(db[..., :coefs], (2, 1, 0))

    q_all = _query_rows(q, active, use2, coefs)  # [B, coefs+1, F]

    t_chunk = _aligned_time_chunk(t, f, coefs, a_pad)
    n_tchunks = t // t_chunk
    # sliding accumulator window: one chunk's worth of offsets plus the
    # query span, sublane-aligned (see _make_aligned_kernel)
    o_buf = -(-(t_chunk + f - 1) // 8) * 8

    call = pl.pallas_call(
        _make_aligned_kernel(coefs, f, t_chunk, o_buf, n_tchunks),
        in_specs=[
            pl.BlockSpec((coefs + 1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((coefs, t_chunk, AUDIO_TILE), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((1, a_pad), jnp.float32),
        out_specs=pl.BlockSpec((1, a_pad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((o_buf, AUDIO_TILE), jnp.float32),  # sliding window
            pltpu.VMEM((1, AUDIO_TILE), jnp.float32),  # running per-audio max
        ],
        # time chunks on the FAST grid dim: the window in scratch is zeroed
        # at chunk 0, slid at each boundary, and the folded max is emitted
        # at the last chunk of each audio tile
        grid=(n_tiles, n_tchunks),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * f * a_pad * t * (coefs + 1),
            bytes_accessed=4 * (a_pad * t * coefs + f * (coefs + 1) + a_pad),
            transcendentals=0,
        ),
    )

    def one(q_b):  # [coefs+1, F]
        return call(q_b, d_tm, tol)[0]

    votes = jax.lax.map(one, q_all)
    return votes[:, :a].astype(jnp.int32)


PREFILTER_K = 1024  # candidates rescored exactly by the aligned kernel


@functools.partial(
    jax.jit,
    static_argnames=("specs", "coefs", "k", "interpret", "top", "aligned"),
)
def aligned_prefiltered_votes(
    db: jax.Array,
    maps: tuple,
    q: jax.Array,
    active: jax.Array,
    use2: jax.Array,
    tolerance: jax.Array | float,
    specs: tuple = (),
    coefs: int = 2,
    k: int = PREFILTER_K,
    interpret: bool = False,
    ctx_ids: jax.Array | None = None,
    ctx_id: jax.Array | int | None = None,
    top: int = 1,
    aligned: bool = True,
):
    """Aligned (or strict BAG) votes via a CERTIFIED two-stage search:
    MXU lattice bounds → top-k candidate gather → exact rescoring of the
    candidates with the requested matcher.

    The key inequalities (hold per audio, for any inputs):

      aligned_score(a) ≤ bag_votes(a)            — the best single offset's
        hit count can't exceed the any-offset hit count; and
      bag_votes(a) ≤ min_c scaled_lattice_votes_c(a)  — an aligned hit
        passes EVERY coef's tolerance test, and each coef's clipped-scaled
        distance map at s·tol+1 upper-bounds that coef's test
        (match_lattice.bound_votes) — a couple of MXU matmuls.

    ``aligned=False`` rescores candidates with the BAG matcher instead
    (the reference's own strict multi-coef configuration — coefs=2, no
    truncation, fp_handler.c:247-250,321): the chain's middle term IS
    the bag score, so the same bound certifies it a fortiori. This is
    what turns the strict config's O(B·F·A·T·C) full scan into the same
    ~A/k two-stage cost the accuracy mode gets (VERDICT r4 #6).

    So rescoring only the top-k audios BY BOUND is provably exact whenever
    ``best_rescored > max unselected bound`` (every unselected audio's
    true score ≤ its bound ≤ that max < best) — the returned
    ``certificate``. The caller falls back to the full scan when it is
    False (pathological corpora: ≥k near-duplicates of the query). Cost:
    O(B·K·A) matmuls + O(B·F·k·T·C) rescore instead of O(B·F·A·T·C) — a
    ~A/k speedup of the accuracy mode at 100k-1M tracks.

    Candidate selection uses the TPU's hardware-accelerated
    ``approx_max_k`` (a sort-based exact top-k dominates the whole search
    at 1M rows). Approximation cannot break exactness: the certificate is
    checked against the EXACT maximum over the unselected set (selected
    entries scattered out first), so a missed high-bound audio simply
    fails the certificate and triggers the full-scan fallback.

    Context filtering: ``ctx_ids`` ([A] int32 per-row context ids,
    store.ctx_ids_for) + ``ctx_id`` (traced scalar) restrict the search to
    one context's rows (the reference's per-context scan,
    /root/reference/src/fp_handler.c:308-359; here the opt-in
    ``filter_context`` extension — PARITY.md D7). Out-of-context rows get
    bound −1 (never selected above a live in-context row) and any that ARE
    selected — fewer than k in-context rows exist — rescore to 0, so the
    certificate certifies the IN-context winner against unselected
    in-context bounds only.

    ``top`` > 1 certifies a TOP-K result instead of top-1: when the
    certificate holds, every audio whose true score reaches the k-th best
    rescored score is inside the candidate set with its exact score, so
    the scattered votes yield the exact lexicographic top-``top`` listing
    (zero-vote rows never appear in a listing).

    Returns (votes [B, A] int32 — candidate scores scattered, zeros
    elsewhere; certificate [B] bool).
    """
    if not specs or len(specs) != len(maps):
        # an empty default would crash opaquely deep in tracing
        # (bound_votes' loop never runs → None flows into approx_max_k)
        raise ValueError(
            "aligned_prefiltered_votes requires matching non-empty "
            "specs/maps (store.bound_maps_for provides both)"
        )
    from tiresias_tpu.ops.match_lattice import bound_votes

    a = db.shape[0]
    b = q.shape[0]
    k = min(k, a)
    if top > k:
        # a top-k listing larger than the candidate budget cannot be
        # served exactly — the caller must full-scan instead
        raise ValueError(f"top={top} exceeds the candidate budget k={k}")
    tol = jnp.asarray(tolerance, jnp.float32)
    # band filtering is already inside `active` (computed on the raw q0 by
    # prepare_query); the bound's lattice band stays OPEN or a frame at a
    # band edge could be dropped from the bound but not from the aligned
    # score, breaking the inequality. use2 rides along so coef-1's
    # band-bypass frames count as automatic hits in the bound too.
    bound = bound_votes(specs, maps, q, active, use2, tol)  # [B, A] int32
    keep = None
    if ctx_ids is not None:
        keep = ctx_ids == jnp.asarray(ctx_id, ctx_ids.dtype)  # [A]
        bound = jnp.where(keep[None, :], bound, -1)
    _, idx = jax.lax.approx_max_k(
        bound.astype(jnp.float32), k, recall_target=0.99
    )  # [B, K] — high recall: a missed high-bound audio costs a
    # certificate failure → full-scan fallback (exact but ~10x slower)
    rows = jnp.arange(b)[:, None]
    unselected_max = bound.at[rows, idx].set(-1).max(axis=1)

    rescore = match_votes_pallas_aligned if aligned else match_votes_pallas

    def per_query(args):
        qb, ab, ub, idxb = args
        db_k = db[idxb]  # [K, T, C] candidate gather
        votes_k = rescore(
            db_k, qb[None], ab[None], ub[None], tol, coefs=coefs,
            interpret=interpret,
        )
        return votes_k[0]

    votes_k = jax.lax.map(per_query, (q, active, use2, idx))  # [B, K]
    if keep is not None:
        # an out-of-context candidate can still be selected when fewer
        # than k in-context rows exist; its true votes must not win,
        # certify, or scatter into the filtered result
        votes_k = jnp.where(keep[idx], votes_k, 0)
    # shared certification rule + candidate scatter (match_lattice):
    # every prefiltered variant — dialplan lattice, aligned, shard-mapped,
    # fused — certifies and lays out votes identically by construction
    from tiresias_tpu.ops.match_lattice import certificate, scatter_candidates

    votes = scatter_candidates(votes_k, idx, a)
    return votes, certificate(votes_k, unselected_max, top)


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
    aligned: bool = False,
    interpret: bool = False,
    with_top1: bool = True,
):
    """Drop-in fused-kernel equivalent of ``match_jax.search_batch``.

    Takes the store-layout ``db`` (PAD_VALUE padding) directly — no mask
    operand. Returns (best [B], match_count [B], votes [B, A]).
    ``aligned=True`` dispatches the offset-consistent kernel (the D9
    accuracy mode); shapes rejected by ``aligned_kernel_fits`` must use
    the XLA path."""
    if tolerance < 0:
        tolerance = DEF_SEARCH_TOLERANCE  # fp_handler.c:252-256
    if tolerance >= PALLAS_TOL_MAX:
        raise ValueError(
            f"tolerance {tolerance} breaks the fused kernels' "
            f"value-encoded masking (INACTIVE_Q/PAD_VALUE sentinels at "
            f"±1e6) — use the XLA matcher for tolerances >= {PALLAS_TOL_MAX}"
        )
    q, active, use2 = match_jax.prepare_query(
        query, n_frames, freq_ignore_low, freq_ignore_high, trunc_coef1
    )
    fn = match_votes_pallas_aligned if aligned else match_votes_pallas
    votes = fn(
        db, q, active, use2, jnp.float32(tolerance), coefs=coefs,
        interpret=interpret,
    )
    if not with_top1:
        return None, None, votes
    best, count = match_jax.top1(votes, audio_filter)
    return best, count, votes
