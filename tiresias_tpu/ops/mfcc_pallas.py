"""Fused Pallas MFCC fingerprint kernel (TPU hot path).

One kernel computes the whole per-frame chain of the reference's aubio loop
(/root/reference/src/fp_handler.c:632-661) without touching HBM between
stages:

    frames [R, 512] ─ window ─ DFT-as-matmul (MXU) ─ |·| ─ mel (MXU)
        ─ safe_log10 ─ DCT (MXU) ─ 10·log10|·| → [R, n_coefs]

Design notes:
  * The 512-point rFFT becomes two f32 matmuls against precomputed cosine /
    sine matrices — the MXU eats 512×384 GEMMs; XLA's TPU FFT path does not
    pipeline as well and forces an HBM round-trip before the mel matmul.
    Only magnitudes are needed downstream, so phase loss is irrelevant.
  * All operand minor dims are padded to lane multiples (257 bins → 384,
    40 filters → 128, n_coefs → 128) with **zero columns/rows**, which keeps
    results exact: zero DFT columns produce zero magnitudes, zero mel rows
    ignore them, zero DCT rows ignore the padded log-mel columns.
  * Grid covers row tiles of 256 frames; each tile's working set
    (frames 512 KB + matrices ~1.9 MB) fits VMEM comfortably.
  * Framing (overlapping windows): long signals assemble frames INSIDE the
    kernel — each tile DMAs its hop-sized PCM chunks from HBM and builds
    the 2x-overlapped frames in VMEM (overlapping reads are not
    expressible with one BlockSpec, so the chunk slice comes via manual
    async copy). Reading each sample once instead of materialising the 2x
    frame tensor through HBM is ~21% faster end-to-end and bitwise
    identical. Short signals (a whole row tile of padding would outweigh
    the saving) keep XLA-side framing with rows packed densely across the
    batch.

Numerics match :mod:`tiresias_tpu.ops.mfcc_jax` (same safe_log10 handling of
TPU subnormal flushing, PARITY.md §2) and are golden-tested against the
float64 aubio re-derivation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiresias_tpu.config import DspConfig
from tiresias_tpu.ops.dct import dct_matrix
from tiresias_tpu.ops.melbank import mel_filterbank
from tiresias_tpu.ops.mfcc_jax import _FLOOR_THRESHOLD, _LOG10_FLOOR, frames_from_pcm
from tiresias_tpu.ops.windows import hanningz

ROW_TILE = 256
LANE = 128


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.lru_cache(maxsize=16)
def pallas_constants(
    dsp: DspConfig, samplerate: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(dft_re [win, Kp], dft_im [win, Kp], mel_T [Kp, Fp], dct_T [Fp, Cp]).

    The window is folded into the DFT matrices (w[n]·e^{-2πikn/N} — one
    matmul fewer in the kernel). Padding columns/rows are exact zeros.
    """
    win = dsp.buf_size
    n_bins = dsp.n_bins
    kp = _pad_to(n_bins, LANE)
    fp = _pad_to(dsp.n_filters, LANE)
    cp = _pad_to(dsp.n_coefs, LANE)

    n = np.arange(win)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / win
    w = hanningz(win, dtype=np.float64)[:, None]
    dft_re = np.zeros((win, kp), np.float32)
    dft_im = np.zeros((win, kp), np.float32)
    dft_re[:, :n_bins] = (w * np.cos(ang)).astype(np.float32)
    dft_im[:, :n_bins] = (w * np.sin(ang)).astype(np.float32)

    mel = mel_filterbank(dsp.n_filters, win, samplerate)  # [F, n_bins]
    mel_t = np.zeros((kp, fp), np.float32)
    mel_t[:n_bins, : dsp.n_filters] = mel.T.astype(np.float32)

    dct = dct_matrix(dsp.n_filters, dsp.n_coefs)  # [C, F]
    dct_t = np.zeros((fp, cp), np.float32)
    dct_t[: dsp.n_filters, : dsp.n_coefs] = dct.T.astype(np.float32)
    return dft_re, dft_im, mel_t, dct_t


_device_consts_cache: dict = {}


def _device_constants(dsp: DspConfig, samplerate: int):
    """Device-resident copies of :func:`pallas_constants`.

    The constants are ~3 MB; passing fresh host arrays to the jitted
    kernel re-uploaded them on EVERY dispatch (≈21 ms over a ~140 MB/s
    host link — more than the kernel itself for a typical batch). Cached
    device arrays upload once per (dsp, samplerate); tracer/eviction
    semantics in :func:`mfcc_jax.cache_device_constants`."""
    from tiresias_tpu.ops.mfcc_jax import cache_device_constants

    def build():
        dft_re, dft_im, mel_t, dct_t = pallas_constants(dsp, samplerate)
        return (
            jnp.asarray(dft_re),
            jnp.asarray(dft_im),
            jnp.asarray(mel_t),
            jnp.asarray(dct_t),
        )

    return cache_device_constants(
        _device_consts_cache, (dsp, samplerate), build
    )


def _fast_mfcc() -> bool:
    """Opt-in reduced-precision mode (TIRESIAS_FAST_MFCC=1): default TPU
    matmul precision is ~25% faster end-to-end but drifts ±0.03 from the
    bit-exact f32 chain in the log-log fingerprint domain — only safe when
    DB and queries are BOTH built in this mode and tolerances are ≥0.1."""
    import os

    return os.environ.get("TIRESIAS_FAST_MFCC", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


def _mfcc_chain(frames, dft_re_ref, dft_im_ref, mel_ref, dct_ref, *,
                fast: bool = False):
    """The shared windowed-DFT → |·| → mel → log → DCT → 10·log10|·| body
    of BOTH kernels (frame-materialising and in-kernel-framing) — one
    definition so a numerics change cannot silently break their bitwise
    equivalence.

    HIGHEST precision on every dot: default TPU matmul truncates inputs
    to bf16, visible as ±0.03 in the log-log fingerprint domain — the
    same requirement as the XLA path (mfcc_jax.py / PARITY.md §2).
    TIRESIAS_FAST_MFCC trades that for throughput; the flag is read
    ONCE at the entry point and threaded here as a static arg — reading
    the env var at trace time would let already-traced shapes keep the
    old mode while new shapes pick up the new one, silently mixing
    precisions within one process (see _fast_mfcc)."""
    hi = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, dft_re_ref[...], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, dft_im_ref[...], preferred_element_type=jnp.float32, precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[...], preferred_element_type=jnp.float32, precision=hi)
    # safe_log10 robust to TPU subnormal flushing (mfcc_jax / PARITY.md §2)
    logm = jnp.where(
        mel >= _FLOOR_THRESHOLD,
        jnp.log10(jnp.maximum(mel, _FLOOR_THRESHOLD)),
        _LOG10_FLOOR,
    )
    coefs = jnp.dot(logm, dct_ref[...], preferred_element_type=jnp.float32, precision=hi)
    ac = jnp.abs(coefs)
    return 10.0 * jnp.where(
        ac >= _FLOOR_THRESHOLD,
        jnp.log10(jnp.maximum(ac, _FLOOR_THRESHOLD)),
        _LOG10_FLOOR,
    )


def _mfcc_kernel(frames_ref, dft_re_ref, dft_im_ref, mel_ref, dct_ref,
                 out_ref, *, fast: bool):
    out_ref[...] = _mfcc_chain(
        frames_ref[...], dft_re_ref, dft_im_ref, mel_ref, dct_ref, fast=fast
    )


@functools.partial(jax.jit, static_argnames=("interpret", "fast"))
def _mfcc_rows(
    frames: jax.Array,
    dft_re: jax.Array,
    dft_im: jax.Array,
    mel_t: jax.Array,
    dct_t: jax.Array,
    interpret: bool = False,
    fast: bool = False,
) -> jax.Array:
    """[R, win] windowless frames → [R, Cp] fingerprint values (R % 256 == 0)."""
    r, win = frames.shape
    kp = dft_re.shape[1]
    fp = mel_t.shape[1]
    cp = dct_t.shape[1]
    grid = (r // ROW_TILE,)
    return pl.pallas_call(
        functools.partial(_mfcc_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_TILE, cp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * win * (2 * kp) + 2 * r * kp * fp + 2 * r * fp * cp,
            bytes_accessed=4 * (r * win + 2 * win * kp + kp * fp + fp * cp + r * cp),
            transcendentals=2 * r * (fp + cp),
        ),
        interpret=interpret,
    )(frames, dft_re, dft_im, mel_t, dct_t)


def _framing_kernel(cur_ref, halo_ref, re_ref, im_ref, mel_ref, dct_ref,
                    out_ref, *, tile_f: int, fast: bool):
    """One row tile with IN-KERNEL framing: the tile's ``tile_f``
    hop-chunks of raw PCM plus an 8-row right halo arrive as two
    AUTO-PIPELINED BlockSpec inputs (frame f = chunks f, f+1 — the
    leading zero chunk supplies the pre-t0 halo), the overlapping
    512-sample frames are assembled in VMEM, then the same
    windowed-DFT→mel→DCT chain as :func:`_mfcc_kernel` runs. Reads each
    PCM sample ONCE instead of the 2× HBM write + 2× read of
    materialising the frame tensor, and — unlike the earlier manual
    ``make_async_copy``+wait version — Mosaic double-buffers the chunk
    fetches against compute: the serial DMA wait was ~70% of kernel
    time (99 → ~30 ns/frame), the chain itself being only ~28 ns/frame.
    Bitwise identical to the XLA framing path."""
    cur = jnp.concatenate([cur_ref[0], halo_ref[0]], axis=0)  # [tile_f+8, hop]
    shifted = pltpu.roll(cur, shift=tile_f + 7, axis=0)  # == −1 mod rows
    frames = jnp.concatenate(
        [cur[:tile_f, :], shifted[:tile_f, :]], axis=1
    )
    out_ref[...] = _mfcc_chain(
        frames, re_ref, im_ref, mel_ref, dct_ref, fast=fast
    )


@functools.partial(
    jax.jit,
    static_argnames=("hop", "win", "n_coefs", "tile_f", "interpret", "fast"),
)
def _fingerprint_framed(
    pcm: jax.Array,
    dft_re: jax.Array,
    dft_im: jax.Array,
    mel_t: jax.Array,
    dct_t: jax.Array,
    hop: int,
    win: int,
    n_coefs: int,
    tile_f: int = ROW_TILE,
    interpret: bool = False,
    fast: bool = False,
) -> jax.Array:
    """``pcm [B, S]`` float32 → ``[B, F, n_coefs]`` with framing fused into
    the kernel (no frame tensor ever touches HBM)."""
    kp = dft_re.shape[1]
    fp = mel_t.shape[1]
    cp = dct_t.shape[1]
    if tile_f % 8:
        # the halo BlockSpec addresses 8-row blocks at (ti+1)*tile_f//8;
        # a non-multiple would silently fetch the wrong rows
        raise ValueError(f"tile_f must be a multiple of 8, got {tile_f}")
    b, s = pcm.shape
    f = s // hop
    t = -(-f // tile_f)
    f_pad = t * tile_f
    # leading zero chunk = pre-t0 halo; trailing zeros up to a whole extra
    # row tile so BOTH BlockSpec views divide the chunk rows evenly (the
    # halo spec's 8-row blocks reach row t*tile_f + 8)
    pcm_p = jnp.pad(pcm, ((0, 0), (hop, (f_pad - f + tile_f - 1) * hop)))
    chunks = pcm_p.reshape(b, f_pad + tile_f, hop)
    kern = functools.partial(_framing_kernel, tile_f=tile_f, fast=fast)
    halo_blocks = tile_f // 8  # halo block index stride, in 8-row units
    out = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[
            # the tile's own tile_f chunk rows ...
            pl.BlockSpec((1, tile_f, hop), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            # ... and the next tile's first 8 rows as the right halo —
            # same array, overlapping view; Mosaic pipelines (and
            # double-buffers) both fetches like any other blocked input
            pl.BlockSpec(
                (1, 8, hop),
                lambda bi, ti: (bi, (ti + 1) * halo_blocks, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((win, kp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, kp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, fp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, cp), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_f, cp),
            functools.partial(_out_index, tiles_per_signal=t),
        ),
        out_shape=jax.ShapeDtypeStruct((b * f_pad, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f_pad * (win * 2 * kp + kp * fp + fp * cp),
            bytes_accessed=4 * (b * (f_pad + 8) * hop + 2 * win * kp
                                + kp * fp + fp * cp + b * f_pad * cp),
            transcendentals=2 * b * f_pad * (fp + cp),
        ),
        interpret=interpret,
    )(chunks, chunks, dft_re, dft_im, mel_t, dct_t)
    return out.reshape(b, f_pad, cp)[:, :f, :n_coefs]


def _out_index(bi, ti, *, tiles_per_signal):
    return (bi * tiles_per_signal + ti, 0)


def fingerprint_padded_batch_pallas(
    pcm: jax.Array | np.ndarray,
    samplerate: int,
    dsp: DspConfig | None = None,
    interpret: bool = False,
    law: str | None = None,
    n_valid: jax.Array | None = None,
) -> jax.Array:
    """Fused-kernel equivalent of
    :func:`tiresias_tpu.ops.mfcc_jax.fingerprint_padded_batch`.

    ``pcm [B, S]`` (S a multiple of hop) → ``[B, F, n_coefs]``.

    Long signals take :func:`_fingerprint_framed` (framing fused into the
    kernel); short ones — where padding the frame count up to a whole row
    tile would cost more than the saved HBM traffic — materialise frames
    with XLA and run :func:`_mfcc_rows`, which packs rows densely across
    the batch. Both are bitwise identical.
    """
    dsp = dsp or DspConfig()
    from tiresias_tpu.ops.mfcc_jax import to_float_pcm

    dft_re, dft_im, mel_t, dct_t = _device_constants(dsp, int(samplerate))
    fast = _fast_mfcc()  # read ONCE here; static through the jit caches
    from tiresias_tpu.ops.mfcc_jax import mask_valid_samples

    pcm = mask_valid_samples(to_float_pcm(jnp.asarray(pcm), law), n_valid)
    b, s = pcm.shape
    f = s // dsp.hop_size
    tiles = -(-f // ROW_TILE)
    if (
        dsp.buf_size == 2 * dsp.hop_size  # kernel assembles 2-chunk frames
        and tiles * ROW_TILE * 5 <= f * 6  # ≤20% per-signal padding waste
    ):
        return _fingerprint_framed(
            pcm, dft_re, dft_im, mel_t, dct_t,
            dsp.hop_size, dsp.buf_size, dsp.n_coefs,
            tile_f=ROW_TILE, interpret=interpret, fast=fast,
        )
    frames = frames_from_pcm(pcm, dsp.hop_size, dsp.buf_size).reshape(
        b * f, dsp.buf_size
    )
    rows = frames.shape[0]
    rows_pad = _pad_to(max(rows, ROW_TILE), ROW_TILE)
    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))
    out = _mfcc_rows(
        frames, dft_re, dft_im, mel_t, dct_t, interpret=interpret, fast=fast
    )
    return out[:rows, : dsp.n_coefs].reshape(b, f, dsp.n_coefs)
