"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (the single JSON line): fingerprint throughput in
audio-hours processed per wall-clock hour on one chip (BASELINE.md north
star: >= 1000), measured with device-resident input (this dev environment
reaches the TPU through a network tunnel whose ~140 MB/s H2D bandwidth and
~30 ms dispatch RTT are artifacts; production feeds chips over local DMA).
Secondary metrics go to stderr: recognition p50 vs a 10k-track DB, 1k-clip
DB build, and 128-stream serving.

Run: python bench.py  (uses the default JAX platform — TPU when present).
"""

import json
import os
import sys
import time

import numpy as np

# Soft wall-clock budget for the whole bench run. The dev tunnel's
# remote-compile service occasionally degrades to minutes per program;
# without a budget one bad window can stall a deep section (observed:
# the 1M-track aligned config, 20s nominal, >20 min during a degraded
# window) until the driver kills the bench, losing every line after the
# stall. Sections check the budget BETWEEN configs (a blocked XLA call
# can't be interrupted, but the next one can be skipped) and print an
# explicit skip marker so a truncated bench is distinguishable from a
# crashed one.
_START = time.monotonic()


def _budget_s() -> float:
    return float(os.environ.get("TIRESIAS_BENCH_BUDGET_S", "2400"))


def over_budget(label: str) -> bool:
    """True (and prints a skip marker) when the bench is past its soft
    wall-clock budget — callers skip the labeled section/config."""
    spent = time.monotonic() - _START
    if spent <= _budget_s():
        return False
    print(
        f"[bench] {label} skipped: {spent:.0f}s spent exceeds the "
        f"{_budget_s():.0f}s soft budget (degraded dev-tunnel window; "
        "set TIRESIAS_BENCH_BUDGET_S to raise)",
        file=sys.stderr,
    )
    return True


def bench_fingerprint_throughput(small: bool = False) -> float:
    """audio-hours fingerprinted per wall-clock hour (steady state).

    ``small`` shrinks the workload for the CPU-fallback path (dead TPU
    relay): the TPU-sized batch would take tens of minutes on a host core
    and the number is explicitly non-representative there anyway."""
    import jax
    import jax.numpy as jnp

    from tiresias_tpu.config import DspConfig
    from tiresias_tpu.ops.mfcc_jax import fingerprint_padded_batch

    dsp = DspConfig()
    sr = 8000
    batch, clip_s = (8, 10.0) if small else (256, 60.0)
    n_samples = int(sr * clip_s)
    n_samples -= n_samples % dsp.hop_size
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(
        (0.3 * rng.standard_normal((batch, n_samples))).astype(np.float32)
    )

    def run():
        # dispatches to the fused Pallas kernel on TPU (mfcc_pallas)
        return fingerprint_padded_batch(pcm, sr, dsp)

    # warmup / compile, with a readback to force full sync over the tunnel
    float(np.asarray(run()[0, 0, 0]))

    iters = 3 if small else 20
    start = time.perf_counter()
    outs = [run() for _ in range(iters)]
    # sync with ONE readback: a device-side reduction over every output
    # (so all iters' compute must finish) read back as a scalar. Reading
    # o[0,0,0] per iter instead pays iters sequential host round trips —
    # ~0.5 s of pure tunnel RTT in a degraded window, which halved the
    # reported device-resident throughput on bad days.
    probe = jnp.stack([o[0, 0, 0] for o in outs]).sum()
    _ = float(np.asarray(probe))
    elapsed = time.perf_counter() - start
    audio_seconds = iters * batch * clip_s
    throughput = audio_seconds / elapsed
    print(
        f"[bench] fingerprint: {iters} iters x {batch} x {clip_s:.0f}s in "
        f"{elapsed:.2f}s -> {throughput:.0f} audio-hrs/hr (device-resident)",
        file=sys.stderr,
    )
    return throughput


_measured_link_mbs = 0.0  # MB/s, set by the host-feed section each run


def bench_fingerprint_hostfeed() -> None:
    """H2D-INCLUSIVE fingerprint throughput: int16 PCM batches streamed
    from HOST memory, transfers overlapped with compute via async dispatch
    (dispatch k+1's upload rides while k computes). The device-resident
    headline excludes the host link; this line is what a host actually
    sustains per chip — over this dev tunnel the link is ~140 MB/s, so the
    number is tunnel-bound; production DMA links are ~100x that."""
    import jax

    from tiresias_tpu.config import DspConfig
    from tiresias_tpu.ops.mfcc_jax import fingerprint_padded_batch

    dsp = DspConfig()
    sr = 8000
    batch, clip_s = 256, 60.0
    n = int(sr * clip_s)
    n -= n % dsp.hop_size
    rng = np.random.default_rng(11)
    # distinct host buffers so no transfer is cached away
    n_bufs = 4
    bufs = [
        np.clip(
            np.round(0.3 * rng.standard_normal((batch, n)) * 32768.0),
            -32768, 32767,
        ).astype(np.int16)
        for _ in range(n_bufs)
    ]
    out = fingerprint_padded_batch(bufs[0], sr, dsp)  # compile
    float(np.asarray(out[0, 0, 0]))
    iters = 8
    start = time.perf_counter()
    outs = [
        fingerprint_padded_batch(bufs[i % n_bufs], sr, dsp)
        for i in range(iters)
    ]
    _ = sum(float(np.asarray(o[0, 0, 0])) for o in outs)
    elapsed = time.perf_counter() - start
    audio_seconds = iters * batch * clip_s
    throughput = audio_seconds / elapsed
    mb = iters * batch * n * 2 / 2**20
    global _measured_link_mbs  # db build normalizes against this run's link
    _measured_link_mbs = mb / elapsed
    print(
        f"[bench] fingerprint HOST-FEED: {iters} x {batch} x {clip_s:.0f}s "
        f"int16 ({mb:.0f} MB H2D) in {elapsed:.2f}s -> {throughput:.0f} "
        f"audio-hrs/hr incl. H2D ({mb / elapsed:.0f} MB/s sustained link)",
        file=sys.stderr,
    )


def bench_search_latency(
    n_tracks: int = 10_000,
    n_rounds: int = 20,
    batches: tuple = (1, 64),
    time_build: bool = False,
    track_frames: int = 1024,
) -> float:
    """p50 per-query latency (ms) of 3-s recognition vs an n-track DB.

    One fused jit dispatch runs fingerprint → lattice match → top-1 for the
    whole query batch (the production dialplan path: coefs=1, truncation).
    Reported per-query latency uses batch 64 — serving batches queries; a
    single-dispatch B=1 number is printed too (over this dev tunnel it is
    dominated by the ~30 ms RPC round-trip, which is ~0.1 ms on local
    hardware).
    """
    import jax
    import jax.numpy as jnp

    from tiresias_tpu.config import DspConfig
    from tiresias_tpu.ops import match_jax
    from tiresias_tpu.ops.match_lattice import build_value_map, lattice_votes
    from tiresias_tpu.ops.mfcc_jax import (
        PAD_VALUE,
        _fingerprint_padded,
        dsp_constants,
    )

    dsp = DspConfig()
    sr = 8000
    rng = np.random.default_rng(1)
    t = track_frames  # 1024 ≈ 33 s of stored audio/track at hop 256, 8 kHz
    db = rng.uniform(-30, 25, size=(n_tracks, t)).astype(np.float32)
    n_frames = rng.integers(t // 2, t, size=n_tracks)
    mask = np.arange(t)[None, :] < n_frames[:, None]
    db = np.where(mask, db, PAD_VALUE).astype(np.float32)

    t_build0 = time.perf_counter()
    # host arrays: the chunked fixed-shape build — one compile per tier
    value_map = build_value_map(db, mask)
    float(np.asarray(value_map[0, 0]))  # sync
    if time_build:
        vm_mb = value_map.size * value_map.dtype.itemsize / 2**20
        print(
            f"[bench] lattice build @ {n_tracks} tracks: "
            f"{time.perf_counter() - t_build0:.1f}s for a {vm_mb:.0f} MB "
            "distance map (exact O(A*(T+K)) transform, incl. H2D)",
            file=sys.stderr,
        )

    window, mel_t, dct_t = dsp_constants(dsp, sr)
    w, m, d = jnp.asarray(window), jnp.asarray(mel_t), jnp.asarray(dct_t)
    neg_inf, pos_inf = jnp.float32(-np.inf), jnp.float32(np.inf)

    @jax.jit
    def recognize(pcm, vm, tol):
        qfp = _fingerprint_padded(pcm, w, m, d, dsp.hop_size, dsp.buf_size)
        votes = lattice_votes(
            vm, qfp[..., 0], jnp.ones(qfp.shape[:2], bool), tol,
            neg_inf, pos_inf,
        )
        return match_jax.top1(votes)

    n = 3 * sr - (3 * sr) % dsp.hop_size
    tol = jnp.float32(0.5)
    results = {}
    for batch in batches:
        pcm = jnp.asarray(
            (0.3 * rng.standard_normal((batch, n))).astype(np.float32)
        )
        int(np.asarray(recognize(pcm, value_map, tol)[0])[0])  # compile+sync
        times = []
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            int(np.asarray(recognize(pcm, value_map, tol)[0])[0])
            times.append((time.perf_counter() - t0) * 1e3 / batch)
        results[batch] = float(np.percentile(times, 50))
        print(
            f"[bench] search @ {n_tracks} tracks, batch {batch}: "
            f"p50={results[batch]:.3f} ms/query "
            f"(dispatch p90={np.percentile(times, 90) * batch:.1f} ms)",
            file=sys.stderr,
        )

    # Device-time evidence for the <10 ms batch-1 target: run K back-to-back
    # batch-1 recognitions INSIDE one jitted lax.scan, so one dispatch pays
    # the tunnel round-trip once and the chip executes K full recognitions
    # sequentially. elapsed/K is an upper bound on per-query device latency
    # (it still contains RTT/K); a real server drives the chip exactly like
    # this — pipelined dispatches, not stop-and-wait.
    k_seq = 32
    pcm_seq = jnp.asarray(
        (0.3 * rng.standard_normal((k_seq, n))).astype(np.float32)
    )
    ones1 = jnp.ones((1, n // dsp.hop_size), bool)

    @jax.jit
    def recognize_sequential(pcms, vm, tol):
        def body(carry, pcm):
            qfp = _fingerprint_padded(
                pcm[None], w, m, d, dsp.hop_size, dsp.buf_size
            )
            votes = lattice_votes(
                vm, qfp[..., 0], ones1, tol, neg_inf, pos_inf
            )
            best, count = match_jax.top1(votes)
            return carry, (best[0], count[0])

        _, outs = jax.lax.scan(body, 0, pcms)
        return outs

    int(np.asarray(recognize_sequential(pcm_seq, value_map, tol)[0])[0])
    seq_times = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        int(np.asarray(recognize_sequential(pcm_seq, value_map, tol)[0])[-1])
        seq_times.append((time.perf_counter() - t0) * 1e3)
    per_query = float(np.percentile(seq_times, 50)) / k_seq
    results["device"] = per_query
    print(
        f"[bench] search @ {n_tracks} tracks, batch 1 DEVICE-TIME: "
        f"p50={per_query:.3f} ms/query ({k_seq} sequential batch-1 "
        f"recognitions per dispatch; whole-dispatch p50="
        f"{np.percentile(seq_times, 50):.1f} ms incl. one tunnel RTT)",
        file=sys.stderr,
    )
    return results.get(64, results.get("device", 0.0))


def bench_search_scale() -> None:
    """Beyond the BASELINE DB size: device-time recognition latency and
    lattice-map build cost at 10x (100k long tracks, ~930 h of stored
    audio) and 100x (1M telephony-length clips, ~890 h)."""
    if not over_budget("search scale @100k"):
        bench_search_latency(
            n_tracks=100_000, n_rounds=10, batches=(), time_build=True
        )
    if not over_budget("search scale @1M"):
        bench_search_latency(
            n_tracks=1_000_000, n_rounds=10, batches=(), time_build=True,
            track_frames=128,  # ~4 s prompts — the telephony corpus shape
        )


def bench_lattice_prefiltered(n_tracks: int = 1_000_000, t: int = 128) -> None:
    """The certified dialplan prefilter (PARITY D19) at 1M tracks:
    uint8 bound scan → top-256 exact rescore vs the full f32 lattice
    matmul, batch-1 device-time via the sequential-scan trick.

    Corpus: wide per-frame dynamics (speech-like energy swings, σ=6 dB
    around a per-audio mean) — idiosyncratic bucket coverage, so top-1 is
    decisive and certificates hold; the uniform corpus of
    bench_search_latency ties at the top and would (correctly)
    de-certify every query. Queries are excerpts of stored audios; both
    paths run in the SAME session so the comparison shares link health."""
    import jax
    import jax.numpy as jnp

    from tiresias_tpu.ops import match_lattice as ml
    from tiresias_tpu.ops.mfcc_jax import PAD_VALUE

    key = jax.random.PRNGKey(7)
    k_mu, k_noise, k_nf = jax.random.split(key, 3)

    @jax.jit
    def gen_db():
        mu = jax.random.uniform(
            k_mu, (n_tracks, 1), jnp.float32, -40.0, 10.0
        )
        db = mu + 6.0 * jax.random.normal(
            k_noise, (n_tracks, t), jnp.float32
        )
        n_frames = jax.random.randint(k_nf, (n_tracks,), t // 2, t)
        mask = jnp.arange(t)[None, :] < n_frames[:, None]
        return jnp.where(mask, db, PAD_VALUE), mask

    db_d, mask_d = gen_db()
    vm = ml.build_value_map(db_d, mask_d)
    vmq = ml.quantize_value_map(vm)
    int(np.asarray(vmq[0, 0]))  # sync
    qf = min(56, t // 2 - 8)
    qs = np.stack(
        [np.asarray(db_d[i * 131 + 5, 4 : 4 + qf]) for i in range(8)]
    ).astype(np.float32)
    k_seq = 32
    qs_seq = jnp.asarray(np.tile(qs, (4, 1)))
    ones1 = jnp.ones((1, qf), bool)
    neg, pos = jnp.float32(-np.inf), jnp.float32(np.inf)
    tol = jnp.float32(0.1)

    @jax.jit
    def seq_full(qs, vm):
        def body(c, q):
            v = ml.lattice_votes(vm, q[None], ones1, tol, neg, pos)
            return c, v.max()

        return jax.lax.scan(body, 0, qs)[1]

    @jax.jit
    def seq_pre(qs, vm, vmq):
        def body(c, q):
            vk, idx, un, _ = ml._prefilter_core(
                vm, vmq, q[None], ones1, tol, neg, pos, None, None,
                k=ml.LATTICE_PREFILTER_K, k_min=ml.K_MIN,
                k_size=ml.K_SIZE, has_ctx=False,
            )
            m = vk.max()
            return c, (m, (m > un[0]) | (un[0] <= 0))

        return jax.lax.scan(body, 0, qs)[1]

    results = {}
    certs = None
    for name, fn in (
        ("full f32 scan", lambda: seq_full(qs_seq, vm)),
        ("prefiltered", lambda: seq_pre(qs_seq, vm, vmq)),
    ):
        out = fn()
        first = jax.tree_util.tree_leaves(out)[0]
        int(np.asarray(first)[-1])  # compile + sync
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn()
            int(np.asarray(jax.tree_util.tree_leaves(out)[0])[-1])
            ts.append((time.perf_counter() - t0) * 1e3)
        results[name] = float(np.percentile(ts, 50)) / k_seq
        if name == "prefiltered":
            certs = int(np.asarray(out[1]).sum())
    speedup = results["full f32 scan"] / results["prefiltered"]
    print(
        f"[bench] dialplan PREFILTERED @ {n_tracks} tracks (T={t}), "
        f"batch 1 DEVICE-TIME: p50={results['prefiltered']:.2f} ms/query "
        f"vs {results['full f32 scan']:.2f} full-scan ({speedup:.1f}x; "
        f"{k_seq} sequential recognitions per dispatch; certificates "
        f"{certs}/{k_seq} exact; uint8 bound map = quarter of the f32 "
        "map's read traffic)",
        file=sys.stderr,
    )


def bench_aligned_scale(n_coefs: int = 8) -> None:
    """The recommended accuracy mode (aligned voting + 8 coefs, PARITY.md
    D8/D9) as a device path at scale: batch-1 device-time p50 via the
    sequential-scan trick — the full fused Pallas kernel AND the certified
    two-stage prefilter (lattice bound → top-k exact rescore).

    Corpus: per-audio clustered coefficient values (each audio's frames
    concentrate around its own mean, like real spectra) — uniform-random
    values would make every audio hit every bound, which no real corpus
    does. Queries are noisy excerpts of stored audios."""
    import jax
    import jax.numpy as jnp

    from tiresias_tpu.config import DspConfig
    from tiresias_tpu.ops import match_jax
    from tiresias_tpu.ops.match_lattice import build_bound_maps
    from tiresias_tpu.ops.match_pallas import (
        aligned_prefiltered_votes,
        match_votes_pallas_aligned,
    )
    from tiresias_tpu.ops.mfcc_jax import PAD_VALUE

    dsp = DspConfig()
    f = 3 * 8000 // dsp.hop_size  # 3-s query, 93 frames
    # full scan measured at 100k only (it is the slow baseline the
    # prefilter replaces); the 1M config runs the prefiltered path alone;
    # the 131072-frame config exercises the sliding-window kernel on
    # hours-long tiers (~1.2 h of rows per audio — the regime the old
    # 4096-frame tier cap excluded), full scan only
    for n_tracks, t, full_scan, prefilter in (
        (100_000, 1024, True, True),
        (1_000_000, 128, False, True),
        (128, 131_072, True, False),
    ):
        if over_budget(f"aligned@{n_coefs}coefs {n_tracks}x{t} config"):
            continue
        # corpus generated ON DEVICE: multi-GB of host->device transfer
        # through the dev tunnel would dominate the whole bench otherwise
        key = jax.random.PRNGKey(7)
        k_mu, k_noise, k_nf = jax.random.split(key, 3)

        @jax.jit
        def gen_db():
            mu = jax.random.uniform(
                k_mu, (n_tracks, 1, n_coefs), jnp.float32, -25.0, 20.0
            )
            db = mu + 1.5 * jax.random.normal(
                k_noise, (n_tracks, t, n_coefs), jnp.float32
            )
            n_frames = jax.random.randint(k_nf, (n_tracks,), t // 2, t)
            mask = jnp.arange(t)[None, :] < n_frames[:, None]
            return jnp.where(mask[:, :, None], db, PAD_VALUE), mask

        db_d, mask_d = gen_db()
        jax.block_until_ready(db_d)
        # the full scan amortizes 4 recognitions per dispatch (each is
        # ~100 ms of device time); the prefiltered path runs 16 so the
        # per-query figure is device time, not a share of the ~27 ms
        # tunnel RTT (the 10k/100k/1M search lines amortize 32 the same
        # way)
        k_seq = 4
        k_seq_pref = 16
        # query frames must come from every audio's VALID region
        # (n_frames >= t//2), or the excerpt would include PAD rows and
        # weaken the winner's score
        qf = min(f, t // 2 - 8)
        q_ids = (5, 71, 901, 4242, 17, 333, 2024, 6001,
                 9, 123, 777, 3141, 42, 271, 828, 1618)
        qs_all = np.stack([
            np.asarray(db_d[i % n_tracks, 8 : 8 + qf])
            + np.random.default_rng(9).normal(0, 0.01, (qf, n_coefs))
            for i in q_ids
        ]).astype(np.float32)[:, None]
        qs = qs_all[:k_seq]

        per_query = None
        if full_scan:
            @jax.jit
            def run(qs, db_d):
                def body(carry, q):
                    qq, active, use2 = match_jax.prepare_query(
                        q, None, trunc_coef1=False
                    )
                    votes = match_votes_pallas_aligned(
                        db_d, qq, active, use2, jnp.float32(0.1),
                        coefs=n_coefs,
                    )
                    best, count = match_jax.top1(votes)
                    return carry, (best[0], count[0])

                _, outs = jax.lax.scan(body, 0, qs)
                return outs

            int(np.asarray(run(qs, db_d)[0])[0])  # compile + sync
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                int(np.asarray(run(qs, db_d)[0])[-1])
                times.append((time.perf_counter() - t0) * 1e3)
            per_query = float(np.percentile(times, 50)) / k_seq
            print(
                f"[bench] aligned@{n_coefs}coefs search @ {n_tracks} tracks "
                f"(T={t}), batch 1 DEVICE-TIME: p50={per_query:.1f} ms/query "
                f"({k_seq} sequential aligned recognitions per dispatch; "
                "fused Pallas offset-accumulation kernel, full scan)",
                file=sys.stderr,
            )

        # certified two-stage path: bound matmuls + top-k exact rescore
        if not prefilter:
            del db_d, mask_d
            continue
        t0 = time.perf_counter()
        specs, maps = build_bound_maps(db_d, mask_d)
        jax.block_until_ready(maps)
        float(np.asarray(maps[0][0, 0]))
        build_s = time.perf_counter() - t0

        @jax.jit
        def run_pref(qs, db_d, maps):
            def body(carry, q):
                qq, active, use2 = match_jax.prepare_query(
                    q, None, trunc_coef1=False
                )
                votes, cert = aligned_prefiltered_votes(
                    db_d, maps, qq, active, use2, jnp.float32(0.1),
                    specs=specs, coefs=n_coefs,
                )
                best, count = match_jax.top1(votes)
                return carry, (best[0], count[0], cert[0])

            _, outs = jax.lax.scan(body, 0, qs)
            return outs

        certs = np.asarray(run_pref(qs_all, db_d, maps)[2])  # compile + sync
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            int(np.asarray(run_pref(qs_all, db_d, maps)[0])[-1])
            times.append((time.perf_counter() - t0) * 1e3)
        per_query_p = float(np.percentile(times, 50)) / k_seq_pref
        speedup = (
            f"{per_query / max(per_query_p, 1e-9):.0f}x vs full scan; "
            if per_query is not None
            else ""
        )
        print(
            f"[bench] aligned@{n_coefs}coefs PREFILTERED @ {n_tracks} "
            f"tracks (T={t}), batch 1 DEVICE-TIME: p50={per_query_p:.1f} "
            f"ms/query ({speedup}{k_seq_pref} sequential recognitions per "
            f"dispatch; certificates {int(certs.sum())}/{len(certs)} exact; "
            f"one-off bound-map build {build_s:.1f}s)",
            file=sys.stderr,
        )

        if n_tracks == 100_000:
            # context-filtered prefilter (the reference's per-context
            # operating mode): 16 round-robin contexts, each query
            # filtered to its own audio's context — the ctx keep key must
            # not cost the prefilter its speedup
            ctx_ids_d = jnp.arange(n_tracks, dtype=jnp.int32) % 16
            cids = jnp.asarray([i % 16 for i in q_ids], jnp.int32)

            @jax.jit
            def run_ctx(qs, cids, ctx_ids_d, db_d, maps):
                def body(carry, xs):
                    q, cid = xs
                    qq, active, use2 = match_jax.prepare_query(
                        q, None, trunc_coef1=False
                    )
                    votes, cert = aligned_prefiltered_votes(
                        db_d, maps, qq, active, use2, jnp.float32(0.1),
                        specs=specs, coefs=n_coefs,
                        ctx_ids=ctx_ids_d, ctx_id=cid,
                    )
                    best, count = match_jax.top1(votes)
                    return carry, (best[0], count[0], cert[0])

                _, outs = jax.lax.scan(body, 0, (qs, cids))
                return outs

            outs = run_ctx(qs_all, cids, ctx_ids_d, db_d, maps)
            certs_c = np.asarray(outs[2])
            wins = np.asarray(outs[0])
            ok = all(
                int(w) == i % n_tracks for w, i in zip(wins, q_ids)
            )
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                int(np.asarray(
                    run_ctx(qs_all, cids, ctx_ids_d, db_d, maps)[0]
                )[-1])
                times.append((time.perf_counter() - t0) * 1e3)
            per_query_c = float(np.percentile(times, 50)) / k_seq_pref
            print(
                f"[bench] aligned@{n_coefs}coefs PREFILTERED "
                f"CTX-FILTERED @ {n_tracks} tracks (16 contexts), batch 1 "
                f"DEVICE-TIME: p50={per_query_c:.1f} ms/query "
                f"(certificates {int(certs_c.sum())}/{len(certs_c)} exact; "
                f"in-context winners {'all correct' if ok else 'WRONG'})",
                file=sys.stderr,
            )
        del db_d, mask_d, maps


def bench_engine_search(n_tracks: int = 10_000) -> None:
    """Full-stack search latency: the Tiresias engine's fused dialplan path
    (host batching + one device dispatch + result attribution), not just
    the kernel. Store populated by direct fingerprint injection."""
    import tempfile

    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import TiresiasConfig
    from tiresias_tpu.utils.audio import synth_tone

    sr = 8000
    eng = Tiresias(
        TiresiasConfig(data_dir=tempfile.mkdtemp(prefix="tir_bench_eng")),
        restore=False,
    )
    eng.create_context("c")
    rng = np.random.default_rng(3)
    for i in range(n_tracks):
        fp = rng.uniform(-30, 25, size=(128, 2)).astype(np.float32)
        eng.store.add_audio(f"t{i}", "c", fp, f"h{i:08d}")
    q = synth_tone(440, 3.0, sr)
    eng.search_pcm("c", q, sr)  # compile + view/lattice build
    for batch in (1, 64):
        qs = [q] * batch
        eng.search_pcm_batch("c", qs, sr)
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            eng.search_pcm_batch("c", qs, sr)
            times.append((time.perf_counter() - t0) * 1e3 / batch)
        print(
            f"[bench] engine search @ {n_tracks} tracks, batch {batch}: "
            f"p50={np.percentile(times, 50):.2f} ms/query full-stack "
            "(host batching + fused dispatch + attribution, incl. tunnel RTT)",
            file=sys.stderr,
        )


def bench_device_rank(n_tracks: int = 100_000) -> None:
    """The staged path's device-side top-1 vs the full-votes host
    ranking, at a scale where the [1, A] readback matters (400 KB/query
    at 100k tracks; 4 MB at 1M). Strict config (coefs=2, no truncation)
    so dispatch takes the staged path, not the single-dispatch fused
    lattice."""
    import tempfile

    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import TiresiasConfig
    from tiresias_tpu.utils.audio import synth_tone

    sr = 8000
    eng = Tiresias(
        TiresiasConfig(data_dir=tempfile.mkdtemp(prefix="tir_bench_rank")),
        restore=False,
    )
    eng.create_context("c")
    rng = np.random.default_rng(5)
    for i in range(n_tracks):
        fp = rng.uniform(-30, 25, size=(128, 2)).astype(np.float32)
        eng.store.add_audio(f"t{i}", "c", fp, f"r{i:08d}")
    q = synth_tone(440, 3.0, sr)
    kw = dict(coefs=2, tolerance=0.01, trunc_coef1=False)

    def p50(label):
        eng.search_pcm("c", q, sr, **kw)  # warm
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            eng.search_pcm("c", q, sr, **kw)
            times.append((time.perf_counter() - t0) * 1e3)
        print(
            f"[bench] device-rank @ {n_tracks} tracks, {label}: "
            f"p50={np.percentile(times, 50):.2f} ms/query full-stack",
            file=sys.stderr,
        )

    p50("device top-1 (O(B) readback)")
    saved = eng._device_ranked_batch
    eng._device_ranked_batch = lambda *a, **k: None
    try:
        p50("host ranking (full [1, A] readback)")
    finally:
        eng._device_ranked_batch = saved
    eng.close()


def bench_server_latency(
    n_tracks: int = 10_000, n_clients: int = 64, rounds: int = 8
) -> None:
    """Full-stack SERVER latency: concurrent batch-1 recognitions through
    the real TCP protocol (socket IO, JSON parse, scorer batching, fused
    dispatch, attribution, result write-back).

    Each client opens a channel, sends one complete 3-s window, and waits
    for its result; that repeats for `rounds` windows. Completion p50 is
    the wall-clock from last-byte-sent to result-received — over this dev
    tunnel it includes the ~26 ms dispatch RTT floor (BENCH r2 analysis);
    the steady-state line divides busy wall-clock by completed windows,
    which pipelining (MAX_SCORES_IN_FLIGHT) drives well below the RTT."""
    import base64
    import json as _json
    import socket
    import tempfile
    import threading

    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import TiresiasConfig
    from tiresias_tpu.serve.server import RecognitionServer

    sr = 8000
    eng = Tiresias(
        TiresiasConfig(data_dir=tempfile.mkdtemp(prefix="tir_bench_srv")),
        restore=False,
    )
    eng.create_context("c")
    rng = np.random.default_rng(5)
    for i in range(n_tracks):
        fp = rng.uniform(-30, 25, size=(128, 2)).astype(np.float32)
        eng.store.add_audio(f"t{i}", "c", fp, f"h{i:08d}")
    from tiresias_tpu.serve.server import warmup_batch_sizes

    for b in warmup_batch_sizes(n_clients):
        eng.warmup(samplerate=sr, batch_sizes=(b,))

    import asyncio

    holder: dict = {}
    started = threading.Event()

    def runner():
        async def amain():
            srv = RecognitionServer(eng, port=0, samplerate=sr)
            await srv.start()
            holder["server"] = srv
            holder["loop"] = asyncio.get_running_loop()
            started.set()
            try:
                await srv.serve_forever()
            except asyncio.CancelledError:
                pass

        asyncio.run(amain())

    threading.Thread(target=runner, daemon=True).start()
    assert started.wait(30)
    port = holder["server"].port

    window = np.clip(
        np.round(0.3 * rng.standard_normal(3 * sr) * 32768.0),
        -32768, 32767,
    ).astype("<i2")
    payload = base64.b64encode(window.tobytes()).decode()
    lat_lock = threading.Lock()
    latencies: list[float] = []

    def client(ci: int, pace_s: float = 0.0):
        pace_rng = np.random.default_rng(1000 + ci)
        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            f = s.makefile("rw", encoding="utf-8", newline="\n")
            if pace_s:
                time.sleep(float(pace_rng.uniform(0, pace_s)))  # desync
            for r in range(rounds):
                ch = f"c{ci}r{r}"
                f.write(_json.dumps({
                    "op": "open", "channel": ch, "context": "c",
                    "duration_ms": 3000,
                }) + "\n")
                f.flush()
                assert _json.loads(f.readline()).get("opened")
                msg = _json.dumps({"op": "pcm", "channel": ch,
                                   "pcm": payload}) + "\n"
                f.write(msg)
                f.flush()
                t0 = time.perf_counter()
                reply = _json.loads(f.readline())
                dt = (time.perf_counter() - t0) * 1e3
                assert "result" in reply, reply
                with lat_lock:
                    latencies.append(dt)
                if pace_s:
                    time.sleep(float(pace_rng.uniform(0.5, 1.5)) * pace_s)

    def run_phase(pace_s: float):
        latencies.clear()
        threads = [
            threading.Thread(target=client, args=(i, pace_s), daemon=True)
            for i in range(n_clients)
        ]
        t_all0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        busy = time.perf_counter() - t_all0
        return busy, list(latencies)

    # phase 1 — BURST: all clients slam at once; completion latency is
    # queueing-dominated, the steady-state quotient is the capacity number
    busy, lats = run_phase(0.0)
    total = n_clients * rounds
    print(
        f"[bench] server batch-1 @ {n_tracks} tracks: {total} recognitions "
        f"over {n_clients} concurrent TCP clients (burst); completion "
        f"p50={np.percentile(lats, 50):.1f} ms "
        f"p90={np.percentile(lats, 90):.1f} ms (queueing + tunnel RTT "
        f"floor); steady-state {busy / total * 1e3:.2f} ms/query "
        f"({total / busy:.0f} qps) with pipelined score passes",
        file=sys.stderr,
    )
    # phase 2 — PACED: ~2 requests/s/client with random phase (realistic
    # offered load well under capacity) — per-request completion latency
    # without the burst queue; over this tunnel it floors at ~RTT + tick
    busy, lats = run_phase(0.5)
    print(
        f"[bench] server batch-1 @ {n_tracks} tracks PACED "
        f"(~{2 * n_clients} rps offered): completion "
        f"p50={np.percentile(lats, 50):.1f} ms "
        f"p90={np.percentile(lats, 90):.1f} ms "
        "(scorer tick + dispatch + tunnel RTT, no queueing)",
        file=sys.stderr,
    )
    try:
        asyncio.run_coroutine_threadsafe(
            holder["server"].stop(), holder["loop"]
        ).result(timeout=15)
    except Exception:  # noqa: BLE001 - bench teardown only
        pass


def bench_db_build(n_clips: int = 1000) -> None:
    """BASELINE config #2: wall-clock to build a DB from n_clips files
    (includes host decode, hashing, batching, device fingerprint, store)."""
    import shutil
    import tempfile

    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import ContextConfig, TiresiasConfig
    from tiresias_tpu.utils.audio import synth_chirp, write_wav

    sr = 8000
    directory = tempfile.mkdtemp(prefix="tir_bench_corpus")
    data = tempfile.mkdtemp(prefix="tir_bench_data")
    try:
        rng = np.random.default_rng(2)
        for i in range(n_clips):
            pcm = synth_chirp(
                150 + (i % 211) * 9.7, 800 + (i % 113) * 21.3, 3.0, sr
            ) + 0.01 * rng.standard_normal(3 * sr).astype(np.float32)
            write_wav(f"{directory}/clip{i:05d}.wav", pcm, sr)
        eng = Tiresias(
            TiresiasConfig(
                contexts=(ContextConfig("bench", directory),), data_dir=data
            ),
            restore=False,
        )
        # Warm the ingest executables by syncing a small corpus of the same
        # clip length through the SAME code path (identical device shapes) —
        # a production service compiles once per shape and runs for days;
        # the metric is steady-state ingest, not XLA compile time (which the
        # persistent compilation cache amortizes across processes anyway).
        warm_dir = tempfile.mkdtemp(prefix="tir_bench_warm")
        warm_data = tempfile.mkdtemp(prefix="tir_bench_warmdata")
        try:
            for i in range(512):
                write_wav(
                    f"{warm_dir}/w{i:03d}.wav",
                    synth_chirp(100 + 3.1 * i, 500 + 7.3 * i, 3.0, sr), sr,
                )
            warm_eng = Tiresias(
                TiresiasConfig(
                    contexts=(ContextConfig("warm", warm_dir),),
                    data_dir=warm_data,
                ),
                restore=False,
            )
            warm_eng.sync()
        finally:
            shutil.rmtree(warm_dir, ignore_errors=True)
            shutil.rmtree(warm_data, ignore_errors=True)
        # Median of 5 trials: the dev-tunnel's host<->device RTT jitters by
        # >2x run to run (observed 1.4-4.6 s for identical work), so a single
        # trial measures the tunnel's mood, not the pipeline. Each trial is a
        # full cold sync (fresh engine + data_dir) over the same corpus.
        trials = [(time.perf_counter(), eng.sync(), time.perf_counter())]
        extra_data = []
        for _ in range(4):
            d = tempfile.mkdtemp(prefix="tir_bench_data")
            extra_data.append(d)
            e = Tiresias(
                TiresiasConfig(
                    contexts=(ContextConfig("bench", directory),), data_dir=d
                ),
                restore=False,
            )
            trials.append((time.perf_counter(), e.sync(), time.perf_counter()))
            e.close()  # release store/device state before its data dir goes
        for d in extra_data:
            shutil.rmtree(d, ignore_errors=True)
        timed = sorted((t1 - t0, r) for t0, r, t1 in trials)
        elapsed, report = timed[len(timed) // 2]
        best, best_report = timed[0]
        # the pipeline ships raw int16 PCM; the corpus' H2D bytes set a hard
        # link-bound floor on any cold sync over this transport — normalize
        # against the link speed THIS RUN measured (host-feed section), so
        # the number distinguishes pipeline overhead from transport
        h2d_mb = report.created * 3.0 * sr * 2 / 1e6
        floor = ""
        if _measured_link_mbs:
            floor_s = (h2d_mb / 1.048576) / _measured_link_mbs
            floor = (
                f"; same-run link floor {floor_s:.1f}s -> best trial at "
                f"{100 * floor_s / best:.0f}% of link speed"
            )
        print(
            f"[bench] db build: {report.created} clips x 3 s ingested in "
            f"{elapsed:.1f}s -> {report.created / elapsed:.0f} clips/s "
            f"({report.created * 3.0 / elapsed:.0f} audio-hrs/hr end-to-end "
            "incl. host decode+hash; median of 5 cold syncs, steady-state "
            f"ingest shapes pre-compiled; best trial {best:.1f}s = "
            f"{best_report.created * 3.0 / best:.0f} audio-hrs/hr; trial "
            f"spread {timed[0][0]:.1f}-{timed[-1][0]:.1f}s is dev-tunnel "
            f"jitter around the {h2d_mb:.0f} MB PCM upload this shared link "
            "carries per cold sync" + floor + ")",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(directory, ignore_errors=True)
        shutil.rmtree(data, ignore_errors=True)


def bench_streams(n_streams: int = 128, scale_streams: int = 1024) -> None:
    """BASELINE configs #3/#5: concurrent 8 kHz streams through the
    streaming scorer; must beat 1x real time per channel.

    Streams are pushed as int16 — the telephony wire format (the TCP
    protocol carries base64 int16; serve/server.py:491-493) — which the
    scorer now keeps all the way to the device (half the H2D bytes vs an
    eager float conversion; measured ~2x aggregate throughput over this
    tunnel-bound link). A second line probes the concurrency ceiling at
    ``scale_streams`` channels."""
    import tempfile

    from tiresias_tpu.api import Tiresias
    from tiresias_tpu.config import ContextConfig, TiresiasConfig
    from tiresias_tpu.serve import StreamingRecognizer
    from tiresias_tpu.utils.audio import synth_tone

    sr = 8000
    data = tempfile.mkdtemp(prefix="tir_bench_streams")
    eng = Tiresias(
        TiresiasConfig(contexts=(ContextConfig("s", "/nonexistent"),),
                       data_dir=data),
        restore=False,
    )
    for i in range(64):
        eng.add_audio_pcm("s", f"tone{i}", synth_tone(200 + 30 * i, 3.0, sr), sr)

    def run(n: int, law: str | None = None) -> tuple[int, float]:
        rec = StreamingRecognizer(eng, samplerate=sr)
        from tiresias_tpu.utils.audio import float_to_i16

        streams = [
            float_to_i16(synth_tone(200 + 30 * (i % 64), 3.2, sr))
            for i in range(n)
        ]
        if law is not None:
            from tiresias_tpu.utils.g711 import encode

            streams = [encode(p, law) for p in streams]
        # warm the compile for the full window batch shape before timing
        for i in range(n):
            rec.open(f"warm{i}", context="s", duration_ms=3000, law=law)
            rec.push(f"warm{i}", streams[i][: 3 * sr])
        rec.process_ready()
        for i in range(n):
            rec.open(f"ch{i}", context="s", duration_ms=3000, law=law)
        frame = sr // 50  # 20 ms
        results: dict = {}
        t0 = time.perf_counter()
        offset = 0
        while offset < int(3.2 * sr) and len(results) < n:
            for i in range(n):
                rec.push(f"ch{i}", streams[i][offset : offset + frame])
            offset += frame
            results.update(rec.process_ready())
        return len(results), time.perf_counter() - t0

    done, elapsed = run(n_streams)
    audio_s = n_streams * 3.0
    print(
        f"[bench] streams: {done}/{n_streams} channels x 3 s (int16 wire) "
        f"scored in {elapsed:.2f}s -> {audio_s / elapsed:.1f}x real-time "
        f"aggregate ({audio_s / elapsed / n_streams:.2f}x per channel)",
        file=sys.stderr,
    )
    if scale_streams > n_streams:
        done, elapsed = run(scale_streams)
        audio_s = scale_streams * 3.0
        print(
            f"[bench] streams SCALE: {done}/{scale_streams} channels x 3 s "
            f"(int16 wire) in {elapsed:.2f}s -> {audio_s / elapsed:.1f}x "
            f"real-time aggregate "
            f"({audio_s / elapsed / scale_streams:.2f}x per channel)",
            file=sys.stderr,
        )
        if over_budget("streams SCALE ulaw"):
            return
        # G.711 trunk bytes: HALF the per-window H2D of int16 (uint8 to
        # the device, expanded on-chip) — the telephony wire format
        done, elapsed = run(scale_streams, law="ulaw")
        print(
            f"[bench] streams SCALE ulaw: {done}/{scale_streams} channels "
            f"x 3 s (G.711 wire, uint8 H2D) in {elapsed:.2f}s -> "
            f"{audio_s / elapsed:.1f}x real-time aggregate "
            f"({audio_s / elapsed / scale_streams:.2f}x per channel)",
            file=sys.stderr,
        )


def main() -> None:
    from tiresias_tpu.utils.compile_cache import enable_compilation_cache
    from tiresias_tpu.utils.platform import ensure_live_backend

    enable_compilation_cache()
    # a dead tunnel relay hangs backend init forever — probe it with a
    # bounded subprocess and fall back to CPU (clearly marked) so the
    # driver still gets its one JSON line instead of a silent timeout
    platform = ensure_live_backend()
    if platform == "cpu":
        print(
            "[bench] WARNING: default TPU backend unreachable (relay "
            "probe timed out twice); measuring on CPU fallback — numbers "
            "are NOT representative of the chip",
            file=sys.stderr,
        )
    throughput = bench_fingerprint_throughput(small=platform == "cpu")
    # the headline JSON goes out FIRST: the dev tunnel's remote-compile
    # service occasionally degrades to minutes per program, and a bench
    # killed mid-way through the secondary sections must still have
    # reported its one machine-readable line
    baseline = 1000.0  # audio-hours/hour north star (BASELINE.md)
    line = {
        "metric": "fingerprint_throughput",
        "value": round(throughput, 1),
        "unit": "audio_hours_per_hour_per_chip",
        "vs_baseline": round(throughput / baseline, 3),
    }
    if platform == "cpu":
        line["note"] = "tpu_backend_unreachable_cpu_fallback"
    print(json.dumps(line), flush=True)
    if platform == "cpu":
        print(
            "[bench] skipping secondary benches on CPU fallback "
            "(TPU-scale workloads)",
            file=sys.stderr,
        )
        return
    for name, fn in (
        ("host-feed fingerprint", bench_fingerprint_hostfeed),
        ("search", bench_search_latency),
        ("engine search", bench_engine_search),
        ("device rank", bench_device_rank),
        ("server", bench_server_latency),
        ("db build", bench_db_build),
        ("streams", bench_streams),
        ("search scale", bench_search_scale),
        ("lattice prefiltered", bench_lattice_prefiltered),
        ("aligned scale", bench_aligned_scale),
    ):
        if over_budget(f"{name} bench"):
            continue
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 - secondary metrics must not kill bench
            print(f"[bench] {name} bench failed: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
