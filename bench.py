"""Benchmark: flagship FM channelizer+demod chain on the TPU vs a single
CPU core (BASELINE.json headline metric: Msamples/s/chip; vs_baseline is
the speedup over the single-core numpy/scipy reference, target >= 10x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Detail (including an SNR-vs-reference correctness gate) goes to stderr.

**The primary metric times the COMPILED FLOWGRAPH** — the fm_channelizer
model with fused=True (planes-rows replay source -> mega-kernel block ->
null_sink), compiled by runtime/compile.py and stepped under lax.scan
exactly as Runner._run_scan does. The bespoke shard_map pipeline
(parallel/channelizer.py) is timed alongside and reported on stderr; the
framework's own overhead is their ratio. (Round 2 timed the bespoke
pipeline only — VERDICT r2 item #1.)

Honest-timing rules for the axon tunnel (learned the hard way):
- complex64 never crosses a program boundary (utils/cplx.py codec);
- the timed region is ONE jitted call that runs K dependent steps via
  lax.scan and returns a per-step f32 checksum — executions with complex
  boundary buffers can fail silently and return instantly, so every number
  reported here is backed by fetched f32 values checked against a float64
  numpy reference;
- the tunnel charges a large FIXED cost per dispatch (~24 ms measured,
  varies by session — see bench/exp_ksweep.py), so naive total/K
  over-reports per-step time by dispatch/K. The headline is therefore the
  two-point fit: step = (T(K2) - T(K1)) / (K2 - K1), i.e. the true
  on-device streaming rate; the dispatch cost is reported separately on
  stderr. (On a local PJRT host dispatch is ~us-scale and amortizes to
  nothing over a production stream; it is a tunnel artifact, not a
  property of the compiled program.)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

NCHANS = 64
TAPS_PER_ARM = 16
AUDIO_DECIM = 8
AUDIO_NTAPS = 65
DEMOD_GAIN = 0.5
# CPU smoke-test knobs (scripts/check.sh uses them when no TPU is attached;
# the real benchmark leaves all three unset).
INTERPRET = os.environ.get("NEWSCHED_BENCH_INTERPRET") == "1"
K1 = int(os.environ.get("NEWSCHED_BENCH_K1", "100"))
K2 = int(os.environ.get("NEWSCHED_BENCH_K2", "400"))
BATCH = int(os.environ.get("NEWSCHED_BENCH_BATCH", str(1 << 21)))
# Pinned single-core reference (cpu_fast_chain): median of 9 runs on an
# IDLE box, 2026-08-21 — spread [9.43, 10.07] Msps once two cold/loaded
# outliers settle. The per-run live remeasure swung 4.9-10 Msps with box
# load, making vs_baseline meaningless (VERDICT r3 weak #5); vs_baseline
# now uses this pin, the live number is a stderr sanity line only.
PINNED_CPU_SPS = 9.53e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _design():
    from newsched_tpu.ops import firdes

    taps = firdes.prototype_channelizer_taps(NCHANS, TAPS_PER_ARM)
    audio_taps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                                 ntaps=AUDIO_NTAPS)
    return taps, audio_taps


def rows_reference(rows: np.ndarray, taps, audio_taps,
                   return_risk: bool = False):
    """Float64 golden model of the chain over PLANES ROWS (the kernel's
    native stream format; zero pre-stream halo/state), mirroring
    ops/pfb.py + demod + per-channel audio FIR exactly.

    return_risk additionally returns a boolean audio-sample mask of
    BRANCH-CUT-AMBIGUOUS outputs: demodulating pure noise occasionally
    lands within the compute error floor of the atan2 +-pi cut (or in a
    deep |conj(prev)*Y| null), where golden and kernel legitimately
    disagree by ~2*pi — an inherent ambiguity of FM-demodulating noise,
    not a kernel error (any backend pair disagrees there). The mask
    covers the audio FIR footprint of each risky channel sample; its
    count is logged by the gate (a few per 2^21-sample batch)."""
    import scipy.signal as sig

    from newsched_tpu.ops.pfb import pfb_arm_taps

    M = NCHANS
    arm = pfb_arm_taps(taps.astype(np.float64), M)  # (M, L)
    L = arm.shape[1]
    C = rows[:, :M].astype(np.float64) + 1j * rows[:, M:].astype(np.float64)
    n_out = C.shape[0]
    V = np.concatenate([np.zeros((L - 1, M), np.complex128), C],
                       axis=0)[:, ::-1].T  # U[p, i]
    filt = np.empty((M, n_out), np.complex128)
    for p in range(M):
        filt[p] = np.correlate(V[p], arm[p][::-1], mode="valid")[:n_out]
    Y = (M * np.fft.ifft(filt, axis=0)).T  # (n_out, M)
    prev = np.vstack([np.zeros((1, M), np.complex128), Y[:-1]])
    P = np.conj(prev) * Y
    # Convention: demod against zero history emits exactly 0 (otherwise the
    # result is a signed-zero artifact — atan2(+-0, +-0) lands anywhere in
    # {0, +-pi} depending on bit signs, which no two backends agree on).
    aud = np.where((prev == 0) | (Y == 0), 0.0, np.angle(P)) * DEMOD_GAIN
    out = np.empty((n_out // AUDIO_DECIM, M), np.float64)
    for c in range(M):
        out[:, c] = sig.lfilter(audio_taps.astype(np.float64), [1.0], aud[:, c])[::AUDIO_DECIM]
    if not return_risk:
        return out
    med = np.median(np.abs(P))
    risk = ((np.abs(P.imag) < 3e-4 * np.maximum(np.abs(P.real), med * 1e-2))
            & (P.real < 0)) | (np.abs(P) < 1e-3 * med)
    A = len(audio_taps)
    spread = sig.lfilter(np.ones(A), [1.0], risk.astype(np.float64), axis=0)
    bad = (spread > 0)[::AUDIO_DECIM][: out.shape[0]]
    return out, bad


def numpy_reference(x: np.ndarray, taps, audio_taps) -> np.ndarray:
    """Float64 golden from complex samples (planes_rows layout + the
    rows-based golden)."""
    from newsched_tpu.parallel.channelizer import planes_rows

    return rows_reference(planes_rows(x, NCHANS), taps, audio_taps)


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    p = np.mean(ref**2)
    e = np.mean(err**2)
    return np.inf if e == 0 else 10 * np.log10(p / e)


def cpu_fast_chain(x: np.ndarray, taps, audio_taps) -> np.ndarray:
    """Fair single-core baseline: float32, vectorized scipy/numpy, same
    polyphase algorithm (this is also how a tuned CPU SDR implements it)."""
    import scipy.fft
    import scipy.signal as sig

    from newsched_tpu.ops.pfb import pfb_arm_taps

    M = NCHANS
    arm = pfb_arm_taps(taps.astype(np.float32), M)
    L = arm.shape[1]
    n_out = len(x) // M
    need = L - 1 + n_out
    xfull = np.concatenate([np.zeros(M * L - 1, np.complex64), x])
    U = np.ascontiguousarray(xfull[: need * M].reshape(need, M)[:, ::-1].T)  # (M, need)
    # Arm FIR as L shifted multiply-adds over contiguous views (fastest
    # numpy formulation on this machine; gathers/im2col thrash).
    arm_rev = arm[:, ::-1]
    filt = np.zeros((M, n_out), np.complex64)
    for l in range(L):
        filt += arm_rev[:, l : l + 1] * U[:, l : l + n_out]
    Y = (M * scipy.fft.ifft(filt, axis=0, workers=1)).astype(np.complex64).T
    prev = np.vstack([np.zeros((1, M), np.complex64), Y[:-1]])
    aud = (np.angle(np.conj(prev) * Y) * np.float32(DEMOD_GAIN)).astype(np.float32)
    out = sig.lfilter(audio_taps.astype(np.float32), [1.0], aud, axis=0)[::AUDIO_DECIM]
    return out


def cpu_reference_throughput(taps, audio_taps, n: int = 1 << 20) -> float:
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.5
    cpu_fast_chain(x[: n // 4], taps, audio_taps)  # warm caches
    t0 = time.perf_counter()
    cpu_fast_chain(x, taps, audio_taps)
    dt = time.perf_counter() - t0
    sps = n / dt
    log(f"cpu: {n} samples in {dt:.3f}s -> {sps/1e6:.2f} Msps (1 core, f32 "
        f"vectorized; live sanity check — pinned baseline "
        f"{PINNED_CPU_SPS/1e6:.2f} Msps is the vs_baseline denominator)")
    return sps


def _timed_two_point(run_k, label: str, B: int, n_best: int = 3):
    """Two-point dispatch-corrected fit over jitted K-step scans.
    n_best: repetitions per K (min taken) — the pinned protocol for gated
    headline rows uses 5 (BASELINE.md live-source ledger, round 5)."""
    import jax

    t0 = time.perf_counter()
    sums = run_k(K1)
    jax.block_until_ready(sums)
    log(f"{label}: compile+first {K1} steps {time.perf_counter()-t0:.1f}s; "
        f"checksum[0]={float(np.asarray(sums)[0]):.1f}")
    totals = {}
    for k in (K1, K2):
        best = np.inf
        for _ in range(n_best):
            t0 = time.perf_counter()
            sums = run_k(k)
            s = jax.device_get(sums)  # forces full completion + value fetch
            dt = time.perf_counter() - t0
            best = min(best, dt)
            assert np.all(np.isfinite(s)), f"{label}: non-finite checksums"
        totals[k] = best
    step_s = (totals[K2] - totals[K1]) / (K2 - K1)
    dispatch_s = totals[K1] - K1 * step_s
    sps = B / step_s
    naive = B * K1 / totals[K1]
    log(f"{label}: T({K1})={totals[K1]*1e3:.1f}ms T({K2})={totals[K2]*1e3:.1f}ms "
        f"-> {step_s*1e6:.1f} us/step on-device ({sps/1e6:.1f} Msps); "
        f"dispatch overhead {dispatch_s*1e3:.1f} ms/call "
        f"(naive-with-dispatch: {naive/1e6:.1f} Msps)")
    return sps


def graph_paths(taps, audio_taps, batch: int):
    """Build the fused flowgraph benchmark: returns (run_k, gate_audio_fn,
    x complex batch, B). The timed run_k executes the COMPILED FLOWGRAPH
    step (runtime/compile.py build_step output: replay source -> fused
    mega-kernel block -> null_sink checksum) under lax.scan — the same
    program Runner._run_scan runs."""
    import jax
    import jax.numpy as jnp

    from newsched_tpu import models
    from newsched_tpu.blocks import general
    from newsched_tpu.parallel.channelizer import planes_rows
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    M = NCHANS
    B = max(batch // (M * AUDIO_DECIM), 1) * M * AUDIO_DECIM
    rng = np.random.default_rng(0)
    xc = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    rows = planes_rows(xc, M)  # (B//M, 2M) f32 — the kernel's native format

    src = general.vector_source(rows, repeat=True, dtype="rf32", vlen=(2 * M,))
    fg, blks = models.fm_channelizer(
        nchans=M, taps_per_arm=TAPS_PER_ARM, audio_decim=AUDIO_DECIM,
        source=src, batch_size=B, sink="null", fused=True,
        deviation_frac=1.0 / (2 * np.pi * DEMOD_GAIN), audio_taps=audio_taps,
        interpret=INTERPRET)
    fg.validate()
    cfg = compile_flowgraph(fg, batch_size=B // M)
    assert cfg.n_out[blks["fused"].name] * AUDIO_DECIM * M == B, cfg.n_out
    step = cfg.step
    params_enc = cplx.encode(cfg.init_params())

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(params_enc, k_steps):
        params = cplx.decode(params_enc)

        def body(states, _):
            ns, sink_out = step(states, params)
            (chk,) = [v for v in sink_out.values()]
            return ns, chk

        states0 = cfg.init_states()
        _, sums = jax.lax.scan(body, states0, xs=None, length=k_steps)
        return sums

    def gate_audio():
        """First-batch audio through the SAME flowgraph shape with a
        vector_sink, via the ordinary fg.run() scan path."""
        n_aud = B // M // AUDIO_DECIM
        src2 = general.vector_source(rows, repeat=True, dtype="rf32",
                                     vlen=(2 * M,))
        fg2, blks2 = models.fm_channelizer(
            nchans=M, taps_per_arm=TAPS_PER_ARM, audio_decim=AUDIO_DECIM,
            source=src2, batch_size=B, sink="vector", n_samples=n_aud,
            fused=True, deviation_frac=1.0 / (2 * np.pi * DEMOD_GAIN),
            audio_taps=audio_taps, interpret=INTERPRET)
        fg2.run()
        return blks2["sink"].data()

    return (lambda k: run_k(params_enc, k)), gate_audio, xc, B


def live_paths(taps, audio_taps, batch: int):
    """The LIVE flagship (round 4): fm_noise_channelizer_source generates
    its own Gaussian noise inside the mega-kernel (hardware PRNG) — no
    replay buffer anywhere. Returns (run_k, gate_audio_fn, B)."""
    import jax

    from newsched_tpu import models
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    M = NCHANS
    B = max(batch // (M * AUDIO_DECIM), 1) * M * AUDIO_DECIM
    fg, blks = models.fm_channelizer(
        nchans=M, taps_per_arm=TAPS_PER_ARM, audio_decim=AUDIO_DECIM,
        source="live", batch_size=B, sink="null", fused=True,
        deviation_frac=1.0 / (2 * np.pi * DEMOD_GAIN), audio_taps=audio_taps)
    fg.validate()
    cfg = compile_flowgraph(fg, batch_size=B // (M * AUDIO_DECIM))
    step = cfg.step
    params_enc = cplx.encode(cfg.init_params())

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(params_enc, k_steps):
        params = cplx.decode(params_enc)

        def body(states, _):
            ns, sink_out = step(states, params)
            (chk,) = list(sink_out.values())
            return ns, chk

        _, sums = jax.lax.scan(body, cfg.init_states(), xs=None,
                               length=k_steps)
        return sums

    def gate_audio():
        n_aud = B // M // AUDIO_DECIM
        fg2, blks2 = models.fm_channelizer(
            nchans=M, taps_per_arm=TAPS_PER_ARM, audio_decim=AUDIO_DECIM,
            source="live", batch_size=B, sink="vector", n_samples=n_aud,
            fused=True, deviation_frac=1.0 / (2 * np.pi * DEMOD_GAIN),
            audio_taps=audio_taps)
        fg2.run()
        return blks2["sink"].data()

    return (lambda k: run_k(params_enc, k)), gate_audio, B


def live_golden_rows(B: int):
    """The live source's exact noise rows (deterministic hardware-PRNG
    stream, seed 0 / amplitude 0.5 — models' source="live" defaults),
    fetched once for the float64 golden."""
    import jax
    import jax.numpy as jnp

    from newsched_tpu.ops.pallas.noise import gaussian_rows

    z = jnp.zeros((), jnp.int32)
    rows = gaussian_rows(z, z, n_rows=B // NCHANS, width=2 * NCHANS, seed=0)
    return 0.5 * np.asarray(jax.device_get(rows))


def wbfm_paths(batch: int):
    """Config #1 same-session A/B (VERDICT r4 item #2): the STAGED,
    FUSED, and LIVE wbfm receivers timed through the compiled flowgraph
    step in ONE session so the staged/fused/live ratios are same-session
    by construction — the treatment the flagship already gets. The test
    tone is NON-HOISTABLE by construction: a nonzero-frequency fxpt NCO
    whose phase state advances every scan step (the round-4 bm rows used
    a 0 Hz default tone, which XLA could — and sometimes did — hoist out
    of the loop, making cross-session ratios incomparable).

    Returns {"staged": sps, "fused": sps, "live": sps} in input
    samples/s, each SNR-gated >= 60 dB against the float64 staged-
    semantics golden (tests/test_wbfm_fused.py golden_chain semantics).
    """
    import jax
    import scipy.signal as sig

    from newsched_tpu import models
    from newsched_tpu.blocks import analog
    from newsched_tpu.ops import firdes, nco
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    fs, fc, D, Rd, dev = 1e6, 200e3, 4, 5, 75e3
    tone = 231_250.0  # 31.25 kHz into the 100 kHz channel: nonzero audio
    unit = 64 * 8 * D * Rd  # fold width x kernel tile step (10240; also
    # a multiple of 1024, so sig_source keeps its on-chip NCO path)
    B = max(batch // unit, 1) * unit
    chan_taps = firdes.low_pass(1.0, fs, 100e3, 30e3)
    rt = firdes.low_pass(1.0, 1.0, 0.45 / Rd, 0.1 / Rd)
    gain = (fs / D) / (2 * np.pi * dev)
    dp_tone = int(nco.freq_to_dphase(tone, fs))
    dp_fc = int(nco.freq_to_dphase(fc, fs))

    def build(kind):
        src = ("live" if kind == "live"
               else analog.sig_source(fs, "complex", frequency=tone))
        fg, blks = models.wbfm_receiver(
            fs=fs, center_freq=fc, quad_rate_decim=D, audio_decim=(1, Rd),
            deviation=dev, source=src, batch_size=B, sink="null",
            fused=(kind != "staged"))
        if kind == "live":
            blks["source"].set_param("dphase", np.uint32(dp_tone))
        fg.validate()
        ref_items = B // (D * Rd) if kind == "live" else B
        cfg = compile_flowgraph(fg, batch_size=ref_items)
        step = cfg.step
        params_enc = cplx.encode(cfg.init_params())

        @functools.partial(jax.jit, static_argnames=("k_steps",))
        def run_k(params_enc, k_steps):
            params = cplx.decode(params_enc)

            def body(states, _):
                ns, sink_out = step(states, params)
                (chk,) = list(sink_out.values())
                return ns, chk

            _, sums = jax.lax.scan(body, cfg.init_states(), xs=None,
                                   length=k_steps)
            return sums

        return lambda k: run_k(params_enc, k)

    def gate(kind):
        src = ("live" if kind == "live"
               else analog.sig_source(fs, "complex", frequency=tone))
        fg, blks = models.wbfm_receiver(
            fs=fs, center_freq=fc, quad_rate_decim=D, audio_decim=(1, Rd),
            deviation=dev, source=src, batch_size=B, sink="vector",
            n_samples=B // (D * Rd), fused=(kind != "staged"))
        if kind == "live":
            blks["source"].set_param("dphase", np.uint32(dp_tone))
        fg.run()
        got = np.asarray(blks["sink"].data())
        # float64 golden on the exact fxpt tone ladder
        idx = np.arange(B, dtype=np.uint64)
        ph = 2 * np.pi * (((idx * np.uint64(dp_tone)) & np.uint64(0xFFFFFFFF)
                           ).astype(np.float64) / 2.0 ** 32)
        x_gold = np.exp(1j * ph)
        acc = (idx * np.uint64(dp_fc)) & np.uint64(0xFFFFFFFF)
        rot = np.exp(-2j * np.pi * (acc.astype(np.float64) / 2.0 ** 32))
        u = sig.lfilter(np.asarray(chan_taps, np.complex128), 1.0,
                        x_gold * rot)[::D]
        up = np.concatenate([[0.0], u[:-1]])
        p = np.conj(up) * u
        d = np.where((up == 0) | (u == 0), 0.0, np.angle(p)) * gain
        ref = sig.lfilter(np.asarray(rt, np.float64), 1.0, d)[::Rd]
        return snr_db(ref[: len(got)], got)

    out = {}
    for kind in ("staged", "fused", "live"):
        g = gate(kind)
        log(f"wbfm[{kind}]: SNR vs float64 golden = {g:.1f} dB (gate >= 60)")
        if not (np.isfinite(g) and g >= 60):
            log(f"wbfm[{kind}]: gate FAILED — row withheld")
            continue
        out[kind] = _timed_two_point(build(kind), f"wbfm {kind} flowgraph",
                                     B, n_best=5)
    if {"staged", "fused", "live"} <= out.keys():
        log(f"wbfm same-session ratios: fused/staged = "
            f"{out['fused'] / out['staged']:.2f}x, live/staged = "
            f"{out['live'] / out['staged']:.2f}x")
    return out


def fir_paths(batch: int):
    """Config #0 same-session staged/live A/B (round 5): sig_source ->
    128-tap FIR as the staged graph vs the gen-fused fir_tone_source
    kernel, both SNR-gated >= 60 dB against the float64 fxpt-tone golden.
    Returns {"staged": sps, "live": sps}."""
    import jax
    import scipy.signal as sig

    from newsched_tpu import models
    from newsched_tpu.ops import firdes, nco
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    fs, freq, ntaps = 1e6, 123_456.0, 128
    B = max(batch // 1024, 1) * 1024  # sig_source pallas + fold width
    taps = firdes.low_pass(1.0, fs, 0.2 * fs, 0.05 * fs, ntaps=ntaps)

    def build(kind):
        fg, b = models.fir_chain(n_samples=B * 1000, fs=fs, ntaps=ntaps,
                                 frequency=freq, batch_size=B, sink="null",
                                 source=kind)
        fg.validate()
        cfg = compile_flowgraph(fg, batch_size=B)
        step = cfg.step
        params_enc = cplx.encode(cfg.init_params())

        @functools.partial(jax.jit, static_argnames=("k_steps",))
        def run_k(params_enc, k_steps):
            params = cplx.decode(params_enc)

            def body(states, _):
                ns, so = step(states, params)
                (chk,) = list(so.values())
                return ns, chk

            _, sums = jax.lax.scan(body, cfg.init_states(), xs=None,
                                   length=k_steps)
            return sums

        return lambda k: run_k(params_enc, k)

    def gate(kind):
        fg, b = models.fir_chain(n_samples=B, fs=fs, ntaps=ntaps,
                                 frequency=freq, batch_size=B,
                                 sink="vector", source=kind)
        fg.run()
        got = np.asarray(b["sink"].data())
        dp = int(nco.freq_to_dphase(freq, fs))
        idx = np.arange(B, dtype=np.uint64)
        ph = 2 * np.pi * (((idx * np.uint64(dp)) & np.uint64(0xFFFFFFFF)
                           ).astype(np.float64) / 2.0 ** 32)
        ref = sig.lfilter(np.asarray(taps, np.float64), [1.0],
                          np.exp(1j * ph))[: len(got)]
        err = np.abs(ref - got.astype(np.complex128))
        return 10 * np.log10(float(np.mean(np.abs(ref) ** 2))
                             / float(np.mean(err ** 2)))

    out = {}
    for kind in (None, "live"):
        name = "staged" if kind is None else "live"
        g = gate(kind)
        log(f"fir_chain[{name}]: SNR vs float64 golden = {g:.1f} dB "
            f"(gate >= 60)")
        if not (np.isfinite(g) and g >= 60):
            log(f"fir_chain[{name}]: gate FAILED — row withheld")
            continue
        out[name] = _timed_two_point(build(kind),
                                     f"fir_chain {name} flowgraph", B,
                                     n_best=5)
    if {"staged", "live"} <= out.keys():
        log(f"fir_chain same-session ratio: live/staged = "
            f"{out['live'] / out['staged']:.2f}x")
    return out


def bespoke_path(taps, audio_taps, xc, B):
    """The hand-tuned pipeline (parallel/channelizer.py step_planes) on the
    same data — the framework-bypass number the graph path is held to."""
    import jax
    import jax.numpy as jnp

    from newsched_tpu.parallel import ShardedFMChannelizer, make_mesh
    from newsched_tpu.parallel.channelizer import planes_rows

    mesh = make_mesh()
    ch = ShardedFMChannelizer(mesh, NCHANS, taps, audio_taps,
                              audio_decim=AUDIO_DECIM, demod_gain=DEMOD_GAIN,
                              interpret=INTERPRET)
    rows = jnp.asarray(planes_rows(xc, NCHANS))
    n_rows = int(rows.shape[0])
    state0 = ch.init_state_planes(n_rows)

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(k_steps):
        def body(st, _):
            audio, st2 = ch.step_planes(rows, st)
            return st2, jnp.sum(jnp.abs(audio))

        _, sums = jax.lax.scan(body, state0, xs=None, length=k_steps)
        return sums

    return lambda k: run_k(k)


def main():
    import jax

    if INTERPRET:
        # The interpret smoke is a CPU check; on the axon backend interpret
        # mode executes the kernel body with hardware-default (bf16) matmul
        # precision and fails the gate — force CPU (env JAX_PLATFORMS=cpu
        # does not stick; the ambient sitecustomize overrides it).
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    # NB: do NOT enable the persistent compilation cache here — the axon
    # remote-compile tunnel hangs when serialized-executable loading is
    # requested (verified empirically; fresh compiles take ~3-5 s when the
    # tunnel is healthy).

    taps, audio_taps = _design()
    cpu_sps = cpu_reference_throughput(taps, audio_taps)

    run_graph, gate_audio, xc, B = graph_paths(taps, audio_taps, batch=BATCH)
    log(f"devices: {jax.devices()}, batch {B}")

    # Correctness gate: first batch audio THROUGH THE FLOWGRAPH vs the
    # float64 reference (branch-cut-ambiguous samples masked and counted —
    # see rows_reference).
    from newsched_tpu.parallel.channelizer import planes_rows

    audio0 = np.asarray(gate_audio())
    ref0, bad0 = rows_reference(planes_rows(xc, NCHANS), taps, audio_taps,
                                return_risk=True)
    gate = snr_db(ref0[~bad0], audio0[~bad0])
    log(f"correctness: flowgraph SNR vs float64 reference = {gate:.1f} dB "
        f"(gate >= 60; {int(bad0.sum())} of {bad0.size} audio samples "
        f"masked as atan2-branch-cut-ambiguous)")
    if not np.isfinite(gate) or gate < 60:
        print(json.dumps({"metric": "fm_channelizer_64ch_flowgraph_throughput",
                          "value": 0.0,
                          "unit": "Msamples/s/chip", "vs_baseline": 0.0,
                          "error": f"SNR gate failed: {gate:.1f} dB"}))
        return

    sps_graph = _timed_two_point(run_graph, "flowgraph (compiled graph step)", B)
    try:
        sps_bespoke = _timed_two_point(bespoke_path(taps, audio_taps, xc, B),
                                       "bespoke shard_map pipeline", B)
        log(f"framework overhead: graph path at "
            f"{100 * sps_graph / sps_bespoke:.1f}% of the bespoke pipeline")
    except Exception as e:  # secondary number must never kill the headline
        log(f"bespoke pipeline timing failed (non-fatal): {e!r}")

    # LIVE flagship (round 4): noise generated per batch inside the source
    # kernel — its own SNR gate vs the float64 golden over the exact
    # deterministic PRNG rows. TPU only (Mosaic PRNG has no CPU lowering).
    sps_live = None
    if not INTERPRET:
        try:
            run_live, gate_live, Bl = live_paths(taps, audio_taps, BATCH)
            a_live = np.asarray(gate_live())
            ref_live, bad_l = rows_reference(live_golden_rows(Bl), taps,
                                             audio_taps, return_risk=True)
            g_live = snr_db(ref_live[~bad_l], a_live[~bad_l])
            log(f"correctness: LIVE flowgraph SNR vs float64 reference = "
                f"{g_live:.1f} dB (gate >= 60; {int(bad_l.sum())} of "
                f"{bad_l.size} audio samples masked as "
                f"atan2-branch-cut-ambiguous)")
            if np.isfinite(g_live) and g_live >= 60:
                # Pinned protocol (VERDICT r4 weak #2): best-of-5 per K
                # point, same-session; BASELINE.md states the measured
                # session band rather than a single-capture gate.
                sps_live = _timed_two_point(
                    run_live, "LIVE flowgraph (gen-fused noise source)", Bl,
                    n_best=5)
            else:
                log("LIVE SNR gate failed — live number withheld")
        except Exception as e:
            log(f"live path failed (non-fatal): {e!r}")

    # Config #1 same-session staged/fused/live A/B (VERDICT r4 item #2).
    wbfm = {}
    if not INTERPRET:
        try:
            wbfm = wbfm_paths(BATCH)
        except Exception as e:
            log(f"wbfm A/B failed (non-fatal): {e!r}")

    # Config #0 same-session staged/live A/B (round 5).
    fir = {}
    if not INTERPRET:
        try:
            fir = fir_paths(BATCH)
        except Exception as e:
            log(f"fir A/B failed (non-fatal): {e!r}")

    log(f"vs pinned CPU baseline: {sps_graph / PINNED_CPU_SPS:.0f}x "
        f"(live remeasure would say {sps_graph / cpu_sps:.0f}x)")
    out = {
        "metric": "fm_channelizer_64ch_flowgraph_throughput",
        "value": round(sps_graph / 1e6, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps_graph / PINNED_CPU_SPS, 2),
    }
    if sps_live is not None:
        # Same chain with PER-BATCH on-device noise generation instead of
        # the replay source (the production-realistic number).
        out["live_value"] = round(sps_live / 1e6, 2)
    for kind, sps in wbfm.items():
        out[f"wbfm_{kind}_value"] = round(sps / 1e6, 2)
    for kind, sps in fir.items():
        out[f"fir_{kind}_value"] = round(sps / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
