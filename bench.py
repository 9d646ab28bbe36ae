"""Benchmark: flagship FM channelizer+demod chain on the TPU vs a single
CPU core (BASELINE.json headline metric: Msamples/s/chip; vs_baseline is
the speedup over the single-core numpy/scipy reference, target >= 10x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Detail (including an SNR-vs-reference correctness gate) goes to stderr.

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
import sys
import time

import numpy as np

NCHANS = 64
TAPS_PER_ARM = 16
AUDIO_DECIM = 8
AUDIO_NTAPS = 65
DEMOD_GAIN = 0.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _design():
    from newsched_tpu.ops import firdes

    taps = firdes.prototype_channelizer_taps(NCHANS, TAPS_PER_ARM)
    audio_taps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                                 ntaps=AUDIO_NTAPS)
    return taps, audio_taps


def numpy_reference(x: np.ndarray, taps, audio_taps) -> np.ndarray:
    """Float64 golden model of the chain (zero initial state), mirroring
    ops/pfb.py + demod + per-channel audio FIR exactly."""
    import scipy.signal as sig

    from newsched_tpu.ops.pfb import pfb_arm_taps

    M = NCHANS
    arm = pfb_arm_taps(taps.astype(np.float64), M)  # (M, L)
    L = arm.shape[1]
    ntaps = M * L
    n_out = len(x) // M
    xfull = np.concatenate([np.zeros(ntaps - 1, np.complex128), x.astype(np.complex128)])
    need = L - 1 + n_out
    V = xfull[: need * M].reshape(need, M)[:, ::-1].T  # U[p, i]
    filt = np.empty((M, n_out), np.complex128)
    for p in range(M):
        filt[p] = np.correlate(V[p], arm[p][::-1], mode="valid")[:n_out]
    Y = (M * np.fft.ifft(filt, axis=0)).T  # (n_out, M)
    prev = np.vstack([np.zeros((1, M), np.complex128), Y[:-1]])
    # Convention: demod against zero history emits exactly 0 (otherwise the
    # result is a signed-zero artifact — atan2(+-0, +-0) lands anywhere in
    # {0, +-pi} depending on bit signs, which no two backends agree on).
    aud = np.where((prev == 0) | (Y == 0), 0.0,
                   np.angle(np.conj(prev) * Y)) * DEMOD_GAIN
    out = np.empty((n_out // AUDIO_DECIM, M), np.float64)
    for c in range(M):
        out[:, c] = sig.lfilter(audio_taps.astype(np.float64), [1.0], aud[:, c])[::AUDIO_DECIM]
    return out


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
    log(f"cpu: {n} samples in {dt:.3f}s -> {sps/1e6:.2f} Msps (1 core, f32 vectorized)")
    return sps


def tpu_run(taps, audio_taps, batch: int):
    """Returns (make_run_k, one_batch_audio, x planes, channelizer, x, B)."""
    import functools

    import jax
    import jax.numpy as jnp

    from newsched_tpu.parallel import ShardedFMChannelizer, make_mesh
    from newsched_tpu.utils.cplx import ComplexParts

    mesh = make_mesh()
    ch = ShardedFMChannelizer(mesh, NCHANS, taps, audio_taps,
                              audio_decim=AUDIO_DECIM, demod_gain=DEMOD_GAIN)
    B = max(batch // ch.batch_multiple(), 1) * ch.batch_multiple()
    B = max(B, ch.min_batch())
    rng = np.random.default_rng(0)
    xc = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    xp = ComplexParts(jnp.asarray(np.real(xc).astype(np.float32)),
                      jnp.asarray(np.imag(xc).astype(np.float32)))

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(xp, state_enc, k_steps):
        def body(st, _):
            audio, st2 = ch.step_enc(xp, st)
            return st2, jnp.sum(jnp.abs(audio))

        final, sums = jax.lax.scan(body, state_enc, xs=None, length=k_steps)
        return final, sums

    @jax.jit
    def one_batch_audio(xp, state_enc):
        audio, st2 = ch.step_enc(xp, state_enc)
        return audio

    return run_k, one_batch_audio, xp, ch, xc, B


def main():
    import jax

    # NB: do NOT enable the persistent compilation cache here — the axon
    # remote-compile tunnel hangs when serialized-executable loading is
    # requested (verified empirically; fresh compiles take ~3-5 s when the
    # tunnel is healthy).

    taps, audio_taps = _design()
    cpu_sps = cpu_reference_throughput(taps, audio_taps)

    K1, K2 = 100, 400
    run_k, one_batch_audio, xp, ch, xc, B = tpu_run(taps, audio_taps, batch=1 << 21)
    log(f"devices: {jax.devices()}, batch {B}")

    # Correctness gate: first batch audio vs float64 reference.
    audio0 = np.asarray(jax.device_get(one_batch_audio(xp, ch.init_state_enc())))
    ref0 = numpy_reference(xc, taps, audio_taps)
    gate = snr_db(ref0, audio0)
    log(f"correctness: SNR vs float64 reference = {gate:.1f} dB (gate >= 60)")
    if not np.isfinite(gate) or gate < 60:
        print(json.dumps({"metric": "fm_channelizer_64ch_throughput", "value": 0.0,
                          "unit": "Msamples/s/chip", "vs_baseline": 0.0,
                          "error": f"SNR gate failed: {gate:.1f} dB"}))
        return

    # Timed region: jitted K-step scans at two K values; the two-point fit
    # removes the tunnel's fixed per-dispatch cost (see module docstring).
    state = ch.init_state_enc()
    t0 = time.perf_counter()
    state, sums = run_k(xp, state, K1)
    jax.block_until_ready(sums)
    log(f"compile+first {K1} steps: {time.perf_counter()-t0:.1f}s; "
        f"checksum[0]={float(np.asarray(sums)[0]):.1f}")
    totals = {}
    for k in (K1, K2):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            state, sums = run_k(xp, state, k)
            s = jax.device_get(sums)  # forces full completion + value fetch
            dt = time.perf_counter() - t0
            best = min(best, dt)
            assert np.all(np.isfinite(s)), "non-finite checksums"
        totals[k] = best
    step_s = (totals[K2] - totals[K1]) / (K2 - K1)
    dispatch_s = totals[K1] - K1 * step_s
    sps = B / step_s
    naive = B * K1 / totals[K1]
    log(f"tpu: T({K1})={totals[K1]*1e3:.1f}ms T({K2})={totals[K2]*1e3:.1f}ms "
        f"-> {step_s*1e6:.1f} us/step on-device ({sps/1e6:.1f} Msps); "
        f"dispatch overhead {dispatch_s*1e3:.1f} ms/call "
        f"(naive-with-dispatch: {naive/1e6:.1f} Msps)")

    print(json.dumps({
        "metric": "fm_channelizer_64ch_throughput",
        "value": round(sps / 1e6, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / cpu_sps, 2),
    }))


if __name__ == "__main__":
    main()
