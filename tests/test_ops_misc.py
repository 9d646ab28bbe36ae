"""Golden tests: NCO, IIR, AGC, quadrature demod, firdes, windows."""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sig

import newsched_tpu.ops.agc as agc_ops
import newsched_tpu.ops.analog as analog_ops
from newsched_tpu.ops import firdes, nco
import newsched_tpu.ops.iir as iir_ops
import newsched_tpu.ops.window as win_ops

from tests.test_ops_fir import snr_db, _rand_complex


def test_window_matches_scipy():
    for name, scname in [("hamming", "hamming"), ("hann", "hann"), ("blackman", "blackman")]:
        w = win_ops.build(name, 129)
        ref = sig.get_window(scname, 129, fftbins=False)
        assert np.allclose(w, ref, atol=1e-10), name


def test_firdes_lowpass_response():
    taps = firdes.low_pass(1.0, 1.0, 0.2, 0.05, ntaps=129)
    w, h = sig.freqz(taps, worN=4096)
    f = w / (2 * np.pi)
    # passband within 0.5 dB, stopband below -40 dB
    pb = 20 * np.log10(np.abs(h[f < 0.15]))
    sb = 20 * np.log10(np.abs(h[f > 0.27]) + 1e-12)
    assert np.all(np.abs(pb) < 0.5)
    assert np.all(sb < -40)


def test_nco_exactness_across_batches():
    dp = nco.freq_to_dphase(1234.567, 1e6)
    # 3 batches of 1000 must equal one batch of 3000 exactly (uint32 algebra)
    p0 = jnp.uint32(42)
    full = np.asarray(nco.nco_phase(p0, jnp.uint32(dp), 3000))
    parts = []
    p = p0
    for _ in range(3):
        parts.append(np.asarray(nco.nco_phase(p, jnp.uint32(dp), 1000)))
        p = nco.nco_advance(p, jnp.uint32(dp), 1000)
    assert np.array_equal(full, np.concatenate(parts))


def test_nco_tone_frequency():
    fs, f0 = 1e6, 12_500.0
    dp = nco.freq_to_dphase(f0, fs)
    n = 1 << 14
    tone = np.asarray(nco.nco_cexp(jnp.uint32(0), jnp.uint32(dp), n))
    spec = np.abs(np.fft.fft(tone))
    peak = np.argmax(spec)
    assert abs(peak / n * fs - f0) < fs / n


def test_iir_matches_scipy():
    b, a = sig.butter(4, 0.2)
    ff, fb = iir_ops.lfilter_taps(b, a)
    x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    s = iir_ops.iir_init_state(len(ff), len(fb), dtype=jnp.float32)
    outs = []
    for i in range(4):  # streaming in 4 batches
        s, y = iir_ops.iir_filter(jnp.asarray(ff), jnp.asarray(fb), s, jnp.asarray(x[i * 1024 : (i + 1) * 1024]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    ref = sig.lfilter(b, a, x.astype(np.float64))
    assert snr_db(ref, y) > 80


def test_iir_first_order():
    ff, fb = np.float32([0.1]), np.float32([0.9])
    x = np.ones(1000, dtype=np.float32)
    s = iir_ops.iir_init_state(1, 1, dtype=jnp.float32)
    _, y = iir_ops.iir_filter(jnp.asarray(ff), jnp.asarray(fb), s, jnp.asarray(x))
    ref = sig.lfilter([0.1], [1, -0.9], x.astype(np.float64))
    assert snr_db(ref, np.asarray(y)) > 80


def test_agc_converges_and_streams():
    rng = np.random.default_rng(1)
    x = (0.1 * np.exp(1j * 2 * np.pi * rng.random(8192))).astype(np.complex64)
    s = agc_ops.agc_init_state(1.0)
    outs = []
    for i in range(4):
        s, y = agc_ops.agc(s, jnp.asarray(x[i * 2048 : (i + 1) * 2048]), rate=1e-2, reference=1.0)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    # Converged tail magnitude ~ reference
    assert abs(np.mean(np.abs(y[-1000:])) - 1.0) < 1e-2

    # invariance: single batch equals 4-batch streaming
    s2 = agc_ops.agc_init_state(1.0)
    _, y_once = agc_ops.agc(s2, jnp.asarray(x), rate=1e-2, reference=1.0)
    assert snr_db(np.asarray(y_once), y) > 100


def test_agc_reference_recurrence():
    """Cross-check the parallel scan against a literal python loop."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64) * 0.3
    rate, ref = 0.05, 1.0
    g = 1.0
    ys = []
    for xi in x:
        ys.append(xi * g)
        g = g + rate * (ref - abs(xi) * g)
    ref_y = np.array(ys)
    s = agc_ops.agc_init_state(1.0)
    _, y = agc_ops.agc(s, jnp.asarray(x), rate=rate, reference=ref)
    assert snr_db(ref_y, np.asarray(y)) > 90


def test_quadrature_demod_fm():
    """Demodulate an FM-modulated ramp; recover the message."""
    fs = 256_000.0
    n = 8192
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    kf = 0.3  # rad/sample peak deviation
    phase = np.cumsum(kf * msg)
    x = np.exp(1j * phase).astype(np.complex64)
    s = analog_ops.quad_demod_init_state()
    outs = []
    for i in range(2):
        s, y = analog_ops.quadrature_demod(s, jnp.asarray(x[i * 4096 : (i + 1) * 4096]), gain=1.0 / kf)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    # first sample has no history; compare from 1 on
    assert snr_db(msg[1:], y[1:]) > 60


def test_rotator_exact():
    x = _rand_complex(2048, seed=7)
    dp = nco.freq_to_dphase(0.1e6, 1e6)
    s = analog_ops.rotator_init_state()
    outs = []
    for i in range(2):
        s, y = analog_ops.rotate(s, jnp.asarray(x[i * 1024 : (i + 1) * 1024]), jnp.uint32(dp), conj=True)
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    n = np.arange(2048)
    ref = x * np.exp(-2j * np.pi * (float(dp) / 2**32) * n)
    assert snr_db(ref, y) > 90


def test_fm_emphasis_blocks_vs_scipy():
    """fm_deemph / fm_preemph (GR-lineage emphasis networks) match
    scipy.lfilter with the same bilinear-transform taps."""
    import scipy.signal as sig

    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import analog, general
    from newsched_tpu.blocks.analog import _emphasis_taps

    fs = 48000.0
    x = np.random.default_rng(5).standard_normal(4096).astype(np.float32)
    for deemph in (True, False):
        b, a = _emphasis_taps(fs, 75e-6, None, deemph)
        ref = sig.lfilter(b, a, x.astype(np.float64))
        fg = Flowgraph(batch_size=1024)
        src = general.vector_source(x, dtype="rf32")
        blk = analog.fm_deemph(fs) if deemph else analog.fm_preemph(fs)
        snk = general.vector_sink(dtype="rf32")
        fg.connect(src, 0, blk, 0)
        fg.connect(blk, 0, snk, 0)
        fg.run()
        assert snr_db(ref, snk.data()) > 100
