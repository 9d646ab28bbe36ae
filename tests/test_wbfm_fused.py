"""The fused wbfm receive chain (ops/pallas/wbfm_chain.py, round 4):
interpret-mode kernel vs a float64 staged-semantics golden, the flowgraph
twin test vs the staged blocks, and the sharded graph path on the CPU sim
mesh. TPU-tier compiled-mode tests live in tests_tpu/test_on_tpu.py."""

import numpy as np
import pytest
import scipy.signal as sig

import jax
import jax.numpy as jnp

from newsched_tpu import models
from newsched_tpu.blocks import general
from newsched_tpu.ops import firdes, nco


def golden_chain(x, c, dphase, D, rt, Rd, gain):
    """Float64 staged-semantics golden: fxpt-NCO rotate -> lfilter decim ->
    quadrature demod (zero-pinned) -> lfilter decim."""
    idx = np.arange(len(x), dtype=np.uint64)
    acc = (idx * np.uint64(dphase)) & np.uint64(0xFFFFFFFF)
    ph = 2 * np.pi * (acc.astype(np.float64) / 2.0 ** 32)
    xr = x.astype(np.complex128) * np.exp(-1j * ph)
    u = sig.lfilter(np.asarray(c, np.complex128), 1.0, xr)[::D]
    up = np.concatenate([[0.0], u[:-1]])
    p = np.conj(up) * u
    d = np.where((up == 0) | (u == 0), 0.0, np.angle(p)) * gain
    return sig.lfilter(np.asarray(rt, np.float64), 1.0, d)[::Rd]


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64).ravel()
    err = ref - np.asarray(test, np.float64).ravel()
    return 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))


def _small_cfg():
    ntaps, A, D, Rd = 25, 15, 4, 5
    c = sig.firwin(ntaps, 0.2)
    rt = sig.firwin(A, 0.15)
    dphase = int(round(0.21 * 2 ** 32)) & 0xFFFFFFFF
    return c, rt, dphase, D, Rd, 0.7


def test_wbfm_kernel_streaming_matches_golden_interpret():
    """3 streamed batches through the bare kernel (junction recompute +
    carry) match the infinite-stream float64 golden everywhere."""
    from newsched_tpu.ops.pallas.wbfm_chain import (S, WbfmChainPlan,
                                                    fold_planes,
                                                    unfold_audio,
                                                    wbfm_chain_step)

    c, rt, dphase, D, Rd, gain = _small_cfg()
    plan = WbfmChainPlan(c, dphase, D, rt, Rd, gain,
                         precision=jax.lax.Precision.HIGHEST)
    rng = np.random.default_rng(0)
    n = S * 160  # R=160 = one tile of 8*D*Rd rows
    nb = 3
    x = (rng.standard_normal(nb * n)
         + 1j * rng.standard_normal(nb * n)).astype(np.complex64)
    ref = golden_chain(x, c, dphase, D, rt, Rd, gain)
    carry = jnp.zeros((plan.B8, 2 * S), jnp.float32)
    outs = []
    for b in range(nb):
        xp = fold_planes(jnp.asarray(x[b * n:(b + 1) * n]))
        aud, carry = wbfm_chain_step(xp, carry, plan, interpret=True)
        outs.append(np.asarray(unfold_audio(aud)))
    got = np.concatenate(outs)
    assert snr_db(ref[: len(got)], got) > 100


def test_wbfm_fused_model_matches_staged_graph():
    """models.wbfm_receiver(fused=True) through the flowgraph matches the
    staged 3-block graph on an FM signal (config #1 parameters)."""
    fs = 1e6
    n = 2 * 40960  # two batches; R=640 >= B8=568 for the real taps
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 2000.0 * t)
    ph = np.cumsum(2 * np.pi * (75e3 / fs) * msg)
    x = (np.exp(1j * ph) * np.exp(2j * np.pi * 200e3 * t)).astype(np.complex64)

    def run(fused):
        src = general.vector_source(x)
        fg, parts = models.wbfm_receiver(
            fs=fs, center_freq=200e3, quad_rate_decim=4, audio_decim=(1, 5),
            deviation=75e3, source=src, batch_size=40960, fused=fused,
            interpret=fused)
        fg.run()
        return parts["sink"].data()

    a, b = run(False), run(True)
    assert a.shape == b.shape
    assert snr_db(a, b) > 100


def test_wbfm_fused_sharded_graph_matches_unsharded():
    """fg.run(mesh=...) lowers the fused wbfm block through its
    work_sharded hook (per-device fold + ppermute junction block) and
    matches the unsharded run exactly (warm recompute is exact)."""
    from newsched_tpu.blocks import analog
    from newsched_tpu.parallel.mesh import make_mesh
    from newsched_tpu.runtime.graph import Flowgraph

    if len(jax.devices()) < 4:
        pytest.skip("needs the simulated multi-device CPU mesh")
    c, rt, dphase, D, Rd, gain = _small_cfg()
    nd = 4
    n = nd * 64 * 160
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)

    def run(mesh):
        src = general.vector_source(x)
        blk = analog.wbfm_rcv_fused(
            c, center_freq=0.21 * 1e6, fs=1e6, decim=D, deviation=75e3,
            resamp_decim=Rd, resamp_taps=rt, interpret=True)
        hd = general.head(n // (D * Rd), dtype="rf32")
        snk = general.vector_sink(dtype="rf32")
        fg = Flowgraph(batch_size=n)
        fg.connect(src, 0, blk, 0)
        fg.connect(hd, 0, snk, 0)
        fg.connect(blk, 0, hd, 0)
        fg.run(mesh=mesh)
        return snk.data()

    a = run(None)
    b = run(make_mesh(n_devices=nd))
    assert a.shape == b.shape
    assert snr_db(a, b) > 120


def test_wbfm_fused_rejects_bad_configs():
    from newsched_tpu.blocks import analog

    with pytest.raises(NotImplementedError, match="interp-1"):
        analog.wbfm_rcv_fused(np.ones(9), 0.0, 1e6, resamp_interp=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wbfm_fused_batch_split_property(seed):
    """Property tier (round-3 discipline extended to the round-4 fused
    chain): the folded-lanes kernel's junction recompute makes outputs
    EXACTLY the infinite-stream values, so random batch partitions of the
    same stream produce identical audio."""
    from newsched_tpu.ops.pallas.wbfm_chain import (S, WbfmChainPlan,
                                                    fold_planes,
                                                    unfold_audio,
                                                    wbfm_chain_step)

    c, rt, dphase, D, Rd, gain = _small_cfg()
    plan = WbfmChainPlan(c, dphase, D, rt, Rd, gain,
                         precision=jax.lax.Precision.HIGHEST)
    rng = np.random.default_rng(100 + seed)
    unit = S * 8 * D * Rd  # smallest legal batch granule (fold * tile step)
    n_units = 12
    x = (rng.standard_normal(n_units * unit)
         + 1j * rng.standard_normal(n_units * unit)).astype(np.complex64)

    def run(split):
        carry = jnp.zeros((plan.B8, 2 * S), jnp.float32)
        outs, pos = [], 0
        for k in split:
            xp = fold_planes(jnp.asarray(x[pos: pos + k * unit]))
            aud, carry = wbfm_chain_step(xp, carry, plan, interpret=True)
            outs.append(np.asarray(unfold_audio(aud)))
            pos += k * unit
        return np.concatenate(outs)

    # random partition of 12 units vs one 12-unit batch
    split = []
    left = n_units
    while left:
        k = int(rng.integers(1, min(left, 5) + 1))
        split.append(k)
        left -= k
    a = run([n_units])
    b = run(split)
    # The recompute is exact in exact arithmetic; in f32 the junction
    # state is reproduced through a differently-shaped Toeplitz (warm
    # matrix) so ulp-level rounding differences remain — gate at f32
    # resolution, not bitwise.
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0), split
    assert snr_db(a, b) > 110


def test_wbfm_live_source_matches_golden_interpret():
    """The gen-fused LIVE wbfm source (round 4: NCO tone generated in
    VMEM inside the chain kernel) matches the float64 staged-semantics
    golden across streamed batches — fully interpretable on CPU (the
    polynomial NCO needs no hardware PRNG)."""
    from newsched_tpu.blocks import analog
    from newsched_tpu.runtime.graph import Flowgraph

    c, rt, dphase_c, D, Rd, gain = _small_cfg()
    fs = 1e6
    center = 0.21 * fs
    tone = center + 0.02 * fs  # inside the passband, nonzero audio
    n = 3 * 64 * 160
    src = analog.wbfm_live_source(c, center, fs, decim=D, deviation=75e3,
                                  resamp_decim=Rd, resamp_taps=rt,
                                  frequency=tone, amplitude=0.8,
                                  interpret=True)
    hd = general.head(n // (D * Rd), dtype="rf32")
    snk = general.vector_sink(dtype="rf32")
    fg = Flowgraph(batch_size=64 * 160 // (D * Rd))
    fg.connect(src, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    fg.run()
    a = snk.data()

    # golden: the same fxpt tone through the staged float64 chain
    dphase_t = np.uint64(nco.freq_to_dphase(tone, fs))
    acc = (np.arange(n, dtype=np.uint64) * dphase_t) & np.uint64(0xFFFFFFFF)
    ph = 2 * np.pi * (acc.astype(np.float64) / 2.0 ** 32)
    x = 0.8 * np.exp(1j * ph)
    gain_real = (fs / D) / (2 * np.pi * 75e3)
    ref = golden_chain(x, c, int(nco.freq_to_dphase(center, fs)), D, rt, Rd,
                       gain_real)
    assert a.shape == ref[: len(a)].shape
    assert snr_db(ref[: len(a)], a) > 100


def _fm_tone(n, fs, f):
    t = np.arange(n) / fs
    return np.exp(2j * np.pi * f * t).astype(np.complex64)


def test_wbfm_fused_recompile_fence_retune_local():
    """VERDICT r4 item #5: center_freq is a RECOMPILE-FENCE parameter —
    set_param on a RUNNING fused wbfm rebuilds the rotated-taps plan and
    the runner retraces at a batch boundary; the output re-locks to the
    new tuning (junction state is raw input rows, so no glitch machinery
    is needed)."""
    import time

    fs, dev = 1e6, 75e3
    f_tone = 231_250.0
    batch = 61440  # R=960 rows: >= B8 boundary (568) for the real taps
    n_batches = 16
    n = batch * n_batches
    x = _fm_tone(batch * 4, fs, f_tone)

    from newsched_tpu.blocks import analog
    from newsched_tpu.runtime.graph import Flowgraph

    src = general.vector_source(x, repeat=True)
    thr = general.throttle(n / 1.2)  # ~1.2 s run: time to poke it
    blk = analog.wbfm_rcv_fused(
        firdes.low_pass(1.0, fs, 100e3, 30e3), center_freq=200e3, fs=fs,
        decim=4, deviation=dev, resamp_decim=5, interpret=True)
    hd = general.head(n // 20, dtype="rf32")
    snk = general.vector_sink(dtype="rf32")
    fg = Flowgraph(batch_size=batch)
    fg.connect(src, 0, thr, 0)
    fg.connect(thr, 0, blk, 0)
    fg.connect(blk, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    fg.validate()
    runner = fg.start(collect_stats=True)
    # trigger on actual stream progress, not wall time (first-batch
    # compile time would otherwise eat the whole throttle budget)
    t0 = time.monotonic()
    while runner.stats["batches"] < n_batches // 3:
        time.sleep(0.01)
        assert time.monotonic() - t0 < 60
    blk.set_param("center_freq", 250e3)
    fg.wait()
    got = np.asarray(snk.data())
    a1 = (f_tone - 200e3) / dev   # 0.4167 audio constant before retune
    a2 = (f_tone - 250e3) / dev   # -0.25 after
    near1 = np.abs(got - a1) < 5e-3
    near2 = np.abs(got - a2) < 5e-3
    # both tunings present, settled, with one clean switch: everything
    # before the first a2-lock is a1 (modulo the short filter settle)
    assert near1.sum() > len(got) // 10, near1.sum()
    assert near2.sum() > len(got) // 10, near2.sum()
    sw = np.argmax(near2)
    assert sw > 512, sw             # a real pre-retune region exists
    assert near1[256: sw - 64].all()  # pre-switch solidly at a1 (skip
    assert near2[sw:].all()           # the stream-start filter settle)


def test_wbfm_fused_retune_over_control_socket():
    """The same retune END-TO-END over the round-4 control plane: a
    RuntimeClient sets center_freq on a fused wbfm running in another
    partition; the stream re-locks (SURVEY §4.4 RPC path + §8 fence)."""
    import time

    from newsched_tpu.runtime.control import RuntimeClient
    from newsched_tpu.runtime.distributed import (Runtime,
                                                  partition_flowgraph)
    from newsched_tpu.runtime.graph import Flowgraph

    fs, dev = 1e6, 75e3
    f_tone = 231_250.0
    batch = 61440
    n = batch * 16
    x = _fm_tone(batch * 4, fs, f_tone)
    from newsched_tpu.blocks import analog

    fg = Flowgraph(batch_size=batch)
    src = general.vector_source(x, repeat=True)
    thr = general.throttle(n / 1.2)
    blk = analog.wbfm_rcv_fused(
        firdes.low_pass(1.0, fs, 100e3, 30e3), center_freq=200e3, fs=fs,
        decim=4, deviation=dev, resamp_decim=5, interpret=True)
    snk = general.vector_sink(dtype="rf32")
    hd = general.head(n // 20, dtype="rf32")
    fg.connect(src, 0, thr, 0)
    fg.connect(thr, 0, blk, 0)
    fg.connect(blk, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    pieces = partition_flowgraph(fg, {"dsp": [src, thr, blk, hd],
                                      "collect": [snk]})
    addr = "ipc:///tmp/nst_wbfm_retune.ipc"
    rt = Runtime(pieces, total_items={"dsp": n, "collect": n // 20},
                 control_addresses={"dsp": addr})
    rt.start()
    ctl = RuntimeClient(addr)
    ctl.ping()
    time.sleep(1.0)  # past first-batch compile + a few throttled batches
    assert float(ctl.get_param(blk.name, "center_freq")) == 200e3
    ctl.set_param(blk.name, "center_freq", 250e3)
    rt.wait()
    ctl.close()
    got = np.asarray(snk.data())
    a1 = (f_tone - 200e3) / dev
    a2 = (f_tone - 250e3) / dev
    near1 = np.abs(got - a1) < 5e-3
    near2 = np.abs(got - a2) < 5e-3
    assert near1.sum() > len(got) // 20, near1.sum()
    assert near2.sum() > len(got) // 20, near2.sum()
    sw = np.argmax(near2)
    assert sw > 512, sw
    assert near1[256: sw - 64].all() and near2[sw:].all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_banded_xlate_matches_dense_property(seed):
    """Round-5 banded xlate (groups > 1): random configs, banded vs dense
    on the SAME input must agree to reduction-order ulps (the dropped
    columns are structural zeros; only the MXU pairing changes)."""
    from newsched_tpu.ops.pallas.wbfm_chain import (S, WbfmChainPlan,
                                                    fold_planes,
                                                    unfold_audio,
                                                    wbfm_chain_step)

    rng = np.random.default_rng(seed)
    ntaps = int(rng.integers(17, 120))
    A = int(rng.integers(9, 40)) | 1
    c = sig.firwin(ntaps, 0.2)
    rt = sig.firwin(A, 0.15)
    D, Rd = 4, 5
    dphase = int(rng.integers(1, 1 << 31))
    n = 64 * 8 * D * Rd * int(rng.integers(2, 5))
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    xp = fold_planes(jnp.asarray(x))

    outs = {}
    for G in (1, 0):  # 0 = auto
        plan = WbfmChainPlan(c, dphase, D, rt, Rd, 0.7,
                             precision=jax.lax.Precision.HIGHEST,
                             xlate_groups=G or None)
        carry = jnp.zeros((plan.B8, 2 * S), jnp.float32)
        aud, _ = wbfm_chain_step(xp, carry, plan, interpret=True)
        outs[G] = np.asarray(unfold_audio(aud))
    assert snr_db(outs[1], outs[0]) > 110
