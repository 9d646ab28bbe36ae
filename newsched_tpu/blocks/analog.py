"""Analog blocks — reference blocklib/analog: sig_source, noise_source,
agc, quadrature_demod. Waveform generation uses the exact fixed-point NCO
(ops/nco.py), so multi-hour streams keep phase exactly."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import newsched_tpu.ops.agc as agc_ops
import newsched_tpu.ops.analog as analog_ops
from newsched_tpu.ops import nco
from newsched_tpu.runtime.block import Block, SyncBlock
from newsched_tpu.utils.dtypes import port_dtype


class sig_source(Block):
    """Tone/waveform source (reference analog::sig_source<T>): sin, cos,
    complex exponential, square, triangle, sawtooth at exact NCO phase.

    frequency/amplitude/offset are runtime-settable parameters; waveform and
    dtype are compile-time.
    """

    WAVEFORMS = ("cos", "sin", "complex", "square", "triangle", "saw")

    def __init__(self, sampling_freq: float, waveform: str = "complex",
                 frequency: float = 1000.0, amplitude: float = 1.0,
                 offset: float = 0.0, dtype="cf32", name=None):
        super().__init__(name)
        if waveform not in self.WAVEFORMS:
            raise ValueError(f"waveform {waveform!r} not in {self.WAVEFORMS}")
        self.waveform = waveform
        self.sampling_freq = float(sampling_freq)
        d = port_dtype(dtype)
        self.dtype = d
        self.add_output("out", d)
        self.declare_param("dphase", nco.freq_to_dphase(frequency, sampling_freq),
                           dtype=np.uint32, doc="per-sample phase increment")
        self.declare_param("amplitude", amplitude, dtype=np.float32)
        self.declare_param("offset", offset,
                           dtype=d.np_dtype if d.name != "cf32" else np.complex64)

    def set_frequency(self, freq: float) -> None:
        self.set_param("dphase", nco.freq_to_dphase(freq, self.sampling_freq))

    def init_state(self, nin, nout):
        return {"phase": jnp.zeros((), jnp.uint32)}

    def _use_pallas(self, nout: int) -> bool:
        from newsched_tpu.runtime import meshctx

        return (self.waveform in ("complex", "cos", "sin")
                and nout % 1024 == 0
                and meshctx.current() is None  # pallas_call: no SPMD rule
                and jax.default_backend() not in ("cpu",))

    def work(self, state, ins, params, nout):
        ph0, dp = state["phase"], params["dphase"]
        a = params["amplitude"]
        if self._use_pallas(nout):
            # on-chip fxpt NCO with polynomial sincos: 46.5 vs 129 us per
            # 2^21-batch measured vs XLA's sincos at the same (f32-class,
            # 138.8 dB vs float64) accuracy — ops/pallas/sources.py
            from newsched_tpu.ops.pallas.sources import nco_planes

            re2, im2 = nco_planes(ph0, dp, a, n=nout)
            if self.waveform == "complex":
                y = nco.jax_complex(re2.reshape(-1), im2.reshape(-1))
                y = y + params["offset"].astype(jnp.complex64)
            else:
                y = (re2 if self.waveform == "cos" else im2).reshape(-1)
                y = (y + params["offset"]).astype(self.dtype.jnp_dtype)
            return {"phase": nco.nco_advance(ph0, dp, nout)}, {"out": y}
        phase = nco.nco_phase(ph0, dp, nout)
        if self.waveform == "complex":
            y = nco.jax_complex(jnp.cos(phase), jnp.sin(phase)) * a.astype(jnp.complex64)
        elif self.waveform == "cos":
            y = jnp.cos(phase) * a
        elif self.waveform == "sin":
            y = jnp.sin(phase) * a
        elif self.waveform == "square":
            y = jnp.where(phase < jnp.pi, a, -a)
        elif self.waveform == "triangle":
            t = phase / (2 * jnp.pi)
            y = a * (4 * jnp.abs(t - 0.5) - 1.0)
        else:  # saw
            y = a * (phase / jnp.pi - 1.0)
        y = (y + params["offset"]).astype(self.dtype.jnp_dtype)
        return {"phase": nco.nco_advance(ph0, dp, nout)}, {"out": y}


class noise_source(Block):
    """Gaussian/uniform noise (reference analog::noise_source<T>).

    method="pallas" (the default on a TPU backend for gaussian noise with
    64*dtype-lane-multiple batches) generates with the chip's hardware
    PRNG + Irwin-Hall transform (ops/pallas/noise.py — 3.7x the XLA
    threefry+erfinv path, see the round-4 live ledger); the stream is a
    pure function of (seed, stream position). method="threefry" keeps the
    portable counter-based jax.random path (CPU, uniform noise, odd
    batch sizes).

    **Stream-identity contract (ADVICE r4):** the pallas and threefry
    streams are DIFFERENT bit streams, so method="auto" emits different
    samples for the same (seed, graph) across CPU vs TPU backends and
    across batch sizes whose 8192-word divisibility flips the selection
    (a one-time log records which engine auto picked). Each engine is
    individually deterministic and batch-size-invariant in (seed, stream
    position). Pin method="threefry" for bit-reproducibility across
    backends/batch shapes (docs/migrating.md)."""

    def __init__(self, noise_type: str = "gaussian", amplitude: float = 1.0,
                 seed: int = 0, dtype="cf32", method: str = "auto", name=None):
        super().__init__(name)
        if method not in ("auto", "pallas", "threefry"):
            raise ValueError(f"method {method!r} not in auto/pallas/threefry")
        self.noise_type = noise_type
        self.seed = seed
        self.method = method
        self.dtype = port_dtype(dtype)
        self.add_output("out", self.dtype)
        self.declare_param("amplitude", amplitude, dtype=np.float32)

    def _use_pallas(self, nout: int) -> bool:
        from newsched_tpu.ops.pallas.noise import GROUP_ROWS
        from newsched_tpu.runtime import meshctx

        if meshctx.current() is not None:
            if self.method == "pallas":
                raise ValueError("noise_source(method='pallas') cannot run "
                                 "under fg.run(mesh=...): use 'threefry'")
            return False  # pallas_call has no SPMD partitioning rule
        complex_out = self.dtype.name == "cf32"
        words = nout * (2 if complex_out else 1)
        ok = (self.noise_type == "gaussian"
              and self.dtype.name in ("cf32", "rf32")
              and words % (GROUP_ROWS * 128) == 0
              and jax.default_backend() not in ("cpu",))
        if self.method == "pallas" and not ok:
            raise ValueError(
                "noise_source(method='pallas') needs a TPU backend, "
                "gaussian cf32/rf32 output, and batches whose f32 word "
                "count is a multiple of 8192")
        if self.method == "auto" and not getattr(self, "_auto_logged", False):
            self._auto_logged = True
            self.log.info(
                "noise_source auto-selected the %s engine (streams differ "
                "between engines; pin method='threefry' for cross-backend "
                "bit-reproducibility)", "hw-PRNG pallas" if ok else "threefry")
        return ok if self.method == "auto" else self.method == "pallas"

    def init_state(self, nin, nout):
        if self._use_pallas(nout):
            return {"ghi": jnp.zeros((), jnp.int32),
                    "glo": jnp.zeros((), jnp.int32)}
        return {"key": jax.random.PRNGKey(self.seed)}

    def init_state_sharded(self, nin, nout, mesh, axis):
        # Graph-mesh runs always take the threefry path (work() branches
        # on the state's shape): XLA's SPMD partitioner cannot split a
        # pallas_call. The gen-fused source blocks shard via work_sharded.
        if self.method == "pallas":
            raise ValueError(
                f"{type(self).__name__}(method='pallas') cannot run under "
                f"fg.run(mesh=...): use method='threefry' (or 'auto') or "
                f"a gen-fused source block")
        return {"key": jax.random.PRNGKey(self.seed)}

    def work(self, state, ins, params, nout):
        a = params["amplitude"]
        complex_out = self.dtype.name == "cf32"
        if "ghi" in state:
            from newsched_tpu.ops.pallas.noise import (GROUP_ROWS,
                                                       advance_groups,
                                                       gaussian_rows)

            n_rows = nout * (2 if complex_out else 1) // 128
            r = gaussian_rows(state["ghi"], state["glo"], n_rows=n_rows,
                              width=128, seed=int(self.seed))
            hi, lo = advance_groups(state["ghi"], state["glo"],
                                    n_rows // GROUP_ROWS)
            st = {"ghi": hi, "glo": lo}
            if complex_out:
                y = nco.jax_complex(r[:, :64].reshape(-1),
                                    r[:, 64:].reshape(-1)) * a.astype(jnp.complex64)
            else:
                y = (r.reshape(-1) * a).astype(jnp.float32)
            return st, {"out": y}
        key, sub = jax.random.split(state["key"])
        shape = (nout, 2) if complex_out else (nout,)
        if self.noise_type == "gaussian":
            r = jax.random.normal(sub, shape, dtype=jnp.float32)
        else:
            r = jax.random.uniform(sub, shape, dtype=jnp.float32, minval=-1.0, maxval=1.0)
        if complex_out:
            # Match the reference: each of I/Q gets a full-amplitude draw.
            y = nco.jax_complex(r[:, 0], r[:, 1]) * a.astype(jnp.complex64)
        else:
            y = (r * a).astype(self.dtype.jnp_dtype)
        return {"key": key}, {"out": y}


class agc(SyncBlock):
    """AGC (reference analog::agc_cc/_ff) via the parallel-scan kernel."""

    def __init__(self, rate: float = 1e-4, reference: float = 1.0,
                 gain: float = 1.0, max_gain: float = 0.0, dtype="cf32", name=None):
        super().__init__(name)
        d = port_dtype(dtype)
        self.add_input("in", d)
        self.add_output("out", d)
        self.initial_gain = gain
        self.max_gain = max_gain
        self.declare_param("rate", rate, dtype=np.float32)
        self.declare_param("reference", reference, dtype=np.float32)

    def init_state(self, nin, nout):
        return agc_ops.agc_init_state(self.initial_gain)

    def work(self, state, ins, params, nout):
        st, y = agc_ops.agc(state, ins["in"], params["rate"], params["reference"],
                            self.max_gain)
        return st, {"out": y}


class quadrature_demod(Block):
    """FM discriminator (reference analog::quadrature_demod): cf32 -> rf32,
    y[n] = gain * arg(conj(x[n-1]) x[n])."""

    def __init__(self, gain: float = 1.0, name=None):
        super().__init__(name)
        self.add_input("in", "cf32")
        self.add_output("out", "rf32")
        self.declare_param("gain", gain, dtype=np.float32)

    def init_state(self, nin, nout):
        return analog_ops.quad_demod_init_state()

    def work(self, state, ins, params, nout):
        st, y = analog_ops.quadrature_demod(state, ins["in"], params["gain"])
        return st, {"out": y}


def _emphasis_taps(fs: float, tau: float, fh: float | None, deemph: bool):
    """Single-pole emphasis-network taps via the bilinear transform.

    Standard FM broadcast emphasis design (GR-lineage fm_deemph/fm_preemph
    python hier blocks): corner at 1/tau rad/s, prewarped; the pre-emphasis
    network adds an upper corner fh (default 0.925 * fs/2) so gain stops
    rising near Nyquist. Returns (ff_taps, fb_taps) for ops/iir.lfilter.
    """
    import math

    w_cl = 1.0 / tau
    w_cla = 2.0 * fs * math.tan(w_cl / (2.0 * fs))
    if deemph:
        k = -w_cla / (2.0 * fs)
        p1 = (1.0 + k) / (1.0 - k)
        b0 = -k / (1.0 - k)
        return np.array([b0, b0], np.float64), np.array([1.0, -p1], np.float64)
    # Clamp like the GR reference: fh at/above Nyquist puts the pole on or
    # beyond the unit circle (tan singular/negative) -> silent instability.
    if fh is None or fh <= 0.0 or fh >= fs / 2.0:
        fh = 0.925 * fs / 2.0
    w_ch = 2.0 * math.pi * fh
    w_cha = 2.0 * fs * math.tan(w_ch / (2.0 * fs))
    kl = -w_cla / (2.0 * fs)
    kh = -w_cha / (2.0 * fs)
    z1 = (1.0 + kl) / (1.0 - kl)
    p1 = (1.0 + kh) / (1.0 - kh)
    b0 = (1.0 - kl) / (1.0 - kh)
    return np.array([b0, -z1 * b0], np.float64), np.array([1.0, -p1], np.float64)


class fm_deemph(Block):
    """FM broadcast de-emphasis (GR-lineage analog fm_deemph hier block):
    single-pole IIR low-pass, corner 1/tau (tau = 75 us US / 50 us EU),
    run through the companion-matrix IIR scan (ops/iir.py)."""

    def __init__(self, fs: float, tau: float = 75e-6, name=None):
        super().__init__(name)
        self.add_input("in", "rf32")
        self.add_output("out", "rf32")
        from newsched_tpu.ops import iir as iir_ops

        b, a = _emphasis_taps(fs, tau, None, deemph=True)
        self.ff, self.fb = iir_ops.lfilter_taps(b, a)

    def init_state(self, nin, nout):
        from newsched_tpu.ops import iir as iir_ops

        return iir_ops.iir_init_state(len(self.ff), len(self.fb),
                                      dtype=jnp.float32)

    def work(self, state, ins, params, nout):
        from newsched_tpu.ops import iir as iir_ops

        st, y = iir_ops.iir_filter(self.ff, self.fb, state, ins["in"])
        return st, {"out": y}


class fm_preemph(Block):
    """FM broadcast pre-emphasis (GR-lineage analog fm_preemph): one zero
    at the 1/tau corner, one pole at fh (default 0.925 * Nyquist)."""

    def __init__(self, fs: float, tau: float = 75e-6, fh: float = -1.0,
                 name=None):
        super().__init__(name)
        self.add_input("in", "rf32")
        self.add_output("out", "rf32")
        from newsched_tpu.ops import iir as iir_ops

        b, a = _emphasis_taps(fs, tau, fh if fh > 0 else None, deemph=False)
        self.ff, self.fb = iir_ops.lfilter_taps(b, a)

    init_state = fm_deemph.init_state
    work = fm_deemph.work


class wbfm_rcv_fused(Block):
    """The wideband-FM receive chain (BASELINE config #1: freq_xlating_fir
    -> quadrature_demod -> rational_resampler) as ONE Pallas mega-kernel
    on the time-folded-lanes layout (ops/pallas/wbfm_chain.py): cf32
    scalar stream in -> rf32 scalar audio at rate 1/(decim*resamp_decim).

    Drop-in for the staged chain of models.wbfm_receiver — outputs match
    it to float32 accuracy (the dropped output NCO is an exact identity
    through the demod; see the kernel docstring). Differences from the
    staged blocks, by design: center_freq and demod gain are COMPILE-TIME
    (retuning rebuilds the rotated-taps Toeplitz constants); interp-1
    resamplers only. Batches must be multiples of 64*decim*resamp_decim
    samples and large enough for the fold (>= plan.B8 * 64 samples).

    Shards over the graph's time axis via the work_sharded compiler hook:
    each device folds its own time shard; the only exchange is a
    ppermute of the B8-row junction block (same warm-recompute argument
    as the sharded channelizer).
    """

    def __init__(self, chan_taps, center_freq: float, fs: float,
                 decim: int = 4, deviation: float = 75e3,
                 resamp_interp: int = 1, resamp_decim: int = 5,
                 resamp_taps=None, tile: int | None = None,
                 precision="split3", interpret: bool = False,
                 input_format: str = "cf32", name=None):
        super().__init__(name)
        from fractions import Fraction

        from newsched_tpu.ops.pallas.wbfm_chain import S, WbfmChainPlan

        if resamp_interp != 1:
            raise NotImplementedError(
                "wbfm_rcv_fused fuses interp-1 resamplers only; use the "
                "staged wbfm_receiver for rational interpolation")
        if input_format not in ("cf32", "folded"):
            raise ValueError(f"input_format {input_format!r} not in "
                             f"cf32/folded")
        self.input_format = input_format
        if resamp_taps is None:
            from newsched_tpu.ops import firdes

            cutoff = 0.45 / max(resamp_interp, resamp_decim)
            trans = 0.1 / max(resamp_interp, resamp_decim)
            resamp_taps = firdes.low_pass(resamp_interp, 1.0, cutoff, trans)
        quad_rate = fs / decim
        self._plan_args = (np.asarray(chan_taps), float(fs), int(decim),
                           np.asarray(resamp_taps), int(resamp_decim),
                           float(quad_rate / (2 * np.pi * deviation)),
                           precision)
        self.plan = self._build_plan(center_freq)
        # RECOMPILE-FENCE retune (VERDICT r4 item #5 / SURVEY §8): the
        # rotated-taps Toeplitz constants bake center_freq into the trace,
        # so it is a fence parameter — set_param("center_freq", f) (locally
        # or over the control socket) rebuilds the plan and the runner
        # retraces at the next batch/chunk boundary. Junction state is raw
        # input rows, so the retuned chain re-locks seamlessly (the same
        # reason the staged xlate retunes cleanly). Retune latency = one
        # retrace (~1-5 s on the axon tunnel, sub-second on a local PJRT).
        self.declare_param("center_freq", float(center_freq),
                           dtype=np.float64, fence=True)
        self.tile = tile
        self.interpret = bool(interpret)
        if input_format == "folded":
            # items are folded rows (64 samples each, ops/pallas/
            # wbfm_chain.py layout): zero-conversion live path with
            # sig_source_folded; per-batch fold semantics, no mesh hook.
            self.relative_rate = Fraction(S, decim * resamp_decim)
            self.in_multiple = 8 * decim * resamp_decim
            self.add_input("in", "rf32", item_shape=(2 * S,))
        else:
            self.relative_rate = Fraction(1, decim * resamp_decim)
            # fold width x the kernel's tile step (8*D*Rd rows): keeps the
            # audio output block 8-row aligned on the chip
            self.in_multiple = S * 8 * decim * resamp_decim
            self.add_input("in", "cf32")
        self.add_output("out", "rf32")

    def _build_plan(self, center_freq: float):
        from newsched_tpu.ops.pallas.wbfm_chain import WbfmChainPlan

        chan_taps, fs, decim, rt, rd, gain, precision = self._plan_args
        return WbfmChainPlan(chan_taps,
                             int(nco.freq_to_dphase(center_freq, fs)),
                             decim, rt, rd, demod_gain=gain,
                             precision=precision)

    def on_fence_param(self, name, value):
        # B8/W8 depend only on tap counts, so the carry state shape (and
        # the compiled state pytree) survives the retrace unchanged.
        self.plan = self._build_plan(float(value))

    def init_state(self, nin, nout):
        from newsched_tpu.ops.pallas.wbfm_chain import S

        return {"carry": jnp.zeros((self.plan.B8, 2 * S), jnp.float32)}

    def work(self, state, ins, params, nout):
        from newsched_tpu.ops.pallas.wbfm_chain import (fold_planes,
                                                        unfold_audio,
                                                        wbfm_chain_step)

        xp = (ins["in"] if self.input_format == "folded"
              else fold_planes(ins["in"]))
        aud, carry = wbfm_chain_step(xp, state["carry"], self.plan,
                                     tile=self.tile,
                                     interpret=self.interpret)
        return {"carry": carry}, {"out": unfold_audio(aud)}

    def init_state_sharded(self, nin, nout, mesh, axis):
        return self.init_state(nin, nout)

    def work_sharded(self, state, ins, params, nout, mesh, axis):
        if self.input_format == "folded":
            raise NotImplementedError(
                "wbfm_rcv_fused(input_format='folded') has per-batch fold "
                "semantics and does not shard; use input_format='cf32' "
                "under fg.run(mesh=...)")
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from newsched_tpu.ops.pallas.wbfm_chain import (fold_planes,
                                                        unfold_audio,
                                                        wbfm_chain_step)

        nd = mesh.shape[axis]
        if nd <= 1:
            return self.work(state, ins, params, nout)
        B8 = self.plan.B8

        def fn(x_loc, carry):
            xp = fold_planes(x_loc.reshape(-1))
            bot = xp[-B8:, :]
            prev = jax.lax.ppermute(bot, axis,
                                    [(i, i + 1) for i in range(nd - 1)])
            idx = jax.lax.axis_index(axis)
            pred = jnp.where(idx == 0, carry, prev)
            aud, _ = wbfm_chain_step(xp, pred, self.plan, tile=self.tile,
                                     interpret=self.interpret)
            y = unfold_audio(aud)
            new_carry = jax.lax.psum(
                jnp.where(idx == nd - 1, bot, jnp.zeros_like(bot)), axis)
            return y, new_carry

        # pallas_call inside shard_map needs the varying-mesh-axes check
        # off (its ShapeDtypeStruct outputs carry no vma annotation);
        # kwarg name differs across jax versions.
        try:
            smapped = shard_map(fn, mesh=mesh, in_specs=(P(axis), P()),
                                out_specs=(P(axis), P()), check_vma=False)
        except TypeError:
            smapped = shard_map(fn, mesh=mesh, in_specs=(P(axis), P()),
                                out_specs=(P(axis), P()), check_rep=False)
        y, carry = smapped(ins["in"], state["carry"])
        return {"carry": carry}, {"out": y}


class sig_source_folded(Block):
    """Tone source emitting the TIME-FOLDED-LANES planes stream of the
    fused wbfm chain (ops/pallas/wbfm_chain.py layout): rf32[(128,)] rows;
    a batch of R rows carries 64*R consecutive samples, segment s of the
    batch in lanes (s, 64+s). Zero-conversion partner of
    wbfm_rcv_fused(input_format="folded") — the fused chain's live source
    pays neither the complex assembly nor the fold transpose
    (BASELINE.md config-1 live residual). Same fxpt-NCO values as
    sig_source's pallas path (ops/pallas/sources.py).

    The fold is per-batch, so this source is only meaningful feeding a
    folded-input consumer compiled at the same batch size (the model
    builder wires it); it does not shard under fg.run(mesh=...).
    """

    def __init__(self, sampling_freq: float, frequency: float = 1000.0,
                 amplitude: float = 1.0, interpret: bool = False, name=None):
        super().__init__(name)
        self.sampling_freq = float(sampling_freq)
        self.interpret = bool(interpret)
        self.add_output("out", "rf32", item_shape=(128,))
        self.declare_param("dphase", nco.freq_to_dphase(frequency, sampling_freq),
                           dtype=np.uint32)
        self.declare_param("amplitude", amplitude, dtype=np.float32)

    def set_frequency(self, freq: float) -> None:
        self.set_param("dphase", nco.freq_to_dphase(freq, self.sampling_freq))

    def init_state(self, nin, nout):
        return {"phase": jnp.zeros((), jnp.uint32)}

    def init_state_sharded(self, nin, nout, mesh, axis):
        # The folded layout is per-batch (segment s of THIS batch in lane
        # s), so a time-shard of the row stream is not a time-shard of the
        # sample stream — raise the framework error instead of letting the
        # SPMD partitioner crash on the pallas_call (VERDICT r4 weak #3).
        raise ValueError(
            f"{type(self).__name__} does not shard under fg.run(mesh=...): "
            "its folded rows have per-batch semantics. Use wbfm_live_source "
            "(which shards itself) or the cf32 sig_source path")

    def work(self, state, ins, params, nout):
        from newsched_tpu.ops.pallas.sources import nco_folded

        out = nco_folded(state["phase"], params["dphase"],
                         params["amplitude"], R=int(nout),
                         interpret=self.interpret)
        return ({"phase": nco.nco_advance(state["phase"], params["dphase"],
                                          64 * int(nout))}, {"out": out})


class wbfm_live_source(Block):
    """The LIVE wbfm receiver as ONE source kernel: the fxpt-NCO test
    tone is generated in VMEM inside the fused chain
    (ops/pallas/wbfm_chain.py wbfm_chain_live_step) — zero input HBM
    traffic and the only stream state is the phase counter. Emits the
    scalar rf32 audio stream directly; bit-identical to
    ``sig_source_folded -> wbfm_rcv_fused(input_format="folded")`` with
    the same tone/chain parameters. The wbfm twin of
    ``fm_noise_channelizer_source``. TPU only unless interpret=True.
    """

    def __init__(self, chan_taps, center_freq: float, fs: float,
                 decim: int = 4, deviation: float = 75e3,
                 resamp_interp: int = 1, resamp_decim: int = 5,
                 resamp_taps=None, frequency: float = 0.0,
                 amplitude: float = 1.0, tile: int | None = None,
                 precision="split3", interpret: bool = False, name=None):
        super().__init__(name)
        from newsched_tpu.ops.pallas.wbfm_chain import WbfmChainPlan

        if resamp_interp != 1:
            raise NotImplementedError("interp-1 resamplers only")
        if resamp_taps is None:
            from newsched_tpu.ops import firdes

            cutoff = 0.45 / max(resamp_interp, resamp_decim)
            trans = 0.1 / max(resamp_interp, resamp_decim)
            resamp_taps = firdes.low_pass(resamp_interp, 1.0, cutoff, trans)
        quad_rate = fs / decim
        self._plan_args = (np.asarray(chan_taps), float(fs), int(decim),
                           np.asarray(resamp_taps), int(resamp_decim),
                           float(quad_rate / (2 * np.pi * deviation)),
                           precision)
        self.plan = self._build_plan(center_freq)
        self.sampling_freq = float(fs)
        self.tile = tile
        self.interpret = bool(interpret)
        self.add_output("out", "rf32")
        self.declare_param("dphase", nco.freq_to_dphase(frequency, fs),
                           dtype=np.uint32, doc="tone phase increment")
        self.declare_param("amplitude", amplitude, dtype=np.float32)
        # same recompile-fence retune as wbfm_rcv_fused
        self.declare_param("center_freq", float(center_freq),
                           dtype=np.float64, fence=True)

    _build_plan = wbfm_rcv_fused._build_plan
    on_fence_param = wbfm_rcv_fused.on_fence_param

    def set_frequency(self, freq: float) -> None:
        self.set_param("dphase", nco.freq_to_dphase(freq, self.sampling_freq))

    def init_state(self, nin, nout):
        return {"phase": jnp.zeros((), jnp.uint32),
                "first": jnp.ones((), jnp.int32)}

    def work(self, state, ins, params, nout):
        from newsched_tpu.ops.pallas.wbfm_chain import (S, unfold_audio,
                                                        wbfm_chain_live_step)

        D, Rd = self.plan.D, self.plan.Rd
        if (int(nout) * D * Rd) % S:
            raise ValueError(f"audio batch {nout} not a multiple of "
                             f"{S // np.gcd(S, D * Rd)} items (fold width)")
        R = int(nout) * D * Rd // S
        aud = wbfm_chain_live_step(state["phase"], params["dphase"],
                                   params["amplitude"], state["first"],
                                   self.plan, R, tile=self.tile,
                                   interpret=self.interpret)
        return ({"phase": nco.nco_advance(state["phase"], params["dphase"],
                                          S * R),
                 "first": jnp.zeros((), jnp.int32)},
                {"out": unfold_audio(aud)})

    # -- graph-level sharding (VERDICT r4 item #1, the wbfm twin): every
    # window of the live chain is a pure function of the phase counter, so
    # each device generates its own absolute sample range — phase offset
    # ph0 + dphase * d * n_loc (uint32 wraparound) — and regenerates the
    # junction region at negative local indices in-kernel (the kernel
    # already does exactly this for batch-to-batch continuity; a neighbor's
    # shard is no different from a previous batch). ZERO collectives; the
    # only state is the replicated phase counter + first-batch flag, and
    # only device 0's first batch has a true pre-stream region.

    def init_state_sharded(self, nin, nout, mesh, axis):
        from newsched_tpu.ops.pallas.wbfm_chain import S

        D, Rd = self.plan.D, self.plan.Rd
        nd = mesh.shape[axis]
        total = int(nout) * D * Rd
        if total % (nd * S) or (int(nout) % nd):
            raise ValueError(
                f"{self.name}: batch of {nout} audio items does not split "
                f"over mesh time axis {nd} in fold-width units")
        if (total // nd) // S < self.plan.B8:
            raise ValueError(
                f"{self.name}: per-device fold {(total // nd) // S} rows < "
                f"boundary {self.plan.B8} rows — use a larger batch")
        return self.init_state(nin, nout)

    def work_sharded(self, state, ins, params, nout, mesh, axis):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from newsched_tpu.ops.pallas.wbfm_chain import (S, unfold_audio,
                                                        wbfm_chain_live_step)

        nd = mesh.shape[axis]
        if nd <= 1:
            return self.work(state, ins, params, nout)
        D, Rd = self.plan.D, self.plan.Rd
        self.init_state_sharded(0, nout, mesh, axis)  # re-validate geometry
        n_loc = int(nout) * D * Rd // nd  # scalar samples per device
        R_loc = n_loc // S

        def fn(ph, dp, amp, first):
            d = jax.lax.axis_index(axis)
            ph_d = ph + dp * jnp.uint32(n_loc) * d.astype(jnp.uint32)
            first_d = first * (d == 0).astype(jnp.int32)
            aud = wbfm_chain_live_step(ph_d, dp, amp, first_d, self.plan,
                                       R_loc, tile=self.tile,
                                       interpret=self.interpret)
            return unfold_audio(aud)

        rep = P()
        try:
            smapped = shard_map(fn, mesh=mesh, in_specs=(rep,) * 4,
                                out_specs=P(axis), check_vma=False)
        except TypeError:
            smapped = shard_map(fn, mesh=mesh, in_specs=(rep,) * 4,
                                out_specs=P(axis), check_rep=False)
        y = smapped(state["phase"], params["dphase"], params["amplitude"],
                    state["first"])
        return ({"phase": nco.nco_advance(state["phase"], params["dphase"],
                                          int(nout) * D * Rd),
                 "first": jnp.zeros((), jnp.int32)}, {"out": y})


class fir_tone_source(Block):
    """Config #0's whole chain as ONE live kernel (round 5): the fxpt-NCO
    tone is generated in VMEM and FIR-filtered (+decimated) in the same
    pass (ops/pallas/fir_source.py) — zero input HBM, and since a FIR has
    no recursive state the only stream state is the phase counter. Emits
    the filtered cf32 stream; real taps only (each [re | im] plane lane
    filters independently). The simplest gen-fused source: the config-0
    twin of fm_noise_channelizer_source / wbfm_live_source.

    Shards under fg.run(mesh=...) with ZERO collectives via per-device
    phase offsets (same argument as wbfm_live_source)."""

    def __init__(self, sampling_freq: float, taps, frequency: float = 0.0,
                 amplitude: float = 1.0, decim: int = 1,
                 tile: int | None = None, precision="split3",
                 interpret: bool = False, name=None):
        super().__init__(name)
        from fractions import Fraction

        taps = np.asarray(taps)
        if np.iscomplexobj(taps):
            raise ValueError("fir_tone_source: real taps only")
        self.taps = taps
        self.decim = int(decim)
        self.sampling_freq = float(sampling_freq)
        self.tile = tile
        self.precision = precision
        self.interpret = bool(interpret)
        self.relative_rate = Fraction(1)
        self.add_output("out", "cf32")
        self.declare_param("dphase", nco.freq_to_dphase(frequency,
                                                        sampling_freq),
                           dtype=np.uint32, doc="tone phase increment")
        self.declare_param("amplitude", amplitude, dtype=np.float32)

    def set_frequency(self, freq: float) -> None:
        self.set_param("dphase", nco.freq_to_dphase(freq, self.sampling_freq))

    def init_state(self, nin, nout):
        return {"phase": jnp.zeros((), jnp.uint32),
                "first": jnp.ones((), jnp.int32)}

    def _fold_rows(self, nout: int) -> int:
        from newsched_tpu.ops.pallas.fir_source import S

        n_samp = int(nout) * self.decim
        if n_samp % S:
            raise ValueError(f"{self.name}: batch of {nout} output items "
                             f"({n_samp} samples) not a multiple of the "
                             f"fold width ({S} samples)")
        return n_samp // S

    def work(self, state, ins, params, nout):
        from newsched_tpu.ops.pallas.fir_source import (S, fir_tone_step,
                                                        unfold_complex)

        R = self._fold_rows(nout)
        out = fir_tone_step(state["phase"], params["dphase"],
                            params["amplitude"], state["first"], self.taps,
                            self.decim, R, tile=self.tile,
                            precision=self.precision,
                            interpret=self.interpret)
        return ({"phase": nco.nco_advance(state["phase"], params["dphase"],
                                          S * R),
                 "first": jnp.zeros((), jnp.int32)},
                {"out": unfold_complex(out)})

    def init_state_sharded(self, nin, nout, mesh, axis):
        nd = mesh.shape[axis]
        if int(nout) % nd:
            raise ValueError(f"{self.name}: batch {nout} does not split "
                             f"over mesh time axis {nd}")
        self._fold_rows(int(nout) // nd)  # per-device geometry check
        return self.init_state(nin, nout)

    def work_sharded(self, state, ins, params, nout, mesh, axis):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from newsched_tpu.ops.pallas.fir_source import (S, fir_tone_step,
                                                        unfold_complex)

        nd = mesh.shape[axis]
        if nd <= 1:
            return self.work(state, ins, params, nout)
        n_loc = int(nout) * self.decim // nd
        R_loc = self._fold_rows(int(nout) // nd)

        def fn(ph, dp, amp, first):
            d = jax.lax.axis_index(axis)
            ph_d = ph + dp * jnp.uint32(n_loc) * d.astype(jnp.uint32)
            first_d = first * (d == 0).astype(jnp.int32)
            out = fir_tone_step(ph_d, dp, amp, first_d, self.taps,
                                self.decim, R_loc, tile=self.tile,
                                precision=self.precision,
                                interpret=self.interpret)
            return unfold_complex(out)

        rep = P()
        try:
            smapped = shard_map(fn, mesh=mesh, in_specs=(rep,) * 4,
                                out_specs=P(axis), check_vma=False)
        except TypeError:
            smapped = shard_map(fn, mesh=mesh, in_specs=(rep,) * 4,
                                out_specs=P(axis), check_rep=False)
        y = smapped(state["phase"], params["dphase"], params["amplitude"],
                    state["first"])
        return ({"phase": nco.nco_advance(state["phase"], params["dphase"],
                                          int(nout) * self.decim),
                 "first": jnp.zeros((), jnp.int32)}, {"out": y})
