"""The wideband-FM receive chain as ONE Pallas kernel (round 4).

Fuses BASELINE config #1 (SURVEY §3.4 analog/filter rows — the reference
runs freq_xlating_fir -> quadrature_demod -> rational_resampler as three
blocks; its cusp library fuses such chains on GPU) into a single pass:

    DMA window -> xlate FIR as TWO Toeplitz matmuls (MXU, complex via the
    planes trick) -> quadrature demod + constant phase rotation (VPU,
    polynomial atan2) -> audio decimating FIR as a Toeplitz matmul (MXU)

**Time-folded-lanes stream layout** — the TPU-native answer to a SCALAR
stream (there is no channel axis to put in the 128 lanes, so the lane
axis is TIME): each batch of n samples folds into S=64 segments
("columns") of R = n/64 consecutive samples; the in-kernel matrix is
(R, 128) f32 with lane s = re(segment s), lane 64+s = im(segment s) —
every Toeplitz matmul then processes 64 stream positions per MXU pass.

**Junction recompute makes the fold exact.** Every stage is FIR or
1-sample-memory demod, so the chain has FINITE memory: column s's first
outputs are recomputed from the last `B8` raw input rows of column s-1
(lane-rolled; column 0 reads the previous BATCH's bottom rows via the
carry state) and the warm-up outputs are discarded. In exact arithmetic the outputs
are therefore EXACTLY the infinite-stream values for every sample (in
f32 the junction state is reproduced through a differently-shaped
Toeplitz, leaving ulp-level rounding differences — property-tested at
>110 dB); batch size, fold width, and sharding cannot change them (the same warm-up
argument as the sharded channelizer, parallel/channelizer.py, where it
is a per-device mechanism; here it is per-lane).

**The output rotator folds through the demod.** The staged
freq_xlating_fir rotates the input by the fxpt-NCO phase e^{-j w n}
(w = 2*pi*dphase/2^32, exact mod 2^32); with rotated taps
c_rot[t] = c[t] e^{+j w t} the xlate output is e^{-j w m D} v[m], and the
demod product conj(u[m-1]) u[m] = conj(v[m-1]) v[m] e^{-j w D} — a
CONSTANT rotation, applied as one FMA pair before the atan2. The NCO
disappears from the kernel entirely (exact identity, not an
approximation; center_freq is consequently a compile-time parameter of
the fused block — retuning rebuilds, unlike the staged chain).

The only cross-batch state is the bottom B8 raw input rows. Interp-1
resamplers only (config #1 is (1, 5)); interp > 1 stays on the staged
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsched_tpu.ops.pallas.channelizer import _round8
from newsched_tpu.ops.pallas.fm_chain import _mm, _presplit, audio_toeplitz
from newsched_tpu.ops.pallas.mathfns import atan2

S = 64  # fold width: segments = lane pairs


def xlate_toeplitz(c_rot: np.ndarray, n_out: int, D: int, W: int):
    """Real Toeplitz pair (Hr, Hi), each (n_out, W + (n_out-1)*D + 1), for
    the complex decimating FIR on a window whose row k holds stream sample
    x[base + k - W]: output o = sum_t c[t] * x[base + o*D - t] reads window
    column W + o*D - t. W must be >= ntaps - 1 (the fold lookback)."""
    c = np.asarray(c_rot, np.complex128)
    ntaps = len(c)
    if W < ntaps - 1:
        raise ValueError(f"window lookback {W} < ntaps-1 = {ntaps - 1}")
    width = W + (n_out - 1) * D + 1
    Hr = np.zeros((n_out, width), np.float32)
    Hi = np.zeros((n_out, width), np.float32)
    for o in range(n_out):
        base = W + o * D
        for t in range(ntaps):
            Hr[o, base - t] = c[t].real
            Hi[o, base - t] = c[t].imag
    return Hr, Hi


def _pad_w(H: np.ndarray, width: int) -> np.ndarray:
    if H.shape[1] > width:
        raise ValueError(f"Toeplitz wider than window: {H.shape[1]} > {width}")
    return np.pad(H, ((0, 0), (0, width - H.shape[1])))


def _lane_sgn(rows: int, neg_low: bool):
    """(rows, 2S) pattern: -1/+1 on the low/high 64-lane half."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * S), 1)
    lo, hi = (-1.0, 1.0) if neg_low else (1.0, -1.0)
    return jnp.where(lane < S, jnp.float32(lo), jnp.float32(hi))


def _xlate_demod(win_block, cprev, hr, hi, hr_s, hi_s, *, n_out, cos_t,
                 sin_t, gain, deg, precision, first_prev_zero,
                 groups: int = 1, gstep: int = 0, W8: int = 0):
    """Shared xlate->demod for warm and steady tiles: returns the demod
    rows (n_out, 2S) and writes the new demod prev into cprev.

    groups > 1 is the round-5 BANDED xlate (VERDICT r4 weak #4): the
    Toeplitz band means output group g only reads window rows
    [g*gstep, g*gstep + gstep + W8), so instead of one
    (n_out, W8+T) matmul at ~11% density the stage runs `groups`
    (n_out/G, W8+T/G) matmuls against row-offset slices of the SAME
    window (free in VMEM) with ONE shared shifted-Toeplitz constant —
    identical arithmetic per output (the dropped columns are structural
    zeros), ~(W8+T)/(W8+T/G)x fewer MXU flops."""
    w = win_block[:, :]
    if groups > 1:
        As, Bs = [], []
        for g in range(groups):
            wg = w[g * gstep: g * gstep + gstep + W8, :]
            As.append(_mm(hr[:, :], wg, precision,
                          a_split=None if hr_s is None
                          else (hr_s[0][:, :], hr_s[1][:, :])))
            Bs.append(_mm(hi[:, :], wg, precision,
                          a_split=None if hi_s is None
                          else (hi_s[0][:, :], hi_s[1][:, :])))
        A = jnp.concatenate(As, axis=0)
        B = jnp.concatenate(Bs, axis=0)
    else:
        A = _mm(hr[:, :], w, precision,
                a_split=None if hr_s is None else (hr_s[0][:, :], hr_s[1][:, :]))
        B = _mm(hi[:, :], w, precision,
                a_split=None if hi_s is None else (hi_s[0][:, :], hi_s[1][:, :]))
    U = A + _lane_sgn(n_out, neg_low=True) * pltpu.roll(B, S, 1)
    if first_prev_zero:
        prev_head = jnp.zeros((1, 2 * S), jnp.float32)
    else:
        prev_head = cprev[:, :]
    Aprev = jnp.concatenate([prev_head, U[:-1, :]], axis=0)
    Ur = pltpu.roll(U, S, 1)
    t1 = Aprev * U
    t2 = Aprev * Ur
    PR0 = t1 + pltpu.roll(t1, S, 1)
    PI0 = _lane_sgn(n_out, neg_low=False) * (t2 - pltpu.roll(t2, S, 1))
    # constant rotation e^{-j theta} folded out of the dropped NCO
    PR = jnp.float32(cos_t) * PR0 + jnp.float32(sin_t) * PI0
    PI = jnp.float32(cos_t) * PI0 - jnp.float32(sin_t) * PR0
    d = atan2(PI, PR, deg=deg) * jnp.float32(gain)
    cprev[:, :] = U[n_out - 1: n_out, :]
    return d


def _kernel(local_hbm, bnd_ref, hwr, hwi, hxr, hxi, hxr_hi, hxr_lo,
            hxi_hi, hxi_lo, haud, haud_hi, haud_lo,
            aud_ref, win, cprev, ctail, sem, *,
            T: int, W8: int, B8: int, D: int, Rd: int, A: int,
            warm_out: int, NT: int, cos_t: float, sin_t: float,
            gain: float, precision, xg: int = 1):
    """Grid step 0 = warm-up (junction recompute from the boundary block,
    no audio emitted); steps 1..NT = tile j=i-1 over local rows
    [jT, jT+T) with a W8-row fold halo."""
    i = pl.program_id(0)
    deg = 5 if precision == "split3" else 9
    slot = jax.lax.rem(i + 1, 2)   # slot for the window step i+1 waits on
    cur_slot = jax.lax.rem(i, 2)

    # ---- DMA: prefetch next step's window ------------------------------
    @pl.when(i == 0)
    def _():
        # step 1's window: [boundary tail W8 rows (VMEM copy below);
        # local rows [0, T)]
        pltpu.make_async_copy(local_hbm.at[pl.ds(0, T), :],
                              win.at[slot, pl.ds(W8, T), :],
                              sem.at[slot]).start()

    if NT > 1:
        @pl.when((i >= 1) & (i < NT))
        def _():
            pltpu.make_async_copy(local_hbm.at[pl.ds(i * T - W8, T + W8), :],
                                  win.at[slot], sem.at[slot]).start()

    # ---- step 0: warm-up from the boundary block -----------------------
    @pl.when(i == 0)
    def _():
        d_w = _xlate_demod(bnd_ref, cprev, hwr, hwi, None, None,
                           n_out=warm_out, cos_t=cos_t, sin_t=sin_t,
                           gain=gain, deg=deg, precision=precision,
                           first_prev_zero=True)
        ctail[:, :] = d_w[warm_out - (A - 1):, :]

    # ---- steps 1..NT: steady tiles -------------------------------------
    @pl.when(i >= 1)
    def _():
        @pl.when(i == 1)
        def _():
            pltpu.make_async_copy(local_hbm.at[pl.ds(0, T), :],
                                  win.at[cur_slot, pl.ds(W8, T), :],
                                  sem.at[cur_slot]).wait()
            win[cur_slot, 0:W8, :] = bnd_ref[B8 - W8: B8, :]

        if NT > 1:
            @pl.when(i > 1)
            def _():
                pltpu.make_async_copy(
                    local_hbm.at[pl.ds((i - 1) * T - W8, T + W8), :],
                    win.at[cur_slot], sem.at[cur_slot]).wait()

        d = _xlate_demod(win.at[cur_slot], cprev, hxr, hxi,
                         (hxr_hi, hxr_lo), (hxi_hi, hxi_lo),
                         n_out=T // D, cos_t=cos_t, sin_t=sin_t, gain=gain,
                         deg=deg, precision=precision,
                         first_prev_zero=False, groups=xg, gstep=T // xg,
                         W8=W8)
        audfull = jnp.concatenate([ctail[:, :], d], axis=0)
        aud_ref[:, :] = _mm(haud[:, :], audfull, precision,
                            a_split=(haud_hi[:, :], haud_lo[:, :]))
        ctail[:, :] = d[T // D - (A - 1):, :]


def _gen_window(ph_ref, dp_ref, amp_ref, b0_ref, r_lo: int, rows: int,
                R: int):
    """Generate folded-lanes NCO samples for within-batch rows
    [r_lo, r_lo + rows) of every segment: element (w, lane) is batch
    sample seg*R + r_lo + w (seg = lane mod 64), phase = ph0 + idx*dphase
    (uint32 wraparound). Negative batch indices (only reachable on the
    FIRST batch, flagged by b0_ref) are the pre-stream region and emit 0
    — matching the cf32 graph's zero initial state. No DMA, no lane roll,
    no carry: every window of the live chain is a pure function of the
    phase counter."""
    from newsched_tpu.ops.pallas.mathfns import sin_cos_turns

    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * S), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 2 * S), 1)
    seg = lane & jnp.int32(S - 1)
    idx = seg * jnp.int32(R) + jnp.int32(r_lo) + row
    phase = ph_ref[0] + idx * dp_ref[0]
    t = phase.astype(jnp.float32) * jnp.float32(1.0 / (1 << 32))
    sn, cs = sin_cos_turns(t)
    val = jnp.where(lane < jnp.int32(S), cs, sn) * amp_ref[0]
    pre = (b0_ref[0] != 0) & (idx < 0)
    return jnp.where(pre, jnp.float32(0.0), val)


def _kernel_live(ph_ref, dp_ref, amp_ref, b0_ref,
                 hwr, hwi, hxr, hxi, hxr_hi, hxr_lo, hxi_hi, hxi_lo,
                 haud, haud_hi, haud_lo,
                 aud_ref, cprev, ctail, *,
                 T: int, W8: int, B8: int, D: int, Rd: int, A: int,
                 warm_out: int, NT: int, R: int, cos_t: float, sin_t: float,
                 gain: float, precision, xg: int = 1):
    """Live variant of ``_kernel``: the window is GENERATED in VMEM (fxpt
    NCO + polynomial sincos) instead of DMA'd — the whole live wbfm
    receiver becomes one source kernel with zero input HBM traffic (the
    wbfm twin of fm_chain's gen mode). Grid step 0 = warm-up from the
    generated boundary region; steps 1..NT = steady tiles."""
    i = pl.program_id(0)
    deg = 5 if precision == "split3" else 9

    @pl.when(i == 0)
    def _():
        bnd = _gen_window(ph_ref, dp_ref, amp_ref, b0_ref, -B8, B8, R)
        d_w = _xlate_demod(_Val(bnd), cprev, hwr, hwi, None, None,
                           n_out=warm_out, cos_t=cos_t, sin_t=sin_t,
                           gain=gain, deg=deg, precision=precision,
                           first_prev_zero=True)
        ctail[:, :] = d_w[warm_out - (A - 1):, :]

    @pl.when(i >= 1)
    def _():
        win = _gen_window(ph_ref, dp_ref, amp_ref, b0_ref,
                          (i - 1) * T - W8, W8 + T, R)
        d = _xlate_demod(_Val(win), cprev, hxr, hxi,
                         (hxr_hi, hxr_lo), (hxi_hi, hxi_lo),
                         n_out=T // D, cos_t=cos_t, sin_t=sin_t, gain=gain,
                         deg=deg, precision=precision,
                         first_prev_zero=False, groups=xg, gstep=T // xg,
                         W8=W8)
        audfull = jnp.concatenate([ctail[:, :], d], axis=0)
        aud_ref[:, :] = _mm(haud[:, :], audfull, precision,
                            a_split=(haud_hi[:, :], haud_lo[:, :]))
        ctail[:, :] = d[T // D - (A - 1):, :]


class _Val:
    """Adapter presenting a VALUE as the `[:, :]`-indexable ref interface
    `_xlate_demod` expects (its window argument is a Ref on the DMA path,
    a generated array on the live path)."""

    def __init__(self, v):
        self._v = v

    def __getitem__(self, _):
        return self._v


def _pick_groups(T: int, n_out: int, W8: int) -> int:
    """Auto group count for the banded xlate: the per-group window is
    W8 + T/G rows, so flops stop improving once T/G shrinks toward W8 —
    pick the largest G with T/G >= W8 that divides the tile cleanly
    (measured optimum on the config-1 taps: G=4 at T=640/W8=112)."""
    best = 1
    for g in range(2, 17):
        if n_out % g or (T // g) % 8 or T % g:
            continue
        if T // g < max(W8, 64) or (n_out // g) % 8:
            continue
        best = g
    return best


def _pick_tile(R: int, W8: int, D: int, Rd: int, A: int,
               target: int = 640) -> int:
    """Largest tile <= max(target, minimum) that divides R, is a multiple
    of 8*D*Rd (the audio output block must keep 8-row sublane alignment
    on the real chip), and satisfies T >= W8 (single straddle) and
    T//D >= A-1 (audio tail fits one tile)."""
    step = 8 * D * Rd
    t_min = max(W8, (A - 1) * D, step)
    best = None
    t = (min(max(target, t_min), R) // step) * step
    while t >= step:
        if R % t == 0 and t >= t_min:
            best = t
            break
        t -= step
    if best is None:
        # search upward as a fallback (small R cases)
        t = ((t_min + step - 1) // step) * step
        while t <= R:
            if R % t == 0:
                best = t
                break
            t += step
    if best is None:
        raise ValueError(
            f"no valid tile for R={R} (need a divisor that is a multiple "
            f"of {step}, >= {t_min}; pad the batch)")
    return best


class WbfmChainPlan:
    """Trace-time plan: rotated taps, rotation constants, and geometry for
    a given (chan_taps, dphase/decim, resamp_taps/decim) configuration."""

    def __init__(self, chan_taps, dphase: int, decim: int, resamp_taps,
                 resamp_decim: int, demod_gain: float,
                 precision="split3", xlate_groups: int | None = None):
        # xlate_groups: banded-xlate group count (None = auto; 1 = the
        # round-4 single dense Toeplitz). See _xlate_demod.
        self.xlate_groups = xlate_groups
        self.D = int(decim)
        self.Rd = int(resamp_decim)
        self.resamp_taps = np.asarray(resamp_taps, np.float32)
        self.A = int(len(resamp_taps))
        self.precision = precision
        self.gain = float(demod_gain)
        ntaps = int(len(chan_taps))
        self.W8 = _round8(ntaps - 1)
        # warm-up: enough recomputed xlate/demod outputs to rebuild the
        # resampler tail (A-1 rows) + the demod prev, with row 0 (pinned
        # zero-history demod) kept out of the tail
        self.warm_out = self.A + 1
        self.B8 = _round8(self.warm_out * self.D + ntaps - 1)
        w = 2 * np.pi * (int(dphase) % (1 << 32)) / (1 << 32)
        self.cos_t = float(np.cos(w * self.D))
        self.sin_t = float(np.sin(w * self.D))
        self.c_rot = (np.asarray(chan_taps, np.float64)
                      * np.exp(1j * w * np.arange(ntaps)))


def wbfm_chain_step(xp: jax.Array, carry: jax.Array, plan,
                    tile: int | None = None,
                    interpret: bool = False):
    """One batch: xp (R, 128) folded planes, carry (B8, 128) = previous
    batch's bottom rows. Returns (audio (R//(D*Rd), 128) dup-halves,
    new_carry)."""
    R = int(xp.shape[0])
    D, Rd, A = plan.D, plan.Rd, plan.A
    T = tile or _pick_tile(R, plan.W8, D, Rd, A)
    if R % T or T % D or (T // D) % Rd:
        raise ValueError(f"tile {T} incompatible with R={R}, D={D}, Rd={Rd}")
    if T < plan.W8:
        raise ValueError(f"tile {T} < W8 {plan.W8}")
    if R < plan.B8:
        raise ValueError(
            f"batch fold R={R} rows < boundary {plan.B8} rows — increase "
            f"the batch (need >= {plan.B8 * S} samples)")
    # warm window: bnd row b = x_pred[b - B8]; output w (global
    # m = w - warm_out) reads b = B8 + (w - warm_out)*D - t, i.e. the
    # Toeplitz base offset is B8 - warm_out*D.
    Hwr, Hwi = xlate_toeplitz(plan.c_rot, plan.warm_out, D,
                              plan.B8 - plan.warm_out * D)
    Hwr, Hwi = _pad_w(Hwr, plan.B8), _pad_w(Hwi, plan.B8)
    G = plan.xlate_groups or _pick_groups(T, T // D, plan.W8)
    Hxr, Hxi = xlate_toeplitz(plan.c_rot, T // D // G, D, plan.W8)
    Hxr, Hxi = _pad_w(Hxr, plan.W8 + T // G), _pad_w(Hxi, plan.W8 + T // G)
    Haud = audio_toeplitz(plan.resamp_taps, T // D, Rd)
    Hxr_hi, Hxr_lo = _presplit(Hxr)
    Hxi_hi, Hxi_lo = _presplit(Hxi)
    Haud_hi, Haud_lo = _presplit(Haud)

    # boundary block: column s <- bottom rows of column s-1 (lane roll by
    # 1 within halves); column 0 <- previous batch's column 63 (carry)
    bot = xp[R - plan.B8:, :]
    r1 = jnp.roll(bot, 1, axis=1)
    r2 = jnp.roll(carry, 65, axis=1)
    lane0 = (jnp.arange(2 * S) % S == 0)[None, :]
    bnd = jnp.where(lane0, r2, r1)

    NT = R // T
    kernel = functools.partial(
        _kernel, T=T, W8=plan.W8, B8=plan.B8, D=D, Rd=Rd, A=A,
        warm_out=plan.warm_out, NT=NT, cos_t=plan.cos_t, sin_t=plan.sin_t,
        gain=plan.gain, precision=plan.precision, xg=G)
    n_aud = R // (D * Rd)
    aud = pl.pallas_call(
        kernel,
        grid=(NT + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=pl.BlockSpec(
            (T // (D * Rd), 2 * S),
            lambda i: (jax.lax.max(i - 1, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_aud, 2 * S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, plan.W8 + T, 2 * S), jnp.float32),
            pltpu.VMEM((1, 2 * S), jnp.float32),
            pltpu.VMEM((A - 1, 2 * S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * (R // D) * 2 * S * (plan.W8 + T)
            + 2 * n_aud * 2 * S * (A - 1 + T // D),
            bytes_accessed=(R + plan.B8) * 2 * S * 4 + n_aud * 2 * S * 4,
            transcendentals=(R // D) * 2 * S,
        ),
        interpret=interpret,
    )(xp, bnd, jnp.asarray(Hwr), jnp.asarray(Hwi), jnp.asarray(Hxr),
      jnp.asarray(Hxi), Hxr_hi, Hxr_lo, Hxi_hi, Hxi_lo,
      jnp.asarray(Haud), Haud_hi, Haud_lo)
    new_carry = xp[R - plan.B8:, :]
    return aud, new_carry


def fold_planes(x: jax.Array) -> jax.Array:
    """(n,) complex scalar batch -> (n/S, 2S) time-folded planes."""
    n = int(x.shape[0])
    Xc = x.reshape(S, n // S).T
    return jnp.concatenate([jnp.real(Xc), jnp.imag(Xc)],
                           axis=1).astype(jnp.float32)


def unfold_audio(aud: jax.Array) -> jax.Array:
    """(R_a, 2S) dup-halves audio -> (R_a * S,) scalar stream order."""
    return aud[:, :S].T.reshape(-1)


def wbfm_chain_live_step(phase0, dphase, amp, first_batch, plan,
                         R: int, tile: int | None = None,
                         interpret: bool = False):
    """One batch of the LIVE wbfm receiver: a fxpt-NCO tone is generated
    in VMEM and demodulated in the same kernel pass — zero input HBM
    traffic, and the only stream state is the phase counter (+ a
    first-batch flag for the pre-stream zero region). Returns audio
    (R // (D*Rd), 2S) dup-halves planes (unfold with unfold_audio).

    Bit-equality contract: identical to sig_source_folded(same freq/amp)
    -> wbfm_rcv_fused(input_format='folded') — the generated window
    values are the same fxpt-NCO polynomial samples."""
    D, Rd, A = plan.D, plan.Rd, plan.A
    T = tile or _pick_tile(R, plan.W8, D, Rd, A)
    if R % T or T < plan.W8 or R < plan.B8:
        raise ValueError(f"invalid live tile/fold: R={R}, T={T}, "
                         f"W8={plan.W8}, B8={plan.B8}")
    Hwr, Hwi = xlate_toeplitz(plan.c_rot, plan.warm_out, D,
                              plan.B8 - plan.warm_out * D)
    Hwr, Hwi = _pad_w(Hwr, plan.B8), _pad_w(Hwi, plan.B8)
    G = plan.xlate_groups or _pick_groups(T, T // D, plan.W8)
    Hxr, Hxi = xlate_toeplitz(plan.c_rot, T // D // G, D, plan.W8)
    Hxr, Hxi = _pad_w(Hxr, plan.W8 + T // G), _pad_w(Hxi, plan.W8 + T // G)
    Haud = audio_toeplitz(plan.resamp_taps, T // D, Rd)
    Hxr_hi, Hxr_lo = _presplit(Hxr)
    Hxi_hi, Hxi_lo = _presplit(Hxi)
    Haud_hi, Haud_lo = _presplit(Haud)
    NT = R // T
    kernel = functools.partial(
        _kernel_live, T=T, W8=plan.W8, B8=plan.B8, D=D, Rd=Rd, A=A,
        warm_out=plan.warm_out, NT=NT, R=R, cos_t=plan.cos_t,
        sin_t=plan.sin_t, gain=plan.gain, precision=plan.precision, xg=G)
    n_aud = R // (D * Rd)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    aud = pl.pallas_call(
        kernel,
        grid=(NT + 1,),
        in_specs=[smem] * 4 + [vmem] * 11,
        out_specs=pl.BlockSpec(
            (T // (D * Rd), 2 * S),
            lambda i: (jax.lax.max(i - 1, 0), 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_aud, 2 * S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 2 * S), jnp.float32),
            pltpu.VMEM((A - 1, 2 * S), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * (R // D) * 2 * S * (plan.W8 + T)
            + 2 * n_aud * 2 * S * (A - 1 + T // D) + 40 * R * 2 * S,
            bytes_accessed=n_aud * 2 * S * 4,
            transcendentals=(R + R // D) * 2 * S,
        ),
        interpret=interpret,
    )(jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(phase0, jnp.uint32), (1,)), jnp.int32),
      jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(dphase, jnp.uint32), (1,)), jnp.int32),
      jnp.reshape(jnp.asarray(amp, jnp.float32), (1,)),
      jnp.reshape(jnp.asarray(first_batch, jnp.int32), (1,)),
      jnp.asarray(Hwr), jnp.asarray(Hwi), jnp.asarray(Hxr),
      jnp.asarray(Hxi), Hxr_hi, Hxr_lo, Hxi_hi, Hxi_lo,
      jnp.asarray(Haud), Haud_hi, Haud_lo)
    return aud
