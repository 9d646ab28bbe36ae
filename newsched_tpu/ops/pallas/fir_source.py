"""Config #0 as ONE live kernel: fxpt-NCO tone -> FIR, generated and
filtered in VMEM (round 5).

The simplest member of the gen-fused family (fm_chain.py gen mode, the
wbfm live kernel): the tone is a pure function of the phase counter and a
FIR has no recursive state, so the kernel needs NO carries, NO junction
recompute, and NO input DMA at all — each tile regenerates its own W8-row
lookback (pre-stream rows masked to zero on the first batch) and runs the
filter as a banded Toeplitz matmul on the time-folded-lanes layout
(ops/pallas/wbfm_chain.py layout: S=64 segments in lane pairs, real taps
filter the [re | im] planes in ONE matmul since lanes are independent).

Reference: SURVEY.md §3.4 sig_source + §3.3 fir_filter — BASELINE
config #0's whole chain (`models.fir_chain(source="live")`), at
speed-of-source instead of paying a 16.8 MB/batch source->filter stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from newsched_tpu.ops.pallas.channelizer import _round8
from newsched_tpu.ops.pallas.fm_chain import _mm, _presplit
from newsched_tpu.ops.pallas.wbfm_chain import _gen_window, _pick_groups

S = 64  # fold width (shared layout with wbfm_chain)


def fir_toeplitz(taps: np.ndarray, n_out: int, D: int, W: int):
    """(n_out, W + (n_out-1)*D + 1) real Toeplitz: output o =
    sum_t taps[t] x[base + o*D - t] on a window whose row k holds
    x[base + k - W]; W >= ntaps - 1."""
    t = np.asarray(taps, np.float64)
    ntaps = len(t)
    if W < ntaps - 1:
        raise ValueError(f"window lookback {W} < ntaps-1 = {ntaps - 1}")
    width = W + (n_out - 1) * D + 1
    H = np.zeros((n_out, width), np.float32)
    for o in range(n_out):
        base = W + o * D
        for tt in range(ntaps):
            H[o, base - tt] = t[tt]
    return H


def _kernel(ph_ref, dp_ref, amp_ref, b0_ref, h_ref, hhi, hlo, out_ref, *,
            T: int, W8: int, D: int, R: int, G: int, precision):
    i = pl.program_id(0)
    win = _gen_window(ph_ref, dp_ref, amp_ref, b0_ref, i * T - W8,
                      W8 + T, R)
    if G > 1:
        gstep = T // G
        out_ref[:, :] = jnp.concatenate([
            _mm(h_ref[:, :], win[g * gstep: g * gstep + gstep + W8, :],
                precision, a_split=(hhi[:, :], hlo[:, :]))
            for g in range(G)], axis=0)
    else:
        out_ref[:, :] = _mm(h_ref[:, :], win, precision,
                            a_split=(hhi[:, :], hlo[:, :]))


def _pick_tile_fir(R: int, W8: int, D: int, target: int = 512) -> int:
    # No T >= W8 floor: unlike the DMA kernels there is no straddling
    # window copy — every tile REGENERATES its own (W8 + T)-row window,
    # so any 8*D-aligned divisor of R works (small per-device shards
    # under a mesh included).
    step = 8 * D
    t_min = step
    t = (min(max(target, t_min), R) // step) * step
    while t >= step:
        if R % t == 0 and t >= t_min:
            return t
        t -= step
    t = ((t_min + step - 1) // step) * step
    while t <= R:
        if R % t == 0:
            return t
        t += step
    raise ValueError(f"no valid tile for R={R} (need a divisor that is a "
                     f"multiple of {step}, >= {t_min}; pad the batch)")


def fir_tone_step(phase0, dphase, amp, first_batch, taps: np.ndarray,
                  decim: int, R: int, tile: int | None = None,
                  precision="split3", interpret: bool = False):
    """One batch of the live filtered tone: R folded rows (= S*R samples)
    generated from the phase counter and FIR-filtered (+decimated) in one
    pass. Returns (R//decim, 2S) folded planes of the filtered complex
    stream (unfold with wbfm_chain.unfold_audio applied per half, or
    unfold_complex below). Stateless but for the caller's phase counter
    and first-batch flag (pre-stream rows emit zeros, matching the staged
    graph's zero FIR state)."""
    taps = np.asarray(taps)
    if np.iscomplexobj(taps):
        raise ValueError("fir_tone_step filters the planes with REAL taps "
                         "(each lane independently); complex taps need the "
                         "xlate formulation (ops/pallas/wbfm_chain.py)")
    D = int(decim)
    W8 = _round8(len(taps) - 1)
    T = tile or _pick_tile_fir(R, W8, D)
    if R % T or T % D:
        raise ValueError(f"tile {T} incompatible with R={R}, D={D}")
    G = _pick_groups(T, T // D, W8)
    H = fir_toeplitz(taps, T // D // G, D, W8)
    width = W8 + T // G
    if H.shape[1] > width:
        raise ValueError(f"Toeplitz wider than group window: {H.shape[1]}")
    H = np.pad(H, ((0, 0), (0, width - H.shape[1])))
    Hhi, Hlo = _presplit(H)
    NT = R // T
    kernel = functools.partial(_kernel, T=T, W8=W8, D=D, R=R, G=G,
                               precision=precision)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[smem] * 4 + [vmem] * 3,
        out_specs=pl.BlockSpec((T // D, 2 * S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R // D, 2 * S), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (R // D) * 2 * S * (W8 + T // G) + 40 * R * 2 * S,
            bytes_accessed=(R // D) * 2 * S * 4,
            transcendentals=R * 2 * S,
        ),
        interpret=interpret,
    )(jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(phase0, jnp.uint32), (1,)), jnp.int32),
      jax.lax.bitcast_convert_type(
        jnp.reshape(jnp.asarray(dphase, jnp.uint32), (1,)), jnp.int32),
      jnp.reshape(jnp.asarray(amp, jnp.float32), (1,)),
      jnp.reshape(jnp.asarray(first_batch, jnp.int32), (1,)),
      jnp.asarray(H), Hhi, Hlo)
    return out


def unfold_complex(planes: jax.Array) -> jax.Array:
    """(R, 2S) folded planes -> (R*S,) cf32 stream order."""
    r = planes[:, :S].T.reshape(-1)
    i = planes[:, S:].T.reshape(-1)
    return jax.lax.complex(r, i)
