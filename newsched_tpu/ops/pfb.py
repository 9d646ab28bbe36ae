"""Polyphase filterbank kernels: channelizer and decimator.

TPU-native rebuild of the reference's kernel/filter/polyphase_filterbank and
blocklib/filter pfb_channelizer. The maximally-decimated M-channel analysis
bank is derived from first principles so every channel k is *mathematically
identical* to ``decimate_M(lowpass(x * exp(-j 2 pi k n / M)))``:

    y_k[m] = sum_t h[t] x[mM - t] e^{+j 2 pi k t / M}
           = sum_{p=0}^{M-1} e^{j 2 pi k p / M} * (g_p (*) u_p)[m]
    with arm taps    g_p[l] = h[lM + p]
    and arm signals  u_p[i] = x[iM - p]

i.e. per-arm streaming FIRs followed by an M-point inverse DFT across arms
(times M). The whole batch computes as one grouped conv (M groups) plus one
batched FFT — both native XLA TPU ops; a fused Pallas kernel targets the same
contract (see ops/pallas/).

Streaming state is the last ntaps-1 = M*L-1 raw input samples (identical
contract to the FIR kernel), so batch-split invariance holds exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from newsched_tpu.ops.fir import FirState, fir_init_state


class PfbState(NamedTuple):
    tail: jax.Array  # last M*L-1 input samples


def pfb_arm_taps(taps: np.ndarray, nchans: int) -> np.ndarray:
    """Partition prototype taps into per-arm taps g[p, l] = h[l*M + p].

    Pads the prototype with zeros up to a multiple of nchans (same as the
    reference, which rounds the prototype up to fill all arms).
    """
    taps = np.asarray(taps)
    L = -(-taps.shape[0] // nchans)
    padded = np.zeros(L * nchans, dtype=taps.dtype)
    padded[: taps.shape[0]] = taps
    return padded.reshape(L, nchans).T.copy()  # (M, L)


def pfb_init_state(ntaps_total: int, dtype=jnp.complex64) -> PfbState:
    return PfbState(tail=jnp.zeros((ntaps_total - 1,), dtype=dtype))


def _arm_signals(xfull: jax.Array, nchans: int, L: int, n_out: int) -> jax.Array:
    """U[p, i] = arm p's input stream with L-1 history, shape (M, L-1+n_out).

    xfull has the M*L-1 halo at the front; arm p starts at local index
    M-1-p and strides by M (see derivation in the module docstring).
    """
    M = nchans
    need = L - 1 + n_out
    # One reshape covers all arms: pad front by 0 so index M-1-p + i*M maps to
    # a (need, M) view read backwards along the arm axis.
    # xfull[M-1-p + i*M] = xfull.reshape(-1, M)[i, M-1-p] after aligning.
    usable = xfull[: need * M]
    V = usable.reshape(need, M)  # V[i, q] = xfull[i*M + q]
    return V[:, ::-1].T  # U[p, i] = V[i, M-1-p]


def pfb_channelize(
    arm_taps: jax.Array,
    state: PfbState,
    x: jax.Array,
) -> tuple[PfbState, jax.Array]:
    """Channelize one batch.

    Args:
      arm_taps: (M, L) float32 polyphase partition from pfb_arm_taps.
      state: PfbState with M*L-1 tail samples.
      x: (B,) complex64, B % M == 0.

    Returns (new_state, Y) where Y is (B//M, M) complex64 — item m is the
    M channel outputs at channel-rate sample index m; channel k is centered
    at k/M of the input rate (k > M/2 are negative frequencies).
    """
    M, L = int(arm_taps.shape[0]), int(arm_taps.shape[1])
    B = int(x.shape[0])
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by nchans {M}")
    n_out = B // M
    ntaps = M * L
    xfull = jnp.concatenate([state.tail, x])
    U = _arm_signals(xfull, M, L, n_out)  # (M, L-1+n_out) complex64
    # Per-arm valid correlation with reversed arm taps: grouped conv, one
    # group per arm, real/imag planes as batch.
    k_rev = arm_taps[:, ::-1].astype(jnp.float32)  # (M, L)
    planes = jnp.stack([jnp.real(U), jnp.imag(U)]).astype(jnp.float32)  # (2, M, n)
    out = jax.lax.conv_general_dilated(
        planes,  # (batch=2, features=M, n)
        k_rev[:, None, :],  # (out_feat=M, in_feat/groups=1, L)
        window_strides=(1,),
        padding=[(0, 0)],
        feature_group_count=M,  # depthwise: arm p convolves with kernel p
        precision=jax.lax.Precision.HIGHEST,
    )  # (2, M, n_out)
    V = jax.lax.complex(out[0], out[1])  # (M, n_out) arm outputs
    # y_k[m] = sum_p e^{+j2pi kp/M} V[p, m]  =  M * ifft over p.
    Y = (M * jnp.fft.ifft(V, axis=0)).astype(jnp.complex64)  # (M, n_out)
    new_tail = xfull[-(ntaps - 1):]
    return PfbState(tail=new_tail), Y.T  # (n_out, M)


def pfb_decimate(
    arm_taps: jax.Array,
    state: PfbState,
    x: jax.Array,
    channel: int,
) -> tuple[PfbState, jax.Array]:
    """Single-channel polyphase decimator (reference: pfb_decimator): extract
    channel `channel` of the M-channel bank. Currently computes the full bank
    and selects — XLA DCEs the unused FFT outputs poorly, so a dedicated
    weighted-combine path is a later optimization."""
    M = int(arm_taps.shape[0])
    state, Y = pfb_channelize(arm_taps, state, x)
    return state, Y[:, channel % M]
