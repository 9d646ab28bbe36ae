"""Polyphase channelizer golden tests.

The decisive identity (derived in ops/pfb.py): channel k of the maximally
decimated bank equals downconvert-by-k/M -> prototype lowpass -> decimate-M.
We test exactly that against a scipy reference, plus batch-split invariance.
"""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sig

from newsched_tpu.ops import firdes, pfb
from tests.test_ops_fir import snr_db, _rand_complex


def _reference_channel(x, taps, M, k):
    """decimate_M(lfilter(taps, x * exp(-j2pi k n / M))) in float64."""
    n = np.arange(len(x))
    mixed = x.astype(np.complex128) * np.exp(-2j * np.pi * k * n / M)
    filt = sig.lfilter(taps.astype(np.float64), [1.0], mixed)
    return filt[::M]


def test_channelizer_matches_per_channel_reference():
    M, L = 8, 12
    taps = firdes.prototype_channelizer_taps(M, L, attenuation_db=80.0)
    assert len(taps) == M * L
    x = _rand_complex(4096, seed=11)
    s = pfb.pfb_init_state(M * L, dtype=jnp.complex64)
    arm = jnp.asarray(pfb.pfb_arm_taps(taps, M))
    s, Y = pfb.pfb_channelize(arm, s, jnp.asarray(x))
    Y = np.asarray(Y)  # (n_out, M)
    assert Y.shape == (4096 // M, M)
    for k in [0, 1, 3, M - 1]:
        ref = _reference_channel(x, taps, M, k)
        assert snr_db(ref, Y[:, k]) > 90, f"channel {k}"


def test_channelizer_batch_split_invariance():
    M, L = 16, 8
    taps = firdes.prototype_channelizer_taps(M, L)
    arm = jnp.asarray(pfb.pfb_arm_taps(taps, M))
    x = _rand_complex(8192, seed=12)
    s = pfb.pfb_init_state(M * L, dtype=jnp.complex64)
    _, Y_once = pfb.pfb_channelize(arm, s, jnp.asarray(x))
    s = pfb.pfb_init_state(M * L, dtype=jnp.complex64)
    parts = []
    for i in range(4):
        s, Yb = pfb.pfb_channelize(arm, s, jnp.asarray(x[i * 2048 : (i + 1) * 2048]))
        parts.append(np.asarray(Yb))
    Y_split = np.concatenate(parts, axis=0)
    assert snr_db(np.asarray(Y_once), Y_split) > 120


def test_channelizer_tone_lands_in_right_channel():
    M, L = 64, 8
    fs = 1.0
    taps = firdes.prototype_channelizer_taps(M, L)
    arm = jnp.asarray(pfb.pfb_arm_taps(taps, M))
    k = 5
    n = np.arange(64 * 256)
    x = np.exp(2j * np.pi * (k / M) * n).astype(np.complex64)
    s = pfb.pfb_init_state(M * L, dtype=jnp.complex64)
    _, Y = pfb.pfb_channelize(arm, s, jnp.asarray(x))
    Y = np.asarray(Y)[2 * L :]  # drop the zero-history startup transient
    power = np.mean(np.abs(Y) ** 2, axis=0)
    assert np.argmax(power) == k
    others = np.delete(power, k)
    assert power[k] / (others.max() + 1e-12) > 1e6  # > 60 dB isolation


def test_pfb_decimator_channel():
    M, L = 4, 10
    taps = firdes.prototype_channelizer_taps(M, L)
    arm = jnp.asarray(pfb.pfb_arm_taps(taps, M))
    x = _rand_complex(2048, seed=13)
    s = pfb.pfb_init_state(M * L, dtype=jnp.complex64)
    _, y = pfb.pfb_decimate(arm, s, jnp.asarray(x), channel=2)
    ref = _reference_channel(x, taps, M, 2)
    assert snr_db(ref, np.asarray(y)) > 90
