"""Elementwise math for Pallas TPU kernels that Mosaic does not lower.

``atan2`` has no Pallas TPU lowering (NotImplementedError as of jax 0.9),
and the quadrature demodulator is built on it — so implement it with the
standard argument-reduction + odd-polynomial scheme, VPU-only ops
(abs/min/max/div/FMA/select):

    z = min(|x|,|y|) / max(|x|,|y|)          z in [0, 1]
    a = atan(z)      via odd polynomial in z
    a = pi/2 - a     if |y| > |x|
    a = pi  - a      if x < 0
    a = -a           if y < 0

The polynomial coefficients are least-squares-fit on Chebyshev nodes at
import time (float64, then cast) rather than transcribed from a table —
reproducible and checkable. Degree 9 in z^2 gives < 1e-7 max error on
[0, 1], comfortably below float32 resolution of the surrounding math.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_DEG = 9  # default polynomial degree in z^2 (odd powers z, z^3, ..., z^19)
# Measured max fit error by degree (see BASELINE.md): 9 -> 1e-9, 7 -> 4e-8,
# 5 -> 1.8e-6 (-113 dBc). Degree 5 is safely below the split3 matmul floor
# (~-96 dB), so the fused kernel drops 4 FMA steps there; float32
# evaluation noise (~1e-7) dominates beyond degree 7 anyway.
_VALID_DEGS = (5, 7, 9)


def _fit_atan_coeffs(deg: int) -> np.ndarray:
    """atan(z) ~ z * sum_k c[k] * (z^2)^k on [0, 1] (c[0] ~ 1)."""
    n = 2048
    # Chebyshev nodes mapped to (0, 1] — dense near the tricky z=1 end.
    z = (1 - np.cos(np.pi * (np.arange(n) + 0.5) / n)) / 2
    z = np.clip(z, 1e-9, 1.0)
    w = z * z
    A = np.stack([z * w**k for k in range(deg + 1)], axis=1)
    c, *_ = np.linalg.lstsq(A, np.arctan(z), rcond=None)
    return c.astype(np.float32)


_COEFFS_BY_DEG = {d: _fit_atan_coeffs(d) for d in _VALID_DEGS}
# bounds are for float32-quantized coefficients (quantization adds ~3e-8)
_FIT_BOUND = {5: 2e-6, 7: 1e-7, 9: 5e-8}
for _d, _c in _COEFFS_BY_DEG.items():
    _err = float(
        np.abs(
            np.polynomial.polynomial.polyval(
                np.linspace(0, 1, 4001) ** 2, _c.astype(np.float64)
            )
            * np.linspace(0, 1, 4001)
            - np.arctan(np.linspace(0, 1, 4001))
        ).max()
    )
    assert _err < _FIT_BOUND[_d], (_d, _err)
_COEFFS = _COEFFS_BY_DEG[_DEG]


def atan2(y, x, deg: int = _DEG):
    """Pallas-safe elementwise atan2(y, x), float32 in/out.

    Matches jnp.arctan2 to ~1e-6 absolute everywhere including the axes;
    (0, 0) returns 0 like the IEEE convention for +0/+0. ``deg`` selects
    the polynomial degree (valid: 5/7/9) — lower degrees trade accuracy
    for VPU FMA steps (table above).
    """
    coeffs = _COEFFS_BY_DEG[deg]
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, jnp.float32(1e-37))  # [0,1]; guards 0/0
    w = z * z
    acc = jnp.full_like(z, coeffs[deg])
    for k in range(deg - 1, -1, -1):
        acc = acc * w + jnp.float32(coeffs[k])
    a = z * acc
    pi = jnp.float32(np.pi)
    a = jnp.where(ay > ax, pi * 0.5 - a, a)
    a = jnp.where(x < 0, pi - a, a)
    return jnp.where(y < 0, -a, a)


# ---------------------------------------------------------------------------
# sin/cos of a turn fraction (Mosaic has no sin/cos lowering either)

_QW_DEG = 5  # quarter-wave polynomial degree in f^2


def _fit_quarter_wave():
    """Minimax-ish (least squares on Chebyshev nodes) polynomials for
    sin(pi/2 * f) (odd, coeffs over f * (f^2)^k) and cos(pi/2 * f)
    (even, coeffs over (f^2)^k) on f in [0, 1]."""
    n = 2048
    f = (1 - np.cos(np.pi * (np.arange(n) + 0.5) / n)) / 2
    w = f * f
    As = np.stack([f * w**k for k in range(_QW_DEG + 1)], axis=1)
    cs, *_ = np.linalg.lstsq(As, np.sin(np.pi / 2 * f), rcond=None)
    Ac = np.stack([w**k for k in range(_QW_DEG + 1)], axis=1)
    cc, *_ = np.linalg.lstsq(Ac, np.cos(np.pi / 2 * f), rcond=None)
    return cs.astype(np.float32), cc.astype(np.float32)


_SIN_C, _COS_C = _fit_quarter_wave()
for _name, _c, _ref in (("sin", _SIN_C, np.sin), ("cos", _COS_C, np.cos)):
    _f = np.linspace(0, 1, 4001)
    _w = _f * _f
    _acc = np.zeros_like(_f)
    for _k in range(_QW_DEG, -1, -1):
        _acc = _acc * _w + _c[_k]
    _val = _acc * _f if _name == "sin" else _acc
    assert np.abs(_val - _ref(np.pi / 2 * _f)).max() < 3e-7, _name


def sin_cos_turns(t):
    """(sin(2*pi*t), cos(2*pi*t)) for float32 ``t`` in turns (any range;
    reduced mod 1). Quarter-wave polynomials + quadrant logic, VPU-only
    ops; max error ~3e-7 + the f32 resolution of t — the same class as
    XLA's f32 sincos, for use inside Pallas kernels (NCO sources,
    rotators)."""
    t = t - jnp.floor(t)           # [0, 1) — except: for t a hair below an
    # integer turn, the f32 subtraction rounds to EXACTLY 1.0, which would
    # put u=4.0 in quadrant 4 (unhandled -> sin jumps to -1; found by the
    # wbfm live-source golden gate). Wrap the quadrant back to 0.
    u = t * jnp.float32(4.0)
    q = jnp.floor(u)
    f = u - q                      # quarter-phase in [0, 1)
    q = jnp.where(q >= 4.0, q - jnp.float32(4.0), q)
    # evaluate both quarter-wave polys at f and at 1-f (the mirrored
    # argument): sin/cos of the quadrant remainder
    w = f * f
    acc_s = jnp.full_like(f, _SIN_C[_QW_DEG])
    acc_c = jnp.full_like(f, _COS_C[_QW_DEG])
    for k in range(_QW_DEG - 1, -1, -1):
        acc_s = acc_s * w + jnp.float32(_SIN_C[k])
        acc_c = acc_c * w + jnp.float32(_COS_C[k])
    s1 = acc_s * f                 # sin(pi/2 f)
    c1 = acc_c                     # cos(pi/2 f)
    q0 = q == 0.0
    q1 = q == 1.0
    q2 = q == 2.0
    # quadrant map: (sin, cos) = q0:(s1,c1) q1:(c1,-s1) q2:(-s1,-c1) q3:(-c1,s1)
    sin = jnp.where(q0, s1, jnp.where(q1, c1, jnp.where(q2, -s1, -c1)))
    cos = jnp.where(q0, c1, jnp.where(q1, -s1, jnp.where(q2, -c1, s1)))
    return sin, cos
