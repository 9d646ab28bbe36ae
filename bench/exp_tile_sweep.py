"""EXPERIMENT: sweep the mega-kernel's grid tile size.

exp_ablate.py showed the per-tile stage deltas (fold/DFT/atan2/audio) sum
to ~1.3 us of the measured 5.9 us/tile at tile=512 — the rest is fixed
per-tile overhead (grid step + DMA issue + carry bookkeeping). Larger
tiles amortize it; this sweep measures the shipped ops/pallas/fm_chain.py
kernel (no copy) at several tile sizes and SNR-checks each against the
float64 numpy golden so a win can be adopted with the gate intact.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location("bench_root", os.path.join(_ROOT, "bench.py"))
bench_root = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and bench_root)

B = 1 << 21
M = 64
L = 16
AUDIO_DECIM = 8
A = 65
K = 100
GAIN = 0.5


def main():
    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c_fold = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M

    rng = np.random.default_rng(0)
    xc = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    xfull = np.concatenate([np.zeros(M * L - 1, np.complex64), xc])
    V = xfull[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
    vr = jnp.asarray(V.real.astype(np.float32))
    vi = jnp.asarray(V.imag.astype(np.float32))
    ref = bench_root.numpy_reference(xc, taps, ataps)

    for tile in [256, 512, 1024, 2048, 4096]:
        prev0 = jnp.zeros((1, 2 * M), jnp.float32)
        tail0 = jnp.zeros((A - 1, 2 * M), jnp.float32)

        def one(vr, vi, prev, tail, tile=tile):
            return fm_chain_step(vr, vi, prev, tail, c_fold, ataps,
                                 AUDIO_DECIM, GAIN, n_out, tile=tile)

        @jax.jit
        def run(vr, vi, carry, tile=tile):
            def body(cc, _):
                prev, tail = cc
                aud, p2, t2 = one(vr, vi, prev, tail)
                return (p2, t2), jnp.sum(jnp.abs(aud))
            return jax.lax.scan(body, carry, xs=None, length=K)

        try:
            aud0, _, _ = jax.jit(one)(vr, vi, prev0, tail0)
            aud0 = np.asarray(jax.device_get(aud0))
            snr = bench_root.snr_db(ref, aud0)
            carry, sums = run(vr, vi, (prev0, tail0))
            jax.block_until_ready(sums)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                carry, sums = run(vr, vi, carry)
                jax.device_get(sums)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "tile": tile,
                "msps": round(B * K / best / 1e6, 1),
                "us_per_step": round(best / K * 1e6, 1),
                "snr_db": round(float(snr), 1),
            }), flush=True)
        except Exception as e:  # Mosaic may reject large tiles
            print(json.dumps({"tile": tile, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
