"""Experiment: planes-native mega-kernel (no prep pass) vs the round-2
concat-prep path, on the flagship shape (BASELINE.md residual #2).

Both timed as K-step dependent scans with the two-point dispatch-corrected
fit (see bench.py docstring). Run on the TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

M, Lp, A, decim = 64, 16, 65, 8
GAIN = 0.5
B = 1 << 21
N_OUT = B // M


def main():
    import jax
    import jax.numpy as jnp

    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.channelizer import _round8
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step_planes
    from newsched_tpu.parallel import ShardedFMChannelizer, make_mesh
    from newsched_tpu.parallel.channelizer import planes_rows
    from newsched_tpu.utils.cplx import ComplexParts

    taps = firdes.prototype_channelizer_taps(M, Lp)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / decim, 0.1 / decim, ntaps=A)
    arm = pfb_ops.pfb_arm_taps(np.asarray(taps, np.float32), M)
    c_fold = np.asarray(arm)[::-1, ::-1].T.copy()
    H8 = _round8(Lp - 1)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5

    P = planes_rows(x, M)
    Pd = jnp.asarray(P)
    halo = jnp.asarray(P[-H8:])  # replayed stream: constant halo

    def timed(run_k, label):
        K1, K2 = 100, 400
        state, sums = run_k(K1)
        jax.block_until_ready(sums)
        totals = {}
        for k in (K1, K2):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                state, sums = run_k(k)
                s = jax.device_get(sums)
                best = min(best, time.perf_counter() - t0)
                assert np.all(np.isfinite(s)), label
            totals[k] = best
        step = (totals[K2] - totals[K1]) / (K2 - K1)
        print(f"{label}: {step*1e6:.1f} us/step = {B/step/1e6:.0f} Msps "
              f"(dispatch {1e3*(totals[K1]-K1*step):.1f} ms)")
        return B / step

    # --- planes-native (split3) ---
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_planes(k):
        z1 = jnp.zeros((1, 2 * M), jnp.float32)
        zt = jnp.zeros((A - 1, 2 * M), jnp.float32)

        def body(st, _):
            prev, tail = st
            aud, p2, t2 = fm_chain_step_planes(Pd, halo, prev, tail, c_fold,
                                               ataps, decim, GAIN,
                                               precision="split3")
            return (p2, t2), jnp.sum(jnp.abs(aud))

        return jax.lax.scan(body, (z1, zt), xs=None, length=k)

    sps_p = timed(lambda k: run_planes(k), "planes-native split3")

    # --- round-2 path (concat prep) via ShardedFMChannelizer ---
    mesh = make_mesh()
    ch = ShardedFMChannelizer(mesh, M, taps, ataps, audio_decim=decim,
                              demod_gain=GAIN)
    xp = ComplexParts(jnp.asarray(x.real), jnp.asarray(x.imag))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_old(k):
        def body(st, _):
            aud, st2 = ch.step_enc(xp, st)
            return st2, jnp.sum(jnp.abs(aud))

        return jax.lax.scan(body, ch.init_state_enc(), xs=None, length=k)

    sps_o = timed(lambda k: run_old(k), "round-2 concat-prep split3")
    print(f"speedup: {sps_p/sps_o:.3f}x")


if __name__ == "__main__":
    main()
