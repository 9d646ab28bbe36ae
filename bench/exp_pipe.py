"""Experiment: software-pipelined mega-kernel (stage-B of tile i-1 overlaps
stage-A MXU of tile i) vs the serial per-tile kernel, flagship shape.
Also checks on-hardware numerical equality between the two."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

M, Lp, A, decim = 64, 16, 65, 8
B = 1 << 21
N_OUT = B // M


def main():
    import jax
    import jax.numpy as jnp

    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.channelizer import _round8
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step_planes
    from newsched_tpu.parallel.channelizer import planes_rows

    taps = firdes.prototype_channelizer_taps(M, Lp)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / decim, 0.1 / decim, ntaps=A)
    arm = pfb_ops.pfb_arm_taps(np.asarray(taps, np.float32), M)
    c_fold = np.asarray(arm)[::-1, ::-1].T.copy()
    H8 = _round8(Lp - 1)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(B) + 1j * rng.standard_normal(B)).astype(np.complex64) * 0.5
    Pn = planes_rows(x, M)
    P = jnp.asarray(Pn)
    halo = jnp.asarray(Pn[-H8:])

    def make_run(pipe):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(k):
            z1 = jnp.zeros((1, 2 * M), jnp.float32)
            zt = jnp.zeros((A - 1, 2 * M), jnp.float32)

            def body(st, _):
                prev, tail = st
                aud, p2, t2 = fm_chain_step_planes(
                    P, halo, prev, tail, c_fold, ataps, decim, 0.5,
                    pipelined=pipe, precision="split3")
                return (p2, t2), jnp.sum(jnp.abs(aud))

            return jax.lax.scan(body, (z1, zt), xs=None, length=k)

        return run

    # on-hardware equality of one batch
    one = jax.jit(lambda pipe: fm_chain_step_planes(
        P, halo, jnp.zeros((1, 2 * M), jnp.float32),
        jnp.zeros((A - 1, 2 * M), jnp.float32), c_fold, ataps, decim, 0.5,
        pipelined=pipe, precision="split3")[0], static_argnums=0)
    a_ser = np.asarray(one(False))
    a_pipe = np.asarray(one(True))
    print("on-chip pipelined vs serial max|d|:",
          float(np.abs(a_ser - a_pipe).max()), flush=True)

    for pipe in (False, True):
        run = make_run(pipe)
        K1, K2 = 100, 400
        _, sums = run(K1)
        jax.block_until_ready(sums)
        totals = {}
        for k in (K1, K2):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _, sums = run(k)
                s = jax.device_get(sums)
                best = min(best, time.perf_counter() - t0)
                assert np.all(np.isfinite(s))
            totals[k] = best
        step = (totals[K2] - totals[K1]) / (K2 - K1)
        print(f"pipelined={pipe}: {step*1e6:.1f} us/step = "
              f"{B/step/1e6:.0f} Msps", flush=True)


if __name__ == "__main__":
    main()
