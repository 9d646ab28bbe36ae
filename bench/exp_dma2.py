"""EXPERIMENT: why is Pallas manual DMA ~66 GB/s when XLA's fused prep
pass moves 33.7 MB in ~54 us (>600 GB/s effective)?

Hypothesis: HBM itself is fast; the per-row DMA descriptor shape matters.
The mega-kernel's window rows are 128 lanes = 512 B. Test whether wider
rows (256/512/1024 lanes) raise DMA throughput, plus XLA streams at two
sizes (fixed-overhead check) and the standalone production prep pass.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 50


def timeit(run, carry):
    carry, sums = run(carry)
    jax.block_until_ready(sums)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        carry, sums = run(carry)
        jax.device_get(sums)
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    rng = np.random.default_rng(0)

    # (a) XLA mul stream, 16.8 MB and 67 MB (fixed-overhead check)
    for nmb in (16, 64):
        n = nmb << 20
        x = jnp.asarray(rng.standard_normal(n // 4).astype(np.float32))

        @jax.jit
        def run(c, x=x):
            def body(cc, _):
                return cc + 1e-9, (x * cc)[:: 1 << 20].sum()
            return jax.lax.scan(body, c, xs=None, length=K)

        dt = timeit(run, jnp.float32(1.0))
        print(json.dumps({"case": f"xla_mul_{nmb}mb", "us": round(dt * 1e6, 1),
                          "gbps_rw": round(2 * n / dt / 1e9, 1)}), flush=True)

    # (b) the production prep expression standalone
    B = 1 << 21
    M, L = 64, 16
    H = M * L - 1
    n_out = B // M
    xr = jnp.asarray(rng.standard_normal(B).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(B).astype(np.float32))

    @jax.jit
    def run_prep(c):
        car_r, car_i = c
        def body(cc, _):
            cr, ci = cc
            xfr = jnp.concatenate([cr, xr])
            xfi = jnp.concatenate([ci, xi])
            Vr = xfr[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            Vi = xfi[: (L - 1 + n_out) * M].reshape(L - 1 + n_out, M)
            pad = 1  # to n_out + 16 rows
            vp = jnp.concatenate([jnp.pad(Vr, ((0, pad), (0, 0))),
                                  jnp.pad(Vi, ((0, pad), (0, 0)))], axis=1)
            return (xr[-H:], xi[-H:]), jnp.sum(vp[::4096, :])
        return jax.lax.scan(body, (car_r, car_i), xs=None, length=K)

    dt = timeit(run_prep, (jnp.zeros(H, jnp.float32), jnp.zeros(H, jnp.float32)))
    nbytes = 2 * B * 4  # read planes + write vp ~ 2x B*4 each way
    print(json.dumps({"case": "prep_standalone", "us": round(dt * 1e6, 1),
                      "gbps_rw": round(2 * nbytes / dt / 1e9, 1)}), flush=True)

    # (c) Pallas DMA row-width sweep: same 16.8 MB total, rows of W lanes
    NTOT = 1 << 22  # f32 elements = 16.8 MB
    for W in (128, 256, 512, 1024):
        rows = NTOT // W
        x2 = jnp.asarray(rng.standard_normal((rows, W)).astype(np.float32))
        T = max(1 << 15 >> (W // 128).bit_length(), 256)  # ~tile bytes const
        T = min(T, rows)
        while rows % T:
            T //= 2

        def kern(x_hbm, c_ref, o_ref, win, sem, *, T=T, W=W):
            i = pl.program_id(0)
            n = pl.num_programs(0)
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(x_hbm.at[pl.ds(0, T), :], win.at[0],
                                      sem.at[0]).start()

            @pl.when(i + 1 < n)
            def _():
                pltpu.make_async_copy(x_hbm.at[pl.ds((i + 1) * T, T), :],
                                      win.at[nslot], sem.at[nslot]).start()

            pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, T), :], win.at[slot],
                                  sem.at[slot]).wait()
            o_ref[:, :] = win[slot, 0:8, 0:128] + c_ref[:, :]

        f = pl.pallas_call(
            kern,
            grid=(rows // T,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, T, W), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )

        @jax.jit
        def run(c, f=f, x2=x2):
            def body(cc, _):
                return cc + 1e-9, jnp.sum(f(x2, cc))
            return jax.lax.scan(body, c, xs=None, length=K)

        try:
            dt = timeit(run, jnp.zeros((8, 128), jnp.float32))
            print(json.dumps({"case": "pallas_dma", "row_lanes": W, "tile_rows": T,
                              "us": round(dt * 1e6, 1),
                              "gbps_read": round(NTOT * 4 / dt / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": "pallas_dma", "row_lanes": W,
                              "error": str(e)[:160]}), flush=True)

    # (d) Pallas auto-pipelined BlockSpec read
    rows = NTOT // 512
    x2 = jnp.asarray(rng.standard_normal((rows, 512)).astype(np.float32))
    T = 512

    def kern2(x_ref, c_ref, o_ref):
        o_ref[:, :] = x_ref[0:8, 0:128] + c_ref[:, :]

    f = pl.pallas_call(
        kern2,
        grid=(rows // T,),
        in_specs=[pl.BlockSpec((T, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    @jax.jit
    def run(c):
        def body(cc, _):
            return cc + 1e-9, jnp.sum(f(x2, cc))
        return jax.lax.scan(body, c, xs=None, length=K)

    dt = timeit(run, jnp.zeros((8, 128), jnp.float32))
    print(json.dumps({"case": "pallas_autopipe_512", "us": round(dt * 1e6, 1),
                      "gbps_read": round(NTOT * 4 / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
