"""EXPERIMENT: characterize HBM->VMEM DMA cost in the mega-kernel's shape.

exp_ablate's dma_only variant shows 4.06 us/tile for a 270 KB window copy
(~66 GB/s, 8% of the v5e HBM ceiling) and zero DMA/compute overlap. This
measures (a) raw XLA HBM streaming bandwidth on this chip (read+write of
the same 16.8 MB), (b) the dma_only Pallas loop at several tile sizes to
split fixed per-DMA latency from bandwidth, (c) dma_only with NO
double-buffering (single slot, serial) as the no-overlap reference.
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

N_ROWS = 1 << 15   # 32768 rows x 128 lanes f32 = 16.8 MB
W = 128
K = 100
H8 = 16


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
    x = jnp.asarray(rng.standard_normal((N_ROWS + H8, W)).astype(np.float32))
    nbytes = (N_ROWS + H8) * W * 4

    # (a) raw XLA streaming: y = x * c, read 16.8 MB + write 16.8 MB
    @jax.jit
    def xla_stream(c):
        def body(cc, _):
            y = x * cc
            return cc + 1e-9, jnp.sum(y[0])
        return jax.lax.scan(body, c, xs=None, length=K)

    dt = timeit(xla_stream, jnp.float32(1.0))
    print(json.dumps({"case": "xla_mul_stream", "us": round(dt * 1e6, 1),
                      "gbps_rw": round(2 * nbytes / dt / 1e9, 1)}), flush=True)

    # (b/c) Pallas manual-DMA loop, dbuf and single-slot, tile sweep
    def kern(x_hbm, c_ref, o_ref, win, sem, *, T, nslots):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        if nslots == 2:
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(x_hbm.at[pl.ds(0, T + H8), :], win.at[0],
                                      sem.at[0]).start()

            @pl.when(i + 1 < n)
            def _():
                pltpu.make_async_copy(x_hbm.at[pl.ds((i + 1) * T, T + H8), :],
                                      win.at[nslot], sem.at[nslot]).start()

            pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, T + H8), :],
                                  win.at[slot], sem.at[slot]).wait()
            o_ref[:, :] = win[slot, 0:8, :] + c_ref[:, :]
        else:
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, T + H8), :],
                                       win.at[0], sem.at[0])
            cp.start()
            cp.wait()
            o_ref[:, :] = win[0, 0:8, :] + c_ref[:, :]

    for nslots in (2, 1):
        for T in (512, 1024, 2048, 4096, 8192):
            f = pl.pallas_call(
                functools.partial(kern, T=T, nslots=nslots),
                grid=(N_ROWS // T,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec((8, W), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, W), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
                scratch_shapes=[pltpu.VMEM((nslots, T + H8, W), jnp.float32),
                                pltpu.SemaphoreType.DMA((nslots,))],
            )

            @jax.jit
            def run(c, f=f):
                def body(cc, _):
                    o = f(x, cc)
                    return cc + 1e-9, jnp.sum(o)
                return jax.lax.scan(body, c, xs=None, length=K)

            try:
                dt = timeit(run, jnp.zeros((8, W), jnp.float32))
                n_tiles = N_ROWS // T
                print(json.dumps({
                    "case": f"dma_{'dbuf' if nslots == 2 else 'single'}",
                    "tile": T,
                    "us_per_tile": round(dt / n_tiles * 1e6, 2),
                    "gbps_read": round(nbytes / dt / 1e9, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"case": f"dma_slots{nslots}", "tile": T,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
