"""Round-4 ledger experiment: where does the LIVE flagship's extra time go,
and how fast is the Pallas hardware-PRNG source vs XLA threefry?

Times, per flagship batch (32768 x 128 f32 planes rows = 16.8 MB):
  a) jax.random.normal (threefry bits + erfinv transform)  [round-3 live src]
  b) jax.random.uniform bits only (threefry, no transform)
  c) pallas gaussian_rows (hardware PRNG + Irwin-Hall)     [round-4 source]
  d) pallas gaussian_rows summed on-device (no HBM write of the rows) —
     isolates generation compute from the 16.8 MB output write

Each is a K-step scan with a dependent f32 checksum, two-point fit
(BASELINE.md methodology; run on the real chip)."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS, W = 32768, 128
K1, K2 = 100, 400


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def two_point(run_k, label):
    t0 = time.perf_counter()
    jax.block_until_ready(run_k(K1))
    log(f"{label}: compile {time.perf_counter()-t0:.1f}s")
    totals = {}
    for k in (K1, K2):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            s = jax.device_get(run_k(k))
            assert np.all(np.isfinite(s))
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    step = (totals[K2] - totals[K1]) / (K2 - K1)
    msps = ROWS * 64 / step / 1e6  # 64 wideband samples per row
    log(f"{label}: {step*1e6:8.1f} us/step  ({msps:8.0f} Msps-equivalent)")
    return step


def main():
    from newsched_tpu.ops.pallas.noise import advance_groups, gaussian_rows

    @functools.partial(jax.jit, static_argnames="k")
    def a_threefry_normal(k):
        def body(key, _):
            key, sub = jax.random.split(key)
            r = jax.random.normal(sub, (ROWS, W), jnp.float32)
            return key, jnp.sum(r)
        _, s = jax.lax.scan(body, jax.random.PRNGKey(0), xs=None, length=k)
        return s

    @functools.partial(jax.jit, static_argnames="k")
    def b_threefry_bits(k):
        def body(key, _):
            key, sub = jax.random.split(key)
            r = jax.random.bits(sub, (ROWS, W), jnp.uint32)
            return key, jnp.sum((r >> jnp.uint32(16)).astype(jnp.int32))
        _, s = jax.lax.scan(body, jax.random.PRNGKey(0), xs=None, length=k)
        return s.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames="k")
    def c_pallas_rows(k):
        def body(c, _):
            hi, lo = c
            r = gaussian_rows(hi, lo, n_rows=ROWS, width=W, seed=1)
            hi, lo = advance_groups(hi, lo, ROWS // 8)
            return (hi, lo), jnp.sum(r)
        z = jnp.zeros((), jnp.int32)
        _, s = jax.lax.scan(body, (z, z), xs=None, length=k)
        return s

    for fn, label in [(a_threefry_normal, "a) threefry+erfinv normal"),
                      (b_threefry_bits, "b) threefry bits only"),
                      (c_pallas_rows, "c) pallas hw-PRNG IH6 rows")]:
        try:
            two_point(fn, label)
        except Exception as e:
            log(f"{label}: FAILED {e!r}")


if __name__ == "__main__":
    main()
