"""EXPERIMENT: measured machine ceilings for the roofline ledger.

Methodology (both matter — earlier versions of this script got both wrong):
- Two-point K fit (T(K2)-T(K1))/(K2-K1) removes the axon tunnel's ~24 ms
  fixed per-dispatch cost (exp_ksweep.py).
- Every body is a DEPENDENT CHAIN on the full-size value. Consuming a
  slice or a factorable reduction lets XLA's algebraic simplifier delete
  the work (slice-of-dot -> dot-of-slices; sum(x*c) -> c*sum(x)), which
  produced 420 Pflop/s "measurements" before this was fixed.

Cases:
  hbm_read   — s_k = sum(|x + c_k|) over 64 MiB (read-dominated)
  hbm_rw     — x_{k+1} = x_k + c, 64 MiB carried (read+write stream)
  mxu_bf16   — a_{k+1} = (a_k @ b) * s, 4096^2 (1 bf16 pass)
  mxu_f32_default / mxu_f32_highest — same in f32 (1 / 6 passes)
  vpu_f32    — 64-deep FMA chain per element on a 2 MiB array
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K1, K2 = 40, 160


def timeit(make_run, carry):
    totals = {}
    for k in (K1, K2):
        run = make_run(k)
        c2, out = run(carry)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            c2, out = run(carry)
            jax.device_get(out)
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    return (totals[K2] - totals[K1]) / (K2 - K1)


def scan_bench(body):
    def make_run(k):
        @jax.jit
        def run(c):
            final, _ = jax.lax.scan(lambda cc, _: body(cc), c, xs=None,
                                    length=k)
            # Reduce the FINAL carry to a fetchable scalar: device_get on it
            # is what forces the whole dependent chain to execute before the
            # timer stops (returning None here measured enqueue time only).
            chk = sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                      for leaf in jax.tree_util.tree_leaves(final))
            return final, chk
        return run
    return make_run


def main():
    rng = np.random.default_rng(0)
    NB = 1 << 26  # 64 MiB f32
    x = jnp.asarray(rng.standard_normal(NB // 4).astype(np.float32))

    # read-only: sum(|x + c|) is not factorable; x re-read every step
    def rd(cc):
        c, s = cc
        return (c + 1e-9, s + jnp.sum(jnp.abs(x + c))), None

    dt = timeit(scan_bench(rd), (jnp.float32(1.0), jnp.float32(0.0)))
    print(json.dumps({"case": "hbm_read", "us": round(dt * 1e6, 1),
                      "gbps": round(NB / dt / 1e9, 1)}), flush=True)

    # rw stream: 64 MiB carried and rewritten every step
    def rw(y):
        return y + jnp.float32(1e-9), None

    dt = timeit(scan_bench(rw), x)
    print(json.dumps({"case": "hbm_rw_stream", "us": round(dt * 1e6, 1),
                      "gbps": round(2 * NB / dt / 1e9, 1)}), flush=True)

    for name, dtype, prec, n in [
        ("mxu_bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT, 4096),
        ("mxu_f32_default", jnp.float32, jax.lax.Precision.DEFAULT, 4096),
        ("mxu_f32_highest", jnp.float32, jax.lax.Precision.HIGHEST, 2048),
    ]:
        a0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(dtype)
        b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(dtype)
        scale = jnp.asarray(1.0 / np.sqrt(n), dtype)

        def mm(a, b=b, prec=prec, scale=scale):
            y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    precision=prec,
                                    preferred_element_type=jnp.float32)
            return (y * scale).astype(a.dtype), None

        dt = timeit(scan_bench(mm), a0)
        print(json.dumps({"case": name, "n": n, "us": round(dt * 1e6, 1),
                          "tflops": round(2 * n**3 / dt / 1e12, 2)}), flush=True)

    v = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))

    def vbody(cc):
        c, y = cc
        for _ in range(64):
            y = y * c + v
        return (c + 1e-9, y), None

    dt = timeit(scan_bench(vbody), (jnp.float32(0.999), v))
    print(json.dumps({"case": "vpu_f32_fma", "us": round(dt * 1e6, 1),
                      "tflops": round(2 * 64 * v.size / dt / 1e12, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
