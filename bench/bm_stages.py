"""Per-stage benchmark of the flagship FM channelizer chain — which
formulation of each stage is fastest on the real TPU.

Stages (flagship shape: B=2^21, M=64 channels, L=16 taps/arm, 65-tap
audio FIR / 8):
  pfb_sum / pfb_pallas     — arm fold + FFT, jnp shifted-sum vs Pallas kernel
  demod                    — quadrature demod (conj-mul + arctan2)
  audio_conv / audio_mxu   — 64-channel 65-tap decimating FIR
  chain_<pfb>_<audio>      — full chain variants

Methodology identical to bench.py: jitted lax.scan of K dependent steps
returning per-step f32 checksums that are fetched and checked, timed at
two K values with the two-point fit removing the axon tunnel's fixed
~24 ms per-dispatch cost (see bench.py docstring / bench/exp_ksweep.py).

Usage: python bench/bm_stages.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1 << 21
M = 64
TAPS_PER_ARM = 16
AUDIO_DECIM = 8
AUDIO_NTAPS = 65
K1, K2 = 100, 400


def _mk_input(shape, complex_=True, seed=0):
    import jax.numpy as jnp

    from newsched_tpu.utils.cplx import ComplexParts

    rng = np.random.default_rng(seed)
    if complex_:
        re = rng.standard_normal(shape).astype(np.float32) * 0.5
        im = rng.standard_normal(shape).astype(np.float32) * 0.5
        return ComplexParts(jnp.asarray(re), jnp.asarray(im))
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.5)


def _time_scan(step, init_carry, n_samples, *consts):
    """step(carry, *consts) -> (carry, f32 checksum). Two-point K fit: the
    true on-device per-step rate, with the tunnel's fixed dispatch cost
    removed (round-1 naive total/K under-reported every stage ~2-3x).

    Scan-invariant arrays MUST be passed via ``consts``, not closed over:
    a closed-over device array becomes a jaxpr constant, and jax fetches
    it D2H at LOWERING time to embed it in the MLIR module — a pull the
    axon tunnel can hang on indefinitely (observed: chain benches froze
    in _array_mlir_constant_handler)."""
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(carry, k, *cs):
        def body(c, _):
            c2, s = step(c, *cs)
            return c2, s

        return jax.lax.scan(body, carry, xs=None, length=k)

    carry, sums = run(init_carry, K1, *consts)
    jax.block_until_ready(sums)
    totals = {}
    for k in (K1, K2):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            carry, sums = run(carry, k, *consts)
            s = jax.device_get(sums)
            best = min(best, time.perf_counter() - t0)
            assert np.all(np.isfinite(s)), "non-finite checksums"
        totals[k] = best
    return n_samples * (K2 - K1) / (totals[K2] - totals[K1])


def _pfb(method, combine="fft"):
    import jax.numpy as jnp

    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.utils import cplx

    taps = firdes.prototype_channelizer_taps(M, TAPS_PER_ARM)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    H = arm.size - 1
    xp = _mk_input((B,))

    def step(carry, xp):
        st = pfb_ops.PfbState(tail=cplx.decode(carry))
        st2, Y = pfb_ops.pfb_channelize(arm, st, cplx.decode(xp), method=method,
                                        combine=combine)
        return cplx.encode(st2.tail), jnp.sum(jnp.abs(jnp.real(Y)))

    import jax

    # encoded zero state built INSIDE a program (eager complex ops are
    # unsupported on the axon backend)
    init = jax.jit(lambda: cplx.encode(jnp.zeros((H,), jnp.complex64)))()
    return _time_scan(step, init, B, xp)


def bm_pfb_sum():
    return _pfb("sum")


def bm_pfb_pallas():
    return _pfb("pallas")


def bm_pfb_pallas_mm():
    return _pfb("pallas", combine="matmul")


def bm_pfb_sum_mm():
    return _pfb("sum", combine="matmul")


def bm_pfb_fused():
    return _pfb("fused")


def bm_demod():
    import jax.numpy as jnp

    from newsched_tpu.utils import cplx

    T = B // M
    Yp = _mk_input((T, M))

    def step(carry, Yp):
        Y = cplx.decode(Yp)
        prev = cplx.decode(carry)
        xprev = jnp.concatenate([prev[None, :], Y[:-1]], axis=0)
        p = jnp.conj(xprev) * Y
        aud = jnp.arctan2(jnp.imag(p), jnp.real(p))
        return cplx.encode(Y[-1]), jnp.sum(aud)

    import jax

    init = jax.jit(lambda: cplx.encode(jnp.zeros((M,), jnp.complex64)))()
    return _time_scan(step, init, B, Yp)


def _audio(method):
    import jax
    import jax.numpy as jnp

    from newsched_tpu.ops import fir as fir_ops, firdes

    T = B // M
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=AUDIO_NTAPS).astype(np.float32)
    aud = _mk_input((M, T), complex_=False)

    def step(tails, aud):
        def one(tail, ch):
            st, y = fir_ops.fir_filter(ataps, fir_ops.FirState(tail=tail), ch,
                                       decim=AUDIO_DECIM, method=method)
            return st.tail, y

        new_tails, ys = jax.vmap(one)(tails, aud)
        return new_tails, jnp.sum(ys)

    init = jnp.zeros((M, AUDIO_NTAPS - 1), jnp.float32)
    return _time_scan(step, init, B, aud)


def bm_audio_conv():
    return _audio("conv")


def bm_audio_mxu():
    return _audio("mxu")


def _chain(pfb_method, audio_method, pfb_combine="fft",
           chain_method="stages"):
    from newsched_tpu.ops import firdes
    from newsched_tpu.parallel import ShardedFMChannelizer, make_mesh

    taps = firdes.prototype_channelizer_taps(M, TAPS_PER_ARM)
    audio_taps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                                 ntaps=AUDIO_NTAPS)
    ch = ShardedFMChannelizer(make_mesh(), M, taps, audio_taps,
                              audio_decim=AUDIO_DECIM, demod_gain=0.5,
                              audio_method=audio_method, pfb_method=pfb_method,
                              pfb_combine=pfb_combine, chain_method=chain_method)
    xp = _mk_input((B,))

    def step(state, xp):
        import jax.numpy as jnp

        audio, st2 = ch.step_enc(xp, state)
        return st2, jnp.sum(jnp.abs(audio))

    return _time_scan(step, ch.init_state_enc(), B, xp)


def bm_chain_sum_conv():
    return _chain("sum", "conv")


def bm_chain_pallas_conv():
    return _chain("pallas", "conv")


def bm_chain_sum_mxu():
    return _chain("sum", "mxu")


def bm_chain_pallas_mxu():
    return _chain("pallas", "mxu")


def bm_chain_pallas_mxu_mm():
    return _chain("pallas", "mxu", pfb_combine="matmul")


def bm_chain_fused_mxu():
    return _chain("fused", "mxu")


def bm_chain_mega():
    return _chain("fused", "mxu", chain_method="megakernel")


def bm_mega_kernel_only():
    """fm_chain_step with the planes window pre-staged: isolates the
    kernel from the XLA input-staging glue in chain_mega."""
    import jax
    import jax.numpy as jnp

    from newsched_tpu.ops import firdes, pfb as pfb_ops
    from newsched_tpu.ops.pallas.fm_chain import fm_chain_step

    L = TAPS_PER_ARM
    A = AUDIO_NTAPS
    taps = firdes.prototype_channelizer_taps(M, L)
    ataps = firdes.low_pass(1.0, 1.0, 0.4 / AUDIO_DECIM, 0.1 / AUDIO_DECIM,
                            ntaps=A).astype(np.float32)
    arm = pfb_ops.pfb_arm_taps(taps.astype(np.float32), M)
    c = np.asarray(arm)[::-1, ::-1].T.copy()
    n_out = B // M
    rng = np.random.default_rng(0)
    vr = jnp.asarray(rng.standard_normal((n_out + L, M)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((n_out + L, M)).astype(np.float32))

    def step(carry, vr, vi):
        prev, tail = carry
        aud, prev2, tail2 = fm_chain_step(vr, vi, prev, tail, c, ataps,
                                          AUDIO_DECIM, 0.5, n_out)
        return (prev2, tail2), jnp.sum(jnp.abs(aud))

    init = (jnp.zeros((1, 2 * M), jnp.float32),
            jnp.zeros((A - 1, 2 * M), jnp.float32))
    return _time_scan(step, init, B, vr, vi)


ALL = {
    "pfb_sum": bm_pfb_sum,
    "pfb_pallas": bm_pfb_pallas,
    "pfb_pallas_mm": bm_pfb_pallas_mm,
    "pfb_sum_mm": bm_pfb_sum_mm,
    "pfb_fused": bm_pfb_fused,
    "demod": bm_demod,
    "audio_conv": bm_audio_conv,
    "audio_mxu": bm_audio_mxu,
    "chain_sum_conv": bm_chain_sum_conv,
    "chain_pallas_conv": bm_chain_pallas_conv,
    "chain_sum_mxu": bm_chain_sum_mxu,
    "chain_pallas_mxu": bm_chain_pallas_mxu,
    "chain_pallas_mxu_mm": bm_chain_pallas_mxu_mm,
    "chain_fused_mxu": bm_chain_fused_mxu,
    "chain_mega": bm_chain_mega,
    "mega_kernel_only": bm_mega_kernel_only,
}


def main(argv):
    names = argv or list(ALL)
    for name in names:
        try:
            sps = ALL[name]()
            print(json.dumps({"bench": name, "msps": round(sps / 1e6, 1)}), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"bench": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
