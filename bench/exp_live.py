"""Round-4: live-source flagship through the COMPILED FLOWGRAPH.

Times models.fm_channelizer(fused=True) with its LIVE noise_planes_source
(per-batch on-device generation, no replay) under the exact Runner scan
program, two-point dispatch-corrected — comparing source methods:

  threefry  — round-3 live path (jax.random.normal per batch)
  pallas    — round-4 hardware-PRNG source (ops/pallas/noise.py)

plus the replay-source benchmark path for the same session as context.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench.py: design + timing helpers)


def live_graph(taps, audio_taps, batch: int, method: str):
    import jax

    from newsched_tpu import models
    from newsched_tpu.blocks import vector_dsp
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    M = bench.NCHANS
    B = max(batch // (M * bench.AUDIO_DECIM), 1) * M * bench.AUDIO_DECIM
    src = vector_dsp.noise_planes_source(M, amplitude=0.5, seed=11,
                                         method=method)
    fg, blks = models.fm_channelizer(
        nchans=M, taps_per_arm=bench.TAPS_PER_ARM,
        audio_decim=bench.AUDIO_DECIM, source=src, batch_size=B, sink="null",
        fused=True, deviation_frac=1.0 / (2 * np.pi * bench.DEMOD_GAIN),
        audio_taps=audio_taps)
    fg.validate()
    cfg = compile_flowgraph(fg, batch_size=B // M)
    step = cfg.step
    params_enc = cplx.encode(cfg.init_params())

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(params_enc, k_steps):
        params = cplx.decode(params_enc)

        def body(states, _):
            ns, sink_out = step(states, params)
            (chk,) = list(sink_out.values())
            return ns, chk

        states0 = cfg.init_states()
        _, sums = jax.lax.scan(body, states0, xs=None, length=k_steps)
        return sums

    return (lambda k: run_k(params_enc, k)), B


def gen_graph(taps, audio_taps, batch: int):
    """The gen-fused live flagship: fm_noise_channelizer_source -> null_sink
    (noise generated inside the mega-kernel, zero input HBM traffic)."""
    import jax

    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import general, vector_dsp
    from newsched_tpu.runtime.compile import compile_flowgraph
    from newsched_tpu.utils import cplx

    M = bench.NCHANS
    B = max(batch // (M * bench.AUDIO_DECIM), 1) * M * bench.AUDIO_DECIM
    src = vector_dsp.fm_noise_channelizer_source(
        M, taps, audio_taps, audio_decim=bench.AUDIO_DECIM,
        gain=bench.DEMOD_GAIN, amplitude=0.5, seed=11)
    snk = general.null_sink(dtype="rf32", vlen=(M,))
    fg = Flowgraph(batch_size=B // (M * bench.AUDIO_DECIM))
    fg.connect(src, 0, snk, 0)
    fg.validate()
    cfg = compile_flowgraph(fg, batch_size=B // (M * bench.AUDIO_DECIM))
    step = cfg.step
    params_enc = cplx.encode(cfg.init_params())

    @functools.partial(jax.jit, static_argnames=("k_steps",))
    def run_k(params_enc, k_steps):
        params = cplx.decode(params_enc)

        def body(states, _):
            ns, sink_out = step(states, params)
            (chk,) = list(sink_out.values())
            return ns, chk

        _, sums = jax.lax.scan(body, cfg.init_states(), xs=None,
                               length=k_steps)
        return sums

    return (lambda k: run_k(params_enc, k)), B


def main():
    taps, audio_taps = bench._design()
    results = {}
    for method in ("threefry", "pallas"):
        run_k, B = live_graph(taps, audio_taps, bench.BATCH, method)
        results[method] = bench._timed_two_point(
            run_k, f"LIVE flowgraph ({method} source)", B)
    run_k, B = gen_graph(taps, audio_taps, bench.BATCH)
    results["gen-fused"] = bench._timed_two_point(
        run_k, "LIVE flowgraph (gen-fused source kernel)", B)
    run_graph, _, xc, B = bench.graph_paths(taps, audio_taps, bench.BATCH)
    results["replay"] = bench._timed_two_point(
        run_graph, "replay flowgraph (context)", B)
    for k, v in results.items():
        print(f"{k:12s} {v/1e6:8.0f} Msps", file=sys.stderr)


if __name__ == "__main__":
    main()
