"""Microbenchmarks — the analog of the reference's bench/ bm_* flowgraph
binaries and mormj/gr-bench: copy chains, fanout, FIR chains, channelizer,
each timed end-to-end through the compiled runtime on whatever backend is
active (TPU under axon, CPU otherwise).

Usage: python bench/bm_micro.py [name ...]   (default: all)
Prints one JSON line per benchmark: {"bench", "samples_per_sec", "batches"}.

Methodology matches bench.py: one jitted lax.scan over the bounded
stream, sink values fetched to force completion (see BASELINE.md notes).
Two numbers per benchmark: "samples_per_sec" is the full end-to-end run
(compile-warm; includes ONE tunnel dispatch + sink fetch — what a user
of the runtime actually gets here), "on_device_sps" is the marginal rate
between a 1x and a 4x stream length (dispatch+fetch cost cancelled —
what the compiled program itself sustains; see bench/exp_ksweep.py for
why the tunnel's fixed ~24 ms/dispatch must be separated out).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_graph(build, n_items: int, batch: int, build4=None):
    """Time a compiled flowgraph's scan over its bounded stream: run once
    to compile (the scan program is memoized on the Runner), then time the
    best of 3 steady-state reruns; the run includes the sink-value fetch,
    which is what makes the timing honest. When ``build4`` (same graph,
    4x stream) is given, also time it and report the marginal on-device
    rate with the fixed dispatch+fetch cost cancelled."""
    from newsched_tpu.runtime.runner import Runner

    def best_of(b):
        fg = b()
        fg.validate()
        runner = Runner(fg, batch_size=batch)
        runner.run_to_completion()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            runner.run_to_completion()
            best = min(best, time.perf_counter() - t0)
        return best, runner.cfg.n_batches

    t1, n_b = best_of(build)
    ondev = None
    if build4 is not None:
        t4, _ = best_of(build4)
        if t4 > t1:
            ondev = 3 * n_items / (t4 - t1)
    return n_items / t1, ondev, n_b


def bm_copy_chain(depth: int = 8, n: int = 1 << 27, batch: int = 1 << 22):
    from newsched_tpu.blocks import general

    def mk(nn):
        from newsched_tpu import Flowgraph

        fg = Flowgraph(batch_size=batch)
        src = general.null_source(dtype="rf32")
        prev = src
        for _ in range(depth):
            c = general.copy(dtype="rf32")
            fg.connect(prev, 0, c, 0)
            prev = c
        hd = general.head(nn, dtype="rf32")
        fg.connect(prev, 0, hd, 0)
        snk = general.null_sink(dtype="rf32")
        fg.connect(hd, 0, snk, 0)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_fanout(width: int = 8, n: int = 1 << 26, batch: int = 1 << 22):
    from newsched_tpu.blocks import general

    def mk(nn):
        from newsched_tpu import Flowgraph

        fg = Flowgraph(batch_size=batch)
        src = general.null_source(dtype="rf32")
        hd = general.head(nn, dtype="rf32")
        fg.connect(src, 0, hd, 0)
        for _ in range(width):
            snk = general.null_sink(dtype="rf32")
            fg.connect(hd, 0, snk, 0)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_fir_chain(depth: int = 4, ntaps: int = 64, n: int = 1 << 25, batch: int = 1 << 21):
    from newsched_tpu.blocks import analog, filter as filt, general
    from newsched_tpu.ops import firdes

    taps = firdes.low_pass(1.0, 1.0, 0.2, 0.1, ntaps=ntaps)

    def mk(nn):
        from newsched_tpu import Flowgraph

        fg = Flowgraph(batch_size=batch)
        src = analog.sig_source(1e6, "complex", frequency=1000.0)
        prev = src
        for _ in range(depth):
            f = filt.fir_filter(taps)
            fg.connect(prev, 0, f, 0)
            prev = f
        hd = general.head(nn)
        fg.connect(prev, 0, hd, 0)
        snk = general.null_sink()
        fg.connect(hd, 0, snk, 0)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_channelizer(nchans: int = 64, n: int = 1 << 26, batch: int = 1 << 22):
    from newsched_tpu.blocks import analog, filter as filt, general

    def mk(nn):
        from newsched_tpu import Flowgraph

        fg = Flowgraph(batch_size=batch)
        src = analog.noise_source("gaussian", 0.5)
        pfb = filt.pfb_channelizer(nchans, taps_per_arm=16)
        hd = general.head(nn // nchans, vlen=(nchans,))
        snk = general.null_sink(vlen=(nchans,))
        fg.connect(src, 0, pfb, 0)
        fg.connect(pfb, 0, hd, 0)
        fg.connect(hd, 0, snk, 0)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_wbfm(n: int = 1 << 25, batch: int = 1 << 21):
    """BASELINE config #1 chain (freq_xlating_fir -> quadrature_demod ->
    rational_resampler) through the graph runtime. The tone is nonzero
    (non-hoistable: the NCO phase state advances per step — round-4's
    0 Hz default let XLA hoist the source+prep out of the scan in some
    sessions, VERDICT r4 weak #1)."""
    from newsched_tpu.blocks import analog, general
    from newsched_tpu.models import wbfm_receiver

    def mk(nn):
        src = analog.sig_source(1e6, "complex", frequency=231_250.0)
        fg, blocks = wbfm_receiver(fs=1e6, batch_size=batch, sink="null",
                                   source=src,
                                   n_samples=nn // 20)  # audio rate = fs/20
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_wbfm_fused(n: int = 64 * 32640 * 16, batch: int = 64 * 32640):
    """Config #1 as ONE Pallas mega-kernel (round 4:
    models.wbfm_receiver(fused=True), time-folded-lanes layout). Compare
    with "wbfm" (the staged 3-block graph) for the fusion win. Batch is
    fold+tile constrained (64 * 8 * decim * resamp_decim multiples)."""
    from newsched_tpu.blocks import analog
    from newsched_tpu.models import wbfm_receiver

    def mk(nn):
        # same non-hoistable tone as bm_wbfm so the two rows isolate the
        # chain fusion, not the source cost (and neither can be hoisted)
        src = analog.sig_source(1e6, "complex", frequency=231_250.0)
        fg, blocks = wbfm_receiver(fs=1e6, batch_size=batch, sink="null",
                                   source=src, n_samples=nn // 20,
                                   fused=True)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_wbfm_live(n: int = 64 * 32640 * 16, batch: int = 64 * 32640):
    """Config #1 fully LIVE: the gen-fused wbfm source kernel (NCO tone
    generated in VMEM inside the chain — zero input HBM traffic;
    models.wbfm_receiver(source="live", fused=True))."""
    from newsched_tpu.models import wbfm_receiver

    def mk(nn):
        import numpy as _np

        from newsched_tpu.ops import nco as _nco

        fg, blocks = wbfm_receiver(fs=1e6, batch_size=batch, sink="null",
                                   source="live", n_samples=nn // 20,
                                   fused=True)
        # nonzero tone (the model defaults the live NCO to center_freq,
        # which is constant-valued after xlate; keep the row non-trivial)
        blocks["source"].set_param(
            "dphase", _np.uint32(_nco.freq_to_dphase(231_250.0, 1e6)))
        return fg

    # reference stream = audio items for the live source
    return _time_graph(lambda: mk(n), n, batch // 20, lambda: mk(4 * n))


def bm_fft_filter(ntaps: int = 1024, n: int = 1 << 25, batch: int = 1 << 21):
    """BASELINE config #3 kernel: overlap-save fast convolution."""
    from newsched_tpu.blocks import analog, filter as filt, general
    from newsched_tpu.ops import firdes

    taps = firdes.low_pass(1.0, 1.0, 0.1, 0.02, ntaps=ntaps)

    def mk(nn):
        from newsched_tpu import Flowgraph

        fg = Flowgraph(batch_size=batch)
        src = analog.noise_source("gaussian", 0.5)
        f = filt.fft_filter(taps)
        hd = general.head(nn)
        snk = general.null_sink()
        fg.connect(src, 0, f, 0)
        fg.connect(f, 0, hd, 0)
        fg.connect(hd, 0, snk, 0)
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


def bm_channelizer_fused(nchans: int = 64, n: int = 1 << 27, batch: int = 1 << 22):
    """The flagship chain as the fused mega-kernel flowgraph (round 3:
    models.fm_channelizer(fused=True) — planes source -> one Pallas block).
    Compare with "channelizer" (the staged-blocks graph) for the fusion
    win through the SAME runtime."""
    from newsched_tpu import models

    def mk(nn):
        fg, _ = models.fm_channelizer(
            nchans=nchans, taps_per_arm=16, audio_decim=8, batch_size=batch,
            sink="null", n_samples=nn // nchans // 8, fused=True)
        return fg

    # The planes source's reference item is a ROW (= nchans samples), so
    # the Runner's batch_size is in rows.
    return _time_graph(lambda: mk(n), n, batch // nchans, lambda: mk(4 * n))


def bm_fir_chain_live(n: int = 1 << 25, batch: int = 1 << 21):
    """Config #0 fully LIVE (round 5): fir_tone_source — the NCO tone is
    generated in VMEM and FIR-filtered in one kernel pass (zero input
    HBM, no carried state). Same-session A/B vs the staged chain
    measured 82.1 vs 101.9 us/2^21 batch (1.24x; BASELINE config-0)."""
    from newsched_tpu.models import fir_chain

    def mk(nn):
        fg, blocks = fir_chain(n_samples=nn, batch_size=batch,
                               sink="null", source="live")
        return fg

    return _time_graph(lambda: mk(n), n, batch, lambda: mk(4 * n))


ALL = {
    "copy_chain": bm_copy_chain,
    "fanout": bm_fanout,
    "fir_chain": bm_fir_chain,
    "fir_chain_live": bm_fir_chain_live,
    "channelizer": bm_channelizer,
    "channelizer_fused": bm_channelizer_fused,
    "wbfm": bm_wbfm,
    "wbfm_fused": bm_wbfm_fused,
    "wbfm_live": bm_wbfm_live,
    "fft_filter": bm_fft_filter,
}


def main(argv):
    names = argv or list(ALL)
    for name in names:
        sps, ondev, nb = ALL[name]()
        rec = {"bench": name, "samples_per_sec": round(sps), "batches": nb}
        if ondev is not None:
            rec["on_device_sps"] = round(ondev)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
