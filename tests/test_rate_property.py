"""Property-based check of the compiler's rate algebra (the machinery that
replaces the reference's forecast/consume/produce dance, SURVEY.md §4.3):
random chains of rate-changing blocks must (a) compile to integer per-edge
batch counts, (b) produce exactly the item count the algebra predicts, and
(c) be batch-split invariant — for ANY randomly drawn chain, not just the
hand-picked ones in test_runtime_graph.py.
"""

from fractions import Fraction

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from newsched_tpu.blocks import general, streamops
from newsched_tpu.runtime.compile import compile_flowgraph
from newsched_tpu.runtime.graph import Flowgraph

# A palette of scalar-stream rate-changing constructors (rf32):
STAGES = [
    (lambda: streamops.keep_one_in_n(2, dtype="rf32"), Fraction(1, 2)),
    (lambda: streamops.keep_one_in_n(3, dtype="rf32"), Fraction(1, 3)),
    (lambda: streamops.keep_m_in_n(2, 4, dtype="rf32"), Fraction(2, 4)),
    (lambda: streamops.repeat(2, dtype="rf32"), Fraction(2)),
    (lambda: streamops.repeat(3, dtype="rf32"), Fraction(3)),
    (lambda: streamops.skiphead(7, dtype="rf32"), Fraction(1)),
    (lambda: general.copy(dtype="rf32"), Fraction(1)),
]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, len(STAGES) - 1), min_size=1, max_size=4))
def test_random_rate_chain_exact(idxs):
    rate = Fraction(1)
    skip_items = 0
    for i in idxs:
        rate *= STAGES[i][1]
        if i == 5:  # skiphead(7): drops 7 items at its own input rate
            skip_items += 1

    base = 1024
    total_in = base * 2
    x = np.arange(total_in, dtype=np.float32)

    fg = Flowgraph(batch_size=base)
    src = general.vector_source(x, dtype="rf32")
    prev = src
    blocks = []
    for i in idxs:
        blk = STAGES[i][0]()
        blocks.append(blk)
        fg.connect(prev, 0, blk, 0)
        prev = blk
    snk = general.vector_sink(dtype="rf32")
    fg.connect(prev, 0, snk, 0)

    cfg = compile_flowgraph(fg, batch_size=base)
    # (a) the algebra assigned every block an integer per-batch count
    assert all(isinstance(v, int) for v in cfg.n_out.values())
    # (b) exact end-to-end output count: the compiler's bounds/lead
    # arithmetic must agree with what actually lands in the sink.
    predicted = cfg.sink_totals[snk.name]
    assume(predicted is not None and predicted > 0)
    fg.run()
    out = snk.data()
    assert out.shape[0] == predicted, (idxs, out.shape, predicted)
    # sanity: prediction equals the SEQUENTIAL floor of each stage's rate
    # (bounds floor per block — a fractional item cannot be emitted)
    if skip_items == 0:
        exp = total_in
        for i in idxs:
            r = STAGES[i][1]
            exp = exp * r.numerator // r.denominator
        assert predicted == exp, (idxs, predicted, exp)


@settings(max_examples=10, deadline=None)
@given(st.sampled_from([252, 504, 630, 840, 1260, 2520]))
def test_batch_split_invariance_random_batch(batch):
    """The same stream through the same chain at different batch sizes
    yields identical samples (the compiler's LCM sizing + state threading
    make batching unobservable)."""
    x = np.arange(2520, dtype=np.float32)  # lcm-rich length

    def run(b):
        fg = Flowgraph(batch_size=b)
        src = general.vector_source(x, dtype="rf32")
        k = streamops.keep_m_in_n(2, 3, dtype="rf32")
        r = streamops.repeat(2, dtype="rf32")
        snk = general.vector_sink(dtype="rf32")
        fg.connect(src, 0, k, 0)
        fg.connect(k, 0, r, 0)
        fg.connect(r, 0, snk, 0)
        fg.run()
        return snk.data()

    np.testing.assert_array_equal(run(2520), run(batch))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, len(STAGES) - 1), min_size=1, max_size=3),
       st.integers(0, 1023))
def test_tag_offset_remap_random_chain(idxs, tag_off):
    """Tag offsets remap exactly through ANY random rate chain: the sink's
    absolute offset equals the sequential floor-remap of each stage
    (reference: decimator/interpolator tag placement convention)."""
    assume(5 not in idxs)  # skiphead shifts offsets by its lead; chain-only
    base = 1024
    total_in = base * 2
    x = np.arange(total_in, dtype=np.float32)

    fg = Flowgraph(batch_size=base)
    src = general.vector_source(x, dtype="rf32", tags=[(tag_off, "probe", 3.5)])
    prev = src
    for i in idxs:
        blk = STAGES[i][0]()
        fg.connect(prev, 0, blk, 0)
        prev = blk
    snk = general.vector_sink(dtype="rf32")
    fg.connect(prev, 0, snk, 0)
    cfg = compile_flowgraph(fg, batch_size=base)
    total_out = cfg.sink_totals[snk.name]
    assume(total_out is not None and total_out > 0)

    # expected: per-batch relative remap (offset*num//den) applied per
    # stage, with the batch boundary crossing handled by the runtime's
    # absolute-offset reconstruction
    N = cfg.batch_ref
    b_idx, rel = divmod(tag_off, N)
    for i in idxs:
        r = STAGES[i][1]
        rel = rel * r.numerator // r.denominator
    expected = b_idx * cfg.n_in[snk.name] + rel

    fg.run()
    tags = snk.tags()
    if expected < total_out:
        assert [(t.offset, t.key) for t in tags] == [(expected, "probe")], \
            (idxs, tag_off, tags, expected)
        assert tags[0].value[0] == 3.5
    else:
        assert tags == [], (idxs, tag_off, tags, expected)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, len(STAGES) - 1), st.integers(0, len(STAGES) - 1))
def test_random_diamond_merge(i, j):
    """Diamond graphs (src -> A -> add <- B <- src): equal-rate arms must
    merge and produce the exact elementwise sum; mismatched-rate arms must
    be rejected by the compiler's input-rate check with a clear error —
    the reference's io_signature mismatch, caught statically here."""
    from newsched_tpu.blocks import math as gmath

    assume(5 not in (i, j))  # skiphead offsets the stream, not a rate issue
    ra, rb = STAGES[i][1], STAGES[j][1]
    x = np.arange(4096, dtype=np.float32)

    fg = Flowgraph(batch_size=1024)
    src = general.vector_source(x, dtype="rf32")
    a, b = STAGES[i][0](), STAGES[j][0]()
    add = gmath.add(2, dtype="rf32")
    snk = general.vector_sink(dtype="rf32")
    fg.connect(src, 0, a, 0)
    fg.connect(src, 0, b, 0)
    fg.connect(a, 0, add, 0)
    fg.connect(b, 0, add, 1)
    fg.connect(add, 0, snk, 0)

    if ra != rb:
        with np.testing.assert_raises(ValueError):
            compile_flowgraph(fg, batch_size=1024)
        return
    fg.run()
    got = snk.data()

    def one_arm(k):
        f2 = Flowgraph(batch_size=1024)
        s2 = general.vector_source(x, dtype="rf32")
        blk = STAGES[k][0]()
        k2 = general.vector_sink(dtype="rf32")
        f2.connect(s2, 0, blk, 0)
        f2.connect(blk, 0, k2, 0)
        f2.run()
        return k2.data()

    ref = one_arm(i) + one_arm(j)
    np.testing.assert_array_equal(got, ref[: len(got)])
    assert len(got) == len(ref)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, len(STAGES) - 1), min_size=1, max_size=3))
def test_random_chain_mesh_matches_single(idxs):
    """ANY random rate chain compiled with fg.run(mesh=8) produces exactly
    the single-device stream — the mesh lowering (sharding constraints +
    SPMD partitioning) is correct for the whole block palette, not just
    the hand-picked flagship graphs in test_mesh_graph.py."""
    from newsched_tpu.parallel import make_mesh

    x = np.arange(4096, dtype=np.float32)

    def run(mesh):
        fg = Flowgraph(batch_size=1024)
        src = general.vector_source(x, dtype="rf32")
        prev = src
        for i in idxs:
            blk = STAGES[i][0]()
            fg.connect(prev, 0, blk, 0)
            prev = blk
        snk = general.vector_sink(dtype="rf32")
        fg.connect(prev, 0, snk, 0)
        fg.run(mesh=mesh)
        return snk.data()

    ref = run(None)
    got = run(make_mesh(8))
    np.testing.assert_array_equal(got, ref)
