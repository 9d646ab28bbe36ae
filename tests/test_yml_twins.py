"""Every shipped YAML descriptor (blocks/yml/) has a handwritten twin;
this tier asserts the descriptor-built block matches the twin EXACTLY on
random data — the reference's guarantee that generated blocks and their
kernels agree (SURVEY.md §3.5 blockbuilder role; VERDICT r2 item #7).

Also exercises the round-3 descriptor upgrades: static (compile-time)
parameters shaping slices, relative_rate expressions, and port-shape
references — through the flowgraph rate algebra, not just work().
"""

import numpy as np
from fractions import Fraction
import pytest

import jax.numpy as jnp

from newsched_tpu.blocks import general, math as math_blocks, streamops
from newsched_tpu.blocks import yml_blocks
from newsched_tpu.runtime.graph import Flowgraph


def _rand(n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    if dtype == "cf32":
        return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    return rng.standard_normal(n).astype(np.float32)


# (yml class, handwritten factory, {port: dtype}, n items)
TWINS = [
    ("add_y", lambda: math_blocks.add(2), {"in0": "cf32", "in1": "cf32"}),
    ("multiply_y", lambda: math_blocks.multiply(2), {"in0": "cf32", "in1": "cf32"}),
    ("add_const_y", lambda: math_blocks.add_const(0.5 + 1j, "cf32"), {"in": "cf32"}),
    ("multiply_const_y", lambda: math_blocks.multiply_const(1.5 - 0.5j, "cf32"), {"in": "cf32"}),
    ("conjugate_y", lambda: math_blocks.conjugate(), {"in": "cf32"}),
    ("complex_to_mag_y", lambda: math_blocks.complex_to_mag(), {"in": "cf32"}),
    ("complex_to_mag_squared_y", lambda: math_blocks.complex_to_mag_squared(),
     {"in": "cf32"}),
    ("complex_to_real_y", lambda: math_blocks.complex_to_real(), {"in": "cf32"}),
    ("complex_to_imag_y", lambda: math_blocks.complex_to_imag(), {"in": "cf32"}),
    ("float_to_complex_y", lambda: math_blocks.float_to_complex(),
     {"re": "rf32", "im": "rf32"}),
    ("abs_y", lambda: math_blocks.abs_blk(), {"in": "rf32"}),
    ("nlog10_y", lambda: None, {"in": "rf32"}),  # no direct twin: checked vs formula
    ("keep_one_in_n_y", lambda: streamops.keep_one_in_n(4), {"in": "cf32"}),
    ("keep_m_in_n_y", lambda: streamops.keep_m_in_n(3, 8, offset=2), {"in": "cf32"}),
    ("repeat_y", lambda: streamops.repeat(3), {"in": "cf32"}),
    ("stream_to_vector_y", lambda: streamops.stream_to_vector(8), {"in": "cf32"}),
    ("vector_to_stream_y", lambda: streamops.vector_to_stream(8), {"in": "cf32"}),
]

YML_KWARGS = {
    "add_const_y": {"k": 0.5 + 1j},
    "multiply_const_y": {"k": 1.5 - 0.5j},
    "keep_one_in_n_y": {"n": 4},
    "keep_m_in_n_y": {"m": 3, "n": 8, "offset": 2},
    "repeat_y": {"n": 3},
    "stream_to_vector_y": {"vlen": 8},
    "vector_to_stream_y": {"vlen": 8},
}


def _run_work(blk, ins_np, n):
    ins = {k: jnp.asarray(v) for k, v in ins_np.items()}
    st = blk.init_state(n, 0)
    params = {pid: jnp.asarray(blk.get_param(pid)) for pid in blk._param_specs}
    out = blk.work(st, ins, params, n)[1]
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("yml_name,twin,port_dtypes",
                         [t for t in TWINS if t[0] != "nlog10_y"],
                         ids=[t[0] for t in TWINS if t[0] != "nlog10_y"])
def test_yml_block_matches_handwritten_twin(yml_name, twin, port_dtypes):
    n = 64
    cls = getattr(yml_blocks, yml_name)
    y = cls(**YML_KWARGS.get(yml_name, {}))
    h = twin()
    ins = {}
    for i, (port, dt) in enumerate(port_dtypes.items()):
        v = _rand(n, dt, seed=7 + i)
        if port == "in" and y.inputs[0].item_shape:
            v = v.reshape(-1, *y.inputs[0].item_shape)
        ins[port] = v
    out_y = _run_work(y, ins, n)
    out_h = _run_work(h, ins, n)
    assert set(out_y) == set(out_h)
    for k in out_y:
        np.testing.assert_array_equal(out_y[k], out_h[k],
                                      err_msg=f"{yml_name}.{k}")


def test_nlog10_matches_formula():
    x = np.abs(_rand(64, "rf32")) + 0.1
    y = yml_blocks.nlog10_y(n=10.0, k=3.0)
    out = _run_work(y, {"in": x}, 64)["out"]
    np.testing.assert_allclose(out, 10.0 * np.log10(x) + 3.0, rtol=1e-5)


def test_every_shipped_descriptor_is_covered():
    """The math module's yml coverage is total: every class the loader
    builds appears in the twin table (no silently untested descriptor)."""
    covered = {t[0] for t in TWINS}
    assert set(yml_blocks.__all__) == covered, (
        set(yml_blocks.__all__) ^ covered)


def test_static_rate_block_through_flowgraph():
    """Static-parameter descriptors integrate with the compiler's rate
    algebra: keep_one_in_n_y (rate 1/n) and repeat_y (rate n) in one graph
    reproduce the handwritten chain end-to-end."""
    x = _rand(1024, "cf32", seed=3)

    def run(mk_keep, mk_rep):
        src = general.vector_source(x)
        keep, rep = mk_keep(), mk_rep()
        snk = general.vector_sink()
        fg = Flowgraph(batch_size=256)
        fg.connect(src, 0, keep, 0)
        fg.connect(keep, 0, rep, 0)
        fg.connect(rep, 0, snk, 0)
        fg.run()
        return snk.data()

    got = run(lambda: yml_blocks.keep_one_in_n_y(n=4),
              lambda: yml_blocks.repeat_y(n=2))
    ref = run(lambda: streamops.keep_one_in_n(4), lambda: streamops.repeat(2))
    np.testing.assert_array_equal(got, ref)
    assert len(got) == len(x) // 4 * 2


def test_vector_shape_descriptor_through_flowgraph():
    """Port-shape references ([vlen]) round-trip: stream->vector->stream
    is the identity at the right rates."""
    x = _rand(512, "cf32", seed=9)
    src = general.vector_source(x)
    s2v = yml_blocks.stream_to_vector_y(vlen=8)
    v2s = yml_blocks.vector_to_stream_y(vlen=8)
    snk = general.vector_sink()
    fg = Flowgraph(batch_size=128)
    fg.connect(src, 0, s2v, 0)
    fg.connect(s2v, 0, v2s, 0)
    fg.connect(v2s, 0, snk, 0)
    fg.run()
    np.testing.assert_array_equal(snk.data(), x)


def test_yml_keep_m_in_n_reducible_rate_through_flowgraph():
    """The descriptor's in_multiple survives rate reduction: keep_m_in_n_y
    with m/n = 2/4 (reduces to 1/2) must still get batches whose input
    counts divide by 4 (the compiler's grouping-constraint fix, round 3)."""
    x = _rand(1026 * 2, "cf32", seed=4)  # indivisible-by-4 request

    def run(mk):
        src = general.vector_source(x)
        blk = mk()
        snk = general.vector_sink()
        fg = Flowgraph(batch_size=1026)  # compiler must round this up
        fg.connect(src, 0, blk, 0)
        fg.connect(blk, 0, snk, 0)
        fg.run()
        return snk.data()

    got = run(lambda: yml_blocks.keep_m_in_n_y(m=2, n=4, offset=0))
    ref = run(lambda: streamops.keep_m_in_n(2, 4))
    np.testing.assert_array_equal(got, ref)


def test_yml_static_validation_rejects_bad_params():
    """Descriptor `validate:` constraint (round 4, ADVICE fix): out-of-range
    statics fail at construction with a clear error, not mid-trace."""
    import pytest

    with pytest.raises(ValueError, match="constraint"):
        yml_blocks.keep_m_in_n_y(m=3, n=8, offset=7)  # offset+m > n
    with pytest.raises(ValueError, match="constraint"):
        yml_blocks.keep_m_in_n_y(m=0, n=8)
    yml_blocks.keep_m_in_n_y(m=3, n=8, offset=5)  # boundary: ok


def test_yml_sizing_expressions_have_no_eval_surface():
    """relative_rate / in_multiple / validate are parsed with a restricted
    AST walk — names+arithmetic only; calls/attributes/subscripts raise."""
    import pytest

    from newsched_tpu.runtime.blockspec import _eval_static

    assert _eval_static("m/n", {"m": 3, "n": 8}, frac=True) == Fraction(3, 8)
    assert _eval_static("n", {"n": 5}) == 5
    assert _eval_static("0 < m and m <= n", {"m": 2, "n": 4}) is True
    for evil in ("__import__('os')", "m.__class__", "(1,2)[0]",
                 "[x for x in (1,)]", "open('/etc/passwd')"):
        with pytest.raises(ValueError):
            _eval_static(evil, {"m": 1, "n": 2})
