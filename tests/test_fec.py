"""FEC tests: encoder vs a bit-exact numpy reference, Viterbi noiseless
and error-correction behavior, end-to-end graph with interleaving."""

import numpy as np
import pytest

import jax.numpy as jnp

from newsched_tpu.ops import fec


def np_conv_encode(bits, polys, K):
    """Independent shift-register reference encoder."""
    out = []
    state = 0
    for b in list(bits) + [0] * (K - 1):
        state = ((state << 1) | int(b)) & ((1 << K) - 1)
        for p in polys:
            out.append(bin(state & p).count("1") & 1)
    return np.array(out, dtype=np.int32)


@pytest.mark.parametrize("polys,K", [(fec.CC_K7_POLYS, 7), ((0o7, 0o5), 3)])
def test_conv_encode_matches_reference(polys, K):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200)
    got = np.asarray(fec.conv_encode(jnp.asarray(bits), polys, K))
    ref = np_conv_encode(bits, polys, K)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("polys,K", [(fec.CC_K7_POLYS, 7), ((0o7, 0o5), 3)])
def test_viterbi_noiseless(polys, K):
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 300)
    coded = fec.conv_encode(jnp.asarray(bits), polys, K)
    dec = np.asarray(fec.viterbi_decode(fec.hard_to_llr(coded), polys, K))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_corrects_errors():
    """K=7 rate-1/2 has free distance 10: any <=4 flipped coded bits,
    well separated, must be corrected."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 256)
    coded = np.asarray(fec.conv_encode(jnp.asarray(bits)))
    corrupted = coded.copy()
    for pos in (17, 150, 301, 450):
        corrupted[pos] ^= 1
    dec = np.asarray(fec.viterbi_decode(fec.hard_to_llr(jnp.asarray(corrupted))))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_soft_beats_hard():
    """With Gaussian noise, soft-decision decoding must fix a codeword the
    hard slicer gets wrong."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 512)
    coded = np.asarray(fec.conv_encode(jnp.asarray(bits))).astype(np.float64)
    tx = 2 * coded - 1
    noisy = tx + rng.normal(0, 0.65, tx.shape)  # ~3.7 dB Eb/N0
    assert np.any((noisy > 0) != (tx > 0))  # the channel actually flipped bits
    dec = np.asarray(fec.viterbi_decode(jnp.asarray(noisy, dtype=np.float32)))
    ber = np.mean(dec != bits)
    raw_ber = np.mean((noisy > 0).astype(int) != coded.astype(int))
    assert raw_ber > 0.02  # the channel was genuinely bad...
    assert ber < raw_ber / 5, (ber, raw_ber)  # ...and the decoder fixed it


def test_interleave_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(96).astype(np.float32)
    il = fec.block_interleave(jnp.asarray(x), rows=8)
    back = fec.block_deinterleave(il, rows=8)
    np.testing.assert_array_equal(np.asarray(back), x)
    assert not np.array_equal(np.asarray(il), x)


def test_fec_graph_end_to_end():
    """vector_source(bits) -> cc_encoder -> (to LLR) -> cc_decoder -> sink
    through the compiled graph, exercising the rational rate algebra with
    the awkward (frame+K-1)*n/frame ratio."""
    from newsched_tpu import Flowgraph
    from newsched_tpu.blocks import fec as fecb, general
    from newsched_tpu.runtime.blockspec import block_from_yaml

    frame = 128
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 4 * frame).astype(np.int16)

    to_llr = block_from_yaml("""
module: fec
block: bits_to_llr
label: Hard bits to LLR
ports:
  - {domain: stream, id: in,  direction: input,  type: ri16}
  - {domain: stream, id: out, direction: output, type: rf32}
expr: "2.0 * in_.astype(jnp.float32) - 1.0"
""")

    fg = Flowgraph(batch_size=2 * frame)
    src = general.vector_source(bits, dtype="ri16")
    enc = fecb.cc_encoder(frame_bits=frame)
    conv = to_llr()
    dec = fecb.cc_decoder(frame_bits=frame)
    snk = general.vector_sink(dtype="ri16")
    fg.connect(src, 0, enc, 0)
    fg.connect(enc, 0, conv, 0)
    fg.connect(conv, 0, dec, 0)
    fg.connect(dec, 0, snk, 0)
    fg.run()
    np.testing.assert_array_equal(snk.data(), bits)
