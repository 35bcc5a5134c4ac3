import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy import conv, crc
from ltesniffer_tpu.kernels import viterbi


def test_conv_encode_known_impulse():
    # single 1 at position 0, D=8: tail-biting init state is 0 here
    bits = np.zeros(8, dtype=np.uint8)
    bits[0] = 1
    d = conv.conv_encode_tb(bits)
    # first output: register = [1,0,0,0,0,0,0] -> each poly's MSB tap (x^6)
    assert tuple(d[:, 0]) == (1, 1, 1)
    assert d.shape == (3, 8)


def test_conv_encode_tail_biting_property():
    # encoder state after processing all bits must equal the initial state
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 40).astype(np.uint8)
    t = conv.trellis_tables()
    state = 0
    for i in range(1, 7):
        state |= int(bits[len(bits) - i]) << (6 - i)
    s = state
    for b in bits:
        s = int(t["next_state"][s, int(b)])
    assert s == state


def test_jax_encoder_matches_numpy():
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, size=(5, 43)).astype(np.uint8)
    got = np.asarray(viterbi.conv_encode_tb_jax(jnp.asarray(msgs)))
    for i in range(5):
        np.testing.assert_array_equal(got[i], conv.conv_encode_tb(msgs[i]))


def test_rate_match_roundtrip_indices():
    D, E = 43, 72
    maps = conv.rate_match_maps(D, E)
    assert maps["e_to_d"].shape == (E,)
    assert maps["e_to_d"].min() >= 0 and maps["e_to_d"].max() < 3 * D
    # every coded bit appears at most ceil(E/3D) times and selection is cyclic
    d = np.arange(3 * D).reshape(3, D).astype(np.int64)
    e = d.reshape(-1)[maps["e_to_d"]]
    e2 = conv.rate_match(np.arange(3 * D).reshape(3, D) % 2, E)
    assert e2.shape == (E,)


def test_viterbi_noiseless_roundtrip():
    rng = np.random.default_rng(2)
    B, D = 8, 43
    msgs = rng.integers(0, 2, size=(B, D)).astype(np.uint8)
    coded = np.stack([conv.conv_encode_tb(m) for m in msgs])   # (B, 3, D)
    llrs = (1.0 - 2.0 * coded).astype(np.float32)
    out = np.asarray(viterbi.viterbi_decode_tb(jnp.asarray(llrs)))
    np.testing.assert_array_equal(out, msgs)


def test_viterbi_with_rate_matching_and_noise():
    rng = np.random.default_rng(3)
    B, D, E = 16, 59, 4 * 72   # aggregation L=4
    msgs = rng.integers(0, 2, size=(B, D)).astype(np.uint8)
    rows = []
    for m in msgs:
        e = conv.rate_match(conv.conv_encode_tb(m), E)
        rows.append(1.0 - 2.0 * e.astype(np.float32))
    tx = np.stack(rows)
    noisy = tx + 0.5 * rng.standard_normal(tx.shape).astype(np.float32)
    llrs = np.stack([conv.de_rate_match(r, D) for r in noisy])
    out = np.asarray(viterbi.viterbi_decode_tb(jnp.asarray(llrs)))
    np.testing.assert_array_equal(out, msgs)


def test_viterbi_dci_crc_chain():
    """Full PDCCH-candidate chain: payload+CRC(rnti) -> conv -> RM -> decode."""
    rng = np.random.default_rng(4)
    payload_len, E = 27, 2 * 72
    rnti = 0xC0FE & 0xFFFF
    payload = rng.integers(0, 2, payload_len).astype(np.uint8)
    tb = crc.attach_crc(payload, crc.CRC16, mask=rnti)
    D = len(tb)
    e = conv.rate_match(conv.conv_encode_tb(tb), E)
    llr = (1.0 - 2.0 * e.astype(np.float32)) + 0.3 * rng.standard_normal(E).astype(np.float32)
    d_llr = conv.de_rate_match(llr, D)[None]
    bits = np.asarray(viterbi.viterbi_decode_tb(jnp.asarray(d_llr)))[0]
    got_rnti = crc.bits_to_int(crc.crc_bits(bits[:payload_len], crc.CRC16) ^ bits[payload_len:])
    assert got_rnti == rnti
    np.testing.assert_array_equal(bits[:payload_len], payload)


def test_viterbi_wrong_bits_fail_crc():
    """Random noise must not produce the target RNTI (sanity for blind search)."""
    rng = np.random.default_rng(5)
    D = 43
    llr = rng.standard_normal((32, 3, D)).astype(np.float32)
    bits = np.asarray(viterbi.viterbi_decode_tb(jnp.asarray(llr)))
    hits = 0
    for row in bits:
        r = crc.bits_to_int(crc.crc_bits(row[:27], crc.CRC16) ^ row[27:])
        hits += (r == 0x1234)
    assert hits == 0
