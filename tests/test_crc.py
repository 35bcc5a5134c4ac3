import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy import crc


def _ref_crc(bits, poly, n):
    """Straightforward polynomial long division reference."""
    msg = list(bits) + [0] * n
    poly_bits = [(poly >> (n - i)) & 1 if i > 0 else 1 for i in range(n + 1)]
    # build full divisor polynomial: x^n + poly
    divisor = [1] + [(poly >> (n - 1 - i)) & 1 for i in range(n)]
    msg = list(map(int, msg))
    for i in range(len(bits)):
        if msg[i]:
            for j in range(n + 1):
                msg[i + j] ^= divisor[j]
    return np.array(msg[len(bits):], dtype=np.uint8)


def test_crc16_against_long_division():
    rng = np.random.default_rng(0)
    for L in (21, 27, 40, 100):
        bits = rng.integers(0, 2, size=L).astype(np.uint8)
        got = crc.crc_bits(bits, crc.CRC16)
        want = _ref_crc(bits, 0x1021, 16)
        np.testing.assert_array_equal(got, want)


def test_crc24a_against_long_division():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=128).astype(np.uint8)
    np.testing.assert_array_equal(
        crc.crc_bits(bits, crc.CRC24A), _ref_crc(bits, 0x864CFB, 24))
    np.testing.assert_array_equal(
        crc.crc_bits(bits, crc.CRC24B), _ref_crc(bits, 0x800063, 24))


def test_attach_crc_roundtrip_zero_remainder():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=57).astype(np.uint8)
    coded = crc.attach_crc(bits, crc.CRC16)
    # CRC of message||crc must be zero
    assert crc.crc_bits(coded, crc.CRC16).sum() == 0


def test_attach_crc_rnti_mask():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, size=31).astype(np.uint8)
    rnti = 0x1234
    coded = crc.attach_crc(bits, crc.CRC16, mask=rnti)
    # decoder-side RNTI recovery: crc(payload) XOR received crc bits
    rem = crc.crc_bits(coded[:31], crc.CRC16) ^ coded[31:]
    assert crc.bits_to_int(rem) == rnti


def test_batched_crc_matches_numpy():
    rng = np.random.default_rng(4)
    B, L = 16, 44
    msgs = rng.integers(0, 2, size=(B, L)).astype(np.uint8)
    got = np.asarray(crc.batched_crc(jnp.asarray(msgs), crc.CRC16))
    for i in range(B):
        np.testing.assert_array_equal(got[i], crc.crc_bits(msgs[i], crc.CRC16))


def test_batched_crc_to_int_extracts_rnti():
    rng = np.random.default_rng(5)
    rntis = [1, 0xFFFF, 0x003D, 20000]
    rows = []
    for r in rntis:
        bits = rng.integers(0, 2, size=27).astype(np.uint8)
        rows.append(crc.attach_crc(bits, crc.CRC16, mask=r))
    batch = jnp.asarray(np.stack(rows))
    payload_crc = crc.batched_crc_to_int(batch[:, :27], crc.CRC16)
    weights = jnp.asarray([1 << (15 - i) for i in range(16)], dtype=jnp.int32)
    rx_crc = jnp.sum(batch[:, 27:].astype(jnp.int32) * weights, axis=-1)
    got = np.asarray(payload_crc ^ rx_crc)
    np.testing.assert_array_equal(got, rntis)
