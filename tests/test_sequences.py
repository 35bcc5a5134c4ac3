import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy import sequences as seq


def _gold_reference(c_init, length):
    """Per-bit LFSR reference implementation (slow, obviously correct)."""
    Nc = 1600
    total = Nc + length + 31
    x1 = np.zeros(total, dtype=np.uint8)
    x2 = np.zeros(total, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (c_init >> i) & 1
    for n in range(total - 31):
        x1[n + 31] = x1[n + 3] ^ x1[n]
        x2[n + 31] = x2[n + 3] ^ x2[n + 2] ^ x2[n + 1] ^ x2[n]
    return x1[Nc:Nc + length] ^ x2[Nc:Nc + length]


def test_gold_sequence_matches_reference():
    for c_init in (0, 1, 0x12345, (1 << 31) - 1):
        np.testing.assert_array_equal(
            seq.gold_sequence(c_init, 200), _gold_reference(c_init, 200))


def test_gold_sequence_jax_matches_numpy():
    for c_init in (7, 0xDEAD, 2**30 + 12345):
        got = np.asarray(seq.gold_sequence_jax(c_init, 256))
        np.testing.assert_array_equal(got, seq.gold_sequence(c_init, 256))


def test_gold_sequence_jax_batched():
    inits = jnp.asarray([3, 99, 65536], dtype=jnp.uint32)
    got = np.asarray(seq.gold_sequence_jax(inits, 64))
    assert got.shape == (3, 64)
    for i, c in enumerate([3, 99, 65536]):
        np.testing.assert_array_equal(got[i], seq.gold_sequence(c, 64))


def test_pss_unit_modulus_and_distinct_roots():
    p0, p1, p2 = (seq.pss_sequence(i) for i in range(3))
    for p in (p0, p1, p2):
        np.testing.assert_allclose(np.abs(p), 1.0, atol=1e-6)
    # cross-correlation between different roots is low vs autocorrelation
    auto = np.abs(np.vdot(p0, p0))
    cross = np.abs(np.vdot(p0, p1))
    assert auto > 5 * cross


def test_pss_zc_centrosymmetry():
    # ZC of odd length: d_u(n) = d_u(N-1-n) symmetry holds for PSS per spec
    for r in range(3):
        p = seq.pss_sequence(r)
        np.testing.assert_allclose(p, p[::-1], atol=1e-5)


def test_sss_pm_one_and_distinguishes_cells_and_subframe():
    a = seq.sss_sequence(123, 1, False)
    b = seq.sss_sequence(123, 1, True)
    c = seq.sss_sequence(124, 1, False)
    for s in (a, b, c):
        np.testing.assert_array_equal(np.abs(s), np.ones(62))
    assert np.any(a != b)
    assert np.any(a != c)
    # correlation between different hypotheses is much weaker
    assert abs(np.dot(a, c)) < 31
    assert np.dot(a, a) == 62


def test_sss_m0_m1_examples():
    # N_ID_1 = 0 -> m' = 0 -> m0=0, m1=1
    assert seq.sss_m0_m1(0) == (0, 1)
    m0, m1 = seq.sss_m0_m1(167)
    assert 0 <= m0 < 31 and 0 <= m1 < 31 and m0 != m1


def test_crs_sequence_qpsk_and_dependence():
    a = seq.crs_sequence(0, 0, 0, 50)
    b = seq.crs_sequence(1, 0, 0, 50)
    assert a.shape == (100,)
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-6)
    assert np.mean(a == b) < 0.6


def test_crs_grid_layout_50prb_2ports():
    mask, vals = seq.crs_grid(n_id_cell=301, sf_idx=3, n_prb=50, nof_ports=2)
    assert mask.shape == (2, 14, 600)
    # CRS on symbols 0,4,7,11 for both ports
    for l in (0, 4, 7, 11):
        assert mask[0, l].sum() == 100
        assert mask[1, l].sum() == 100
    for l in (1, 2, 3, 5, 6, 8, 9, 10, 12, 13):
        assert mask[0, l].sum() == 0
    # port 0 and port 1 occupy complementary shifts in the same symbol
    assert not np.any(mask[0, 0] & mask[1, 0])
    # spacing of 6 subcarriers
    k = np.where(mask[0, 0])[0]
    assert np.all(np.diff(k) == 6)
    # values at mask positions are unit-modulus
    np.testing.assert_allclose(np.abs(vals[mask]), 1 / np.sqrt(2) * np.sqrt(2), atol=1e-6)
