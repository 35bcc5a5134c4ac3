"""PUSCH uplink chain e2e tests: SC-FDMA TX -> DMRS chest -> decode."""
import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import tables, ul_dmrs
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import pusch_rx

CELL = CellConfig(n_id_cell=147, n_prb=50, nof_ports=2, nof_rx_ant=1)


def _tx_rx(grants, sf_idx, rng, noise=0.03, cs_cfg=0):
    g = encoder.build_ul_subframe(CELL, sf_idx, grants, cyclic_shift_cfg=cs_cfg)
    # UL channel: single UE antenna -> single RX port
    h = encoder.flat_channel(CELL, 1, rng)[:, :1]   # (1,1,14,n_sc)
    rx = np.einsum("rpls,pls->rls", h, g)
    rx = rx + noise / np.sqrt(2) * (rng.standard_normal(rx.shape)
                                    + 1j * rng.standard_normal(rx.shape))
    iq = encoder.ul_subframe_iq(CELL, rx.astype(np.complex64))
    fe = pusch_rx.make_ul_frontend(CELL)
    grid = fe(jnp.asarray(iq[None].astype(np.complex64)))
    return np.asarray(grid[0])


def _grant(rnti, prb_start, n_prb, qm, i_tbs, rng, **kw):
    tbs = tables.tbs_lookup(i_tbs, n_prb)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    return dict(rnti=rnti, prb_start=prb_start, n_prb=n_prb, qm=qm,
                tb_bits=tb, tbs=tbs, **kw)


def test_pusch_qpsk_roundtrip():
    rng = np.random.default_rng(0)
    gr = _grant(0x7101, 4, 10, 2, 6, rng)
    grid = _tx_rx([gr], 2, rng)
    res = pusch_rx.decode_grant_ul(grid, CELL, 2, gr["rnti"], 4, 10, 2,
                                   gr["tbs"])
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, gr["tb_bits"])
    assert res.snr_db > 15
    assert abs(res.ta_us) < 1.0


def test_pusch_16qam_and_64qam():
    rng = np.random.default_rng(1)
    for qm, i_tbs in ((4, 12), (6, 20)):
        gr = _grant(0x7202, 10, 20, qm, i_tbs, rng)
        grid = _tx_rx([gr], 4, rng, noise=0.02)
        res = pusch_rx.decode_grant_ul(grid, CELL, 4, gr["rnti"], 10, 20, qm,
                                       gr["tbs"])
        assert res.crc_ok, qm
        np.testing.assert_array_equal(res.tb_bits, gr["tb_bits"])


def test_pusch_two_ues_same_subframe():
    rng = np.random.default_rng(2)
    g1 = _grant(0x7303, 0, 8, 2, 5, rng)
    g2 = _grant(0x7404, 20, 12, 4, 10, rng, dmrs_field=3)
    grid = _tx_rx([g1, g2], 7, rng)
    r1 = pusch_rx.decode_grant_ul(grid, CELL, 7, g1["rnti"], 0, 8, 2,
                                  g1["tbs"])
    r2 = pusch_rx.decode_grant_ul(grid, CELL, 7, g2["rnti"], 20, 12, 4,
                                  g2["tbs"], dmrs_field=3)
    assert r1.crc_ok and r2.crc_ok
    np.testing.assert_array_equal(r1.tb_bits, g1["tb_bits"])
    np.testing.assert_array_equal(r2.tb_bits, g2["tb_bits"])


def test_pusch_invalid_prb_count_rejected():
    rng = np.random.default_rng(3)
    # 7 PRB is not a valid DFT size (2^a 3^b 5^c rule)
    res = pusch_rx.decode_grant_ul(
        np.zeros((1, 14, CELL.n_sc), np.complex64), CELL, 0, 1, 0, 7, 2, 100)
    assert not res.crc_ok and res.snr_db < -90


def test_pusch_wrong_dmrs_shift_fails():
    rng = np.random.default_rng(4)
    gr = _grant(0x7505, 4, 10, 2, 6, rng, dmrs_field=0)
    grid = _tx_rx([gr], 2, rng)
    res = pusch_rx.decode_grant_ul(grid, CELL, 2, gr["rnti"], 4, 10, 2,
                                   gr["tbs"], dmrs_field=5)
    assert not res.crc_ok


def test_dmrs_properties():
    # unit modulus; distinct across groups and shifts; slot-dependent n_PN
    a = ul_dmrs.pusch_dmrs(10, 0, 147, 0, 0)
    b = ul_dmrs.pusch_dmrs(10, 0, 147, 0, 3)
    c = ul_dmrs.pusch_dmrs(10, 1, 147, 0, 0)
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-5)
    assert np.abs(np.vdot(a, b)) / len(a) < 0.5
    assert not np.allclose(a, c)


def test_pusch_with_uci_ri_and_ack():
    """RI displaces data groups; ACK punctures — decode still clean."""
    rng = np.random.default_rng(9)
    n_ri, n_ack = 8, 12
    gr = _grant(0x7606, 4, 10, 2, 6, rng)
    gr["n_ri_syms"], gr["n_ack_syms"] = n_ri, n_ack
    grid = _tx_rx([gr], 3, rng, noise=0.03)
    res = pusch_rx.decode_grant_ul(grid, CELL, 3, gr["rnti"], 4, 10, 2,
                                   gr["tbs"], n_ri_syms=n_ri,
                                   n_ack_syms=n_ack)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, gr["tb_bits"])
    # note: ignoring the UCI layout only corrupts the matrix tail (RI/ACK
    # cells sit in the bottom rows), which the turbo code can often absorb —
    # so no negative assertion here; the positive mapping equality above is
    # the meaningful check.


def test_uci_beta_offset_tables():
    """Published 36.213 Table 8.6.3-1/-2 spot values + Q' scaling."""
    from ltesniffer_tpu.phy import uci
    assert uci.BETA_ACK[0] == 2.000 and uci.BETA_ACK[10] == 20.000
    assert uci.BETA_ACK[14] == 126.000
    assert uci.BETA_RI[0] == 1.250 and uci.BETA_RI[12] == 20.000
    assert uci.BETA_CQI[2] == 1.125 and uci.BETA_CQI[15] == 6.250
    # Q' grows with the beta offset and with the ACK count
    n_ri0, n_ack0 = uci.uci_symbol_counts(1, 0, 0, 0, 10, 2216)
    n_ri1, n_ack1 = uci.uci_symbol_counts(2, 0, 10, 0, 10, 2216)
    assert n_ri0 == 0 and 0 < n_ack0 < n_ack1
    # capped at 4 * M_sc
    _, n_cap = uci.uci_symbol_counts(20, 0, 14, 0, 1, 16)
    assert n_cap <= 4 * 12


def test_cqi_multiplexed_grant_decodes():
    """Aperiodic CQI heads the multiplexed stream (36.212 5.2.2.8): a
    grant with CQI + RI + ACK symbols still decodes the data, and the
    CQI-blind decode fails (sizes genuinely shift the data)."""
    from ltesniffer_tpu.phy import uci
    rng = np.random.default_rng(17)
    n_prb, qm = 10, 2
    tbs = tables.tbs_lookup(6, n_prb)
    n_ri, n_ack = uci.uci_symbol_counts(1, 1, 10, 12, n_prb, tbs)
    o_cqi = uci.aperiodic_cqi_bits(CELL.n_prb)
    n_cqi = uci.cqi_q_prime(o_cqi, 15, n_prb, tbs, n_ri_syms=n_ri)
    assert n_cqi > 0
    gr = _grant(0x7301, 4, n_prb, qm, 6, rng, n_ri_syms=n_ri,
                n_ack_syms=n_ack, n_cqi_syms=n_cqi)
    grid = _tx_rx([gr], 2, rng)
    res = pusch_rx.decode_grant_ul(grid, CELL, 2, gr["rnti"], 4, n_prb, qm,
                                   tbs, n_ri_syms=n_ri, n_ack_syms=n_ack,
                                   n_cqi_syms=n_cqi)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, gr["tb_bits"])
    blind = pusch_rx.decode_grant_ul(grid, CELL, 2, gr["rnti"], 4, n_prb,
                                     qm, tbs, n_ri_syms=n_ri,
                                     n_ack_syms=n_ack)
    assert not blind.crc_ok


def test_cqi_sizing_helpers():
    from ltesniffer_tpu.phy import uci
    # 36.213 Table 7.2.1-3 subband sizes (reference dl_sniffer_pdsch.c)
    assert uci.cqi_hl_subband_size(7) == 4
    assert uci.cqi_hl_subband_size(26) == 4
    assert uci.cqi_hl_subband_size(27) == 6
    assert uci.cqi_hl_subband_size(63) == 6
    assert uci.cqi_hl_subband_size(64) == 8
    assert uci.cqi_hl_subband_size(110) == 8
    assert uci.cqi_hl_subband_count(50) == 9    # ceil(50/6)
    assert uci.cqi_hl_subband_count(100) == 13  # ceil(100/8)
    assert uci.aperiodic_cqi_bits(50) == 4 + 2 * 9
    assert uci.aperiodic_cqi_bits(50, wideband_only=True) == 4


def test_q_prime_exact_spec_vectors():
    """Hand-computed 36.212 5.2.2.6 vectors (exact formula, not the old
    collapsed approximation)."""
    from ltesniffer_tpu.phy import uci
    # O=2 ACK, I_ack=0 -> beta 2.0, initial 4 PRB (M_sc=48), TBS 392 ->
    # B=416 -> K=416: Q' = ceil(2*48*12*2.0/416) = ceil(5.54) = 6
    n_ri, n_ack = uci.uci_symbol_counts(2, 0, 0, 0, 4, 392)
    assert (n_ri, n_ack) == (0, 6)
    # RI: O=1, I_ri=5 -> beta 4.0, same grant:
    # ceil(1*48*12*4.0/416) = ceil(5.54) = 6
    n_ri, _ = uci.uci_symbol_counts(0, 1, 0, 5, 4, 392)
    assert n_ri == 6
    # cap comes from the CURRENT grant: initial 10 PRB but current 1 PRB
    # -> cap 4*12 = 48
    _, n_ack = uci.uci_symbol_counts(20, 0, 14, 0, 10, 16,
                                     n_prb_current=1)
    assert n_ack == 48
    # retransmission wider than initial: cap loosens with current n_prb
    _, n_ack_wide = uci.uci_symbol_counts(20, 0, 14, 0, 10, 16,
                                          n_prb_current=25)
    assert n_ack_wide > 48
    # no artificial O floor: huge TB makes Q' tiny but >= 1 via ceil
    _, n_ack_small = uci.uci_symbol_counts(1, 0, 0, 0, 100, 75376)
    # ceil(1*1200*12*2.0/sum_Kr(75376)): sum_Kr = 13 blocks ~ 76304
    assert n_ack_small == 1
    # CQI: O=12 (+CRC8), I_cqi=2 -> beta 1.125, initial 4 PRB TBS 392:
    # ceil(20*48*12*1.125/416) = ceil(31.15) = 32
    assert uci.cqi_q_prime(12, 2, 4, 392) == 32
    # CQI cap: all current cells minus RI
    assert uci.cqi_q_prime(100, 15, 20, 16, n_ri_syms=5,
                           n_prb_current=1) == 12 * 12 - 5
