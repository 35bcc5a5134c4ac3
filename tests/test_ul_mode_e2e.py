"""Dual-stream UL mode e2e: DL DCI0 at t -> PUSCH decode at t+4."""
import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra, tables, search_space
from ltesniffer_tpu.io import pcap
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import core, trackers

CELL = CellConfig(n_id_cell=147, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _nof_cce():
    from ltesniffer_tpu.phy import grid as grid_mod
    return grid_mod.control_region(CELL, CFI)["nof_pdcch_regs"] // 9


def test_dci0_to_pusch_chain(tmp_path):
    rng = np.random.default_rng(0)
    rnti = 0x2e2e
    ul_mcs = 6           # QPSK region: all UL tables agree
    prb_start, n_prb = 5, 10
    qm, i_tbs = tables.ul_mcs_to_qm_itbs(ul_mcs)
    tbs = tables.tbs_lookup(i_tbs, n_prb)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)

    h_dl = encoder.flat_channel(CELL, 1, rng)
    n_sf = 10
    dl_frames, ul_frames = [], []
    dci0_sent_at = 2
    for j in range(n_sf):
        txs = []
        if j == dci0_sent_at:
            # place format 0 DCI in the UE search space
            cands = search_space.ue_candidates(rnti, j, _nof_cce())
            l, ncce = [c for c in cands if c[0] == 2][0]
            d = dci_mod.Dci(fmt="0", rnti=rnti, fields=dict(
                flag0_1a=0, hopping=0,
                riv=ra.start_len_to_riv(prb_start, n_prb, 50),
                mcs=ul_mcs, ndi=1, tpc=0, dmrs_cs=2, cqi_request=0))
            txs.append(encoder.TxDci(dci=d, L=l, ncce=ncce))
        g = encoder.build_control_subframe(CELL, j, CFI, txs)
        rxg = encoder.apply_channel(g, h_dl, 0.04, rng)
        dl_frames.append(encoder.subframe_iq(CELL, rxg)[0])

        # UL subframe: PUSCH appears at dci0_sent_at + 4
        if j == dci0_sent_at + 4:
            ug = encoder.build_ul_subframe(CELL, j, [dict(
                rnti=rnti, prb_start=prb_start, n_prb=n_prb, qm=qm,
                tb_bits=tb, dmrs_field=2)])
        else:
            ug = np.zeros((1, 14, CELL.n_sc), np.complex64)
        ul_noise = 0.03
        un = ug + ul_noise / np.sqrt(2) * (
            rng.standard_normal(ug.shape) + 1j * rng.standard_normal(ug.shape))
        ul_frames.append(encoder.ul_subframe_iq(CELL, un.astype(np.complex64))[0])

    cfg = core.SnifferConfig(cell=CELL, batch_size=4,
                             pcap_path=str(tmp_path / "ul.pcap"))
    c = core.LTESnifferCoreUL(cfg)
    c.run_dual_samples(np.concatenate(dl_frames), np.concatenate(ul_frames))
    c.close()

    assert len(c.ul_results) == 1
    r = c.ul_results[0]
    assert r.rnti == rnti and r.crc_ok
    assert r.sf_idx == dci0_sent_at + 4
    np.testing.assert_array_equal(
        np.unpackbits(np.frombuffer(r.payload, np.uint8))[:tbs],
        tb)
    assert r.snr_db > 10 and abs(r.ta_us) < 1.0
    # UL pcap record present with uplink direction
    recs = pcap.read_pcap(str(tmp_path / "ul.pcap"))
    ul_recs = [x for x in recs if x["direction"] == pcap.DIRECTION_UPLINK]
    assert len(ul_recs) == 1 and ul_recs[0]["rnti"] == rnti


def test_uci_ack_ri_through_core(tmp_path):
    """PUSCH carrying multiplexed HARQ-ACK + RI decodes through the core
    loop: the DCI0's subframe also carries a DL assignment for the same
    RNTI (-> nof_ack=1, `SubframeWorker.cc:319-337`) and requests aperiodic
    CSI (-> ri_len=1), so the core must displace RI symbols and puncture
    ACK cells exactly like the transmitter did."""
    from ltesniffer_tpu.phy import uci
    rng = np.random.default_rng(7)
    rnti = 0x5a5a
    ul_mcs = 6
    prb_start, n_prb = 5, 10
    qm, i_tbs = tables.ul_mcs_to_qm_itbs(ul_mcs)
    tbs = tables.tbs_lookup(i_tbs, n_prb)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)

    # the same beta offsets the core will read (default UeConfig)
    ue_cfg = trackers.UeConfig()
    n_ri, n_ack = uci.uci_symbol_counts(
        1, 1, ue_cfg.uci_offset_ack, ue_cfg.uci_offset_ri, n_prb, tbs)
    assert n_ri > 0 and n_ack > 0
    # aperiodic CQI rides the same PUSCH (cqi_request=1): subband-HL sizing
    o_cqi = uci.aperiodic_cqi_bits(50)
    n_cqi = uci.cqi_q_prime(o_cqi, ue_cfg.uci_offset_cqi, n_prb, tbs,
                            n_ri_syms=n_ri)
    assert n_cqi > 0

    h_dl = encoder.flat_channel(CELL, 1, rng)
    dl_frames, ul_frames = [], []
    at = 2
    for j in range(10):
        txs = []
        if j == at:
            cands = [c for c in search_space.ue_candidates(
                rnti, j, _nof_cce()) if c[0] == 2]
            l0, ncce0 = cands[0]
            l1, ncce1 = cands[1]
            txs.append(encoder.TxDci(dci=dci_mod.Dci(
                fmt="0", rnti=rnti, fields=dict(
                    flag0_1a=0, hopping=0,
                    riv=ra.start_len_to_riv(prb_start, n_prb, 50),
                    mcs=ul_mcs, ndi=1, tpc=0, dmrs_cs=2, cqi_request=1)),
                L=l0, ncce=ncce0))
            # DL assignment in the same subframe -> 1 ACK on the PUSCH
            txs.append(encoder.TxDci(dci=dci_mod.Dci(
                fmt="1A", rnti=rnti, fields=dict(
                    flag0_1a=1, vrb_flag=0,
                    riv=ra.start_len_to_riv(20, 4, 50), mcs=5, harq_pid=1,
                    ndi=0, rv=0, tpc=0)), L=l1, ncce=ncce1))
        g = encoder.build_control_subframe(CELL, j, CFI, txs)
        dl_frames.append(encoder.subframe_iq(
            CELL, encoder.apply_channel(g, h_dl, 0.04, rng))[0])
        if j == at + 4:
            ug = encoder.build_ul_subframe(CELL, j, [dict(
                rnti=rnti, prb_start=prb_start, n_prb=n_prb, qm=qm,
                tb_bits=tb, dmrs_field=2, n_ri_syms=n_ri,
                n_ack_syms=n_ack, n_cqi_syms=n_cqi)])
        else:
            ug = np.zeros((1, 14, CELL.n_sc), np.complex64)
        un = ug + 0.03 / np.sqrt(2) * (rng.standard_normal(ug.shape)
                                       + 1j * rng.standard_normal(ug.shape))
        ul_frames.append(encoder.ul_subframe_iq(CELL,
                                                un.astype(np.complex64))[0])

    cfg = core.SnifferConfig(cell=CELL, batch_size=4,
                             pcap_path=str(tmp_path / "ul.pcap"))
    c = core.LTESnifferCoreUL(cfg)
    c.run_dual_samples(np.concatenate(dl_frames), np.concatenate(ul_frames))
    c.close()
    assert len(c.ul_results) == 1
    r = c.ul_results[0]
    assert r.rnti == rnti and r.crc_ok, (r.rnti, r.crc_ok, r.snr_db)
    np.testing.assert_array_equal(
        np.unpackbits(np.frombuffer(r.payload, np.uint8))[:tbs], tb)


def test_ul_table_cascade_learns_16qam(tmp_path):
    """mcs in the 16QAM region: cascade tries 16qam first and learns it."""
    rng = np.random.default_rng(1)
    rnti = 0x3f3f
    ul_mcs = 14          # Qm=4 in 8.6.1-1
    prb_start, n_prb = 0, 8
    qm, i_tbs = tables.ul_mcs_to_qm_itbs(ul_mcs)
    assert qm == 4
    tbs = tables.tbs_lookup(i_tbs, n_prb)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)

    cfg = core.SnifferConfig(cell=CELL, batch_size=8)
    c = core.LTESnifferCoreUL(cfg)
    # inject the grant directly (bypassing the DCI path already tested)
    tti = trackers.tti_of(0, 1)
    c.ulsche.pending[(tti + 4) % trackers.TTI_MAX] = [trackers.UlGrantPending(
        rnti=rnti, tti_apply=0, mcs=ul_mcs, prb_start=prb_start,
        n_prb=n_prb, ndi=0, dmrs_cs=1)]

    dl_frames, ul_frames = [], []
    for j in range(8):
        g = encoder.build_control_subframe(CELL, j, CFI, [])
        h_dl = encoder.flat_channel(CELL, 1, rng)
        dl_frames.append(encoder.subframe_iq(
            CELL, encoder.apply_channel(g, h_dl, 0.04, rng))[0])
        if j == 5:
            ug = encoder.build_ul_subframe(CELL, j, [dict(
                rnti=rnti, prb_start=prb_start, n_prb=n_prb, qm=qm,
                tb_bits=tb, dmrs_field=1)])
        else:
            ug = np.zeros((1, 14, CELL.n_sc), np.complex64)
        un = ug + 0.02 / np.sqrt(2) * (rng.standard_normal(ug.shape)
                                       + 1j * rng.standard_normal(ug.shape))
        ul_frames.append(encoder.ul_subframe_iq(CELL, un.astype(np.complex64))[0])

    c.run_dual_samples(np.concatenate(dl_frames), np.concatenate(ul_frames))
    c.close()
    assert len(c.ul_results) == 1 and c.ul_results[0].crc_ok
    assert c.mcs.ul_table_of(rnti) == trackers.McsTable.UL_16QAM


def test_run_dual_source_with_interstream_skew(tmp_path):
    """Live dual-carrier ingest (round-4 gap): paired SampleSources with a
    DELIBERATE inter-stream sample offset, PSS acquisition on the DL
    stream, UL slaved to the DL timing, skew compensated at ingest
    (`LTESniffer_Core.cc:176-191,225` dual-frequency rf open + ta_buffer
    `:100-104`)."""
    from ltesniffer_tpu.io import sdr as sdr_mod
    rng = np.random.default_rng(3)
    rnti = 0x2f2f
    ul_mcs = 6
    prb_start, n_prb = 5, 10
    qm, i_tbs = tables.ul_mcs_to_qm_itbs(ul_mcs)
    tbs = tables.tbs_lookup(i_tbs, n_prb)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    h_dl = encoder.flat_channel(CELL, 1, rng)
    dl_frames, ul_frames = [], []
    # cell search may lock on the sf5 PSS, losing global subframes 0-4:
    # schedule the chain safely after the earliest possible lock point
    dci0_sent_at = 6
    for j in range(16):
        sf = j % 10
        txs = []
        if j == dci0_sent_at:
            cands = search_space.ue_candidates(rnti, sf, _nof_cce())
            l, ncce = [c for c in cands if c[0] == 2][0]
            d = dci_mod.Dci(fmt="0", rnti=rnti, fields=dict(
                flag0_1a=0, hopping=0,
                riv=ra.start_len_to_riv(prb_start, n_prb, 50),
                mcs=ul_mcs, ndi=1, tpc=0, dmrs_cs=2, cqi_request=0))
            txs.append(encoder.TxDci(dci=d, L=l, ncce=ncce))
        g = encoder.build_control_subframe(CELL, sf, CFI, txs)
        rxg = encoder.apply_channel(g, h_dl, 0.04, rng)
        dl_frames.append(encoder.subframe_iq(CELL, rxg)[0])
        if j == dci0_sent_at + 4:
            ug = encoder.build_ul_subframe(CELL, sf, [dict(
                rnti=rnti, prb_start=prb_start, n_prb=n_prb, qm=qm,
                tb_bits=tb, dmrs_field=2)])
        else:
            ug = np.zeros((1, 14, CELL.n_sc), np.complex64)
        un = ug + 0.03 / np.sqrt(2) * (
            rng.standard_normal(ug.shape)
            + 1j * rng.standard_normal(ug.shape))
        ul_frames.append(
            encoder.ul_subframe_iq(CELL, un.astype(np.complex64))[0])

    lead, skew = 3000, 500
    noise = lambda k: (0.01 / np.sqrt(2) * (      # noqa: E731
        rng.standard_normal(k) + 1j * rng.standard_normal(k))
        ).astype(np.complex64)
    dl_stream = np.concatenate([noise(lead)] + dl_frames)
    ul_stream = np.concatenate([noise(lead + skew)] + ul_frames)

    def run(ul_skew):
        cfg = core.SnifferConfig(cell=CELL, batch_size=4,
                                 acquire_sfn=False)
        c = core.LTESnifferCoreUL(cfg)
        c.run_dual_source(
            sdr_mod.ArraySource(dl_stream, CELL.srate),
            sdr_mod.ArraySource(ul_stream, CELL.srate),
            chunk_subframes=6, ul_skew=ul_skew)
        return c

    c = run(skew)
    assert len(c.ul_results) == 1
    r = c.ul_results[0]
    assert r.crc_ok and r.rnti == rnti
    assert r.sf_idx == (dci0_sent_at + 4) % 10
    np.testing.assert_array_equal(
        np.unpackbits(np.frombuffer(r.payload, np.uint8))[:tbs], tb)
    # negative control: without the skew compensation the slaved UL slice
    # misses the DMRS alignment and the decode fails
    c0 = run(0)
    assert not any(x.crc_ok for x in c0.ul_results)
