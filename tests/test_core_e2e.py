"""Integration tests for LTESnifferCore: scripted cell -> pcap output."""
import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.io import pcap
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.sniffer import core, trackers
from ltesniffer_tpu.testing import scenario

CELL = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)


def _mk_core(tmp_path, **kw):
    cfg = core.SnifferConfig(cell=CELL,
                             pcap_path=str(tmp_path / "out.pcap"),
                             batch_size=8, **kw)
    return core.LTESnifferCore(cfg), cfg


def test_sib_stream_to_pcap(tmp_path):
    sb = scenario.ScenarioBuilder(CELL, seed=1)
    sib_pdu = b"\x40\x04SIB1-ish-payload"
    for j in range(10):
        txs = []
        if j % 10 == 5:
            txs.append(scenario.DlTx(rnti=0xFFFF, mac_pdu=sib_pdu, n_prb=8))
        sb.add_subframe(j % 10, txs)
    c, cfg = _mk_core(tmp_path)
    c.run_samples(sb.stream())
    c.close()
    s = c.summary()
    assert s["subframes"] == 10
    assert s["pdsch_ok"] >= 1
    recs = pcap.read_pcap(cfg.pcap_path)
    assert len(recs) >= 1
    assert recs[0]["rnti"] == 0xFFFF
    assert recs[0]["payload"][:len(sib_pdu)] == sib_pdu
    assert recs[0]["sf_idx"] == 5


def test_ue_traffic_mcs_learning_and_harq(tmp_path):
    sb = scenario.ScenarioBuilder(CELL, seed=2)
    rnti = 0x4444
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"user-data-123")])
    ndi = 0
    for j in range(16):
        txs = []
        if j >= 2:   # give the histogram/shortcut a couple of clean subframes
            ndi ^= 1
            txs.append(scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=10,
                                     prb_start=20, harq_pid=j % 8, ndi=ndi))
        sb.add_subframe(j % 10, txs)
    c, cfg = _mk_core(tmp_path)
    c.run_samples(sb.stream())
    c.close()
    oks = [r for r in c.results if r.crc_ok and r.dci.rnti == rnti]
    assert len(oks) >= 8
    # MCS table learned as 64QAM branch
    assert c.mcs.dl_table_of(rnti) == trackers.McsTable.QAM64
    st = c.mcs.stats_dl[rnti]
    assert st.success >= 8 and st.new_tx >= 8
    recs = pcap.read_pcap(cfg.pcap_path)
    ue_recs = [r for r in recs if r.get("rnti") == rnti]
    assert len(ue_recs) >= 8
    parsed = mac.parse_mac_pdu(ue_recs[0]["payload"][:len(pdu)])
    assert parsed[0].payload == b"user-data-123"


def test_rar_activates_tcrnti_and_queues_grant(tmp_path):
    sb = scenario.ScenarioBuilder(CELL, seed=3)
    t_crnti = 0x5F5F
    rar = mac.build_rar_pdu([mac.Rar(rapid=11, ta=31,
                                     grant=(0 << 19) | (77 << 9) | (5 << 5),
                                     t_crnti=t_crnti)])
    for j in range(3):
        txs = []
        if j == 1:
            txs.append(scenario.DlTx(rnti=0x0005, mac_pdu=rar, n_prb=6))
        sb.add_subframe(j, txs)
    c, cfg = _mk_core(tmp_path)
    c.run_samples(sb.stream())
    c.close()
    from ltesniffer_tpu.sniffer.rnti_manager import ActivationReason
    assert c.rm.get_activation_reason(t_crnti) == ActivationReason.RAR
    # grant queued at tti+6
    tti = trackers.tti_of(0, 1)
    pend = c.ulsche.pop((tti + trackers.ULSchedule.RAR_DELAY) % trackers.TTI_MAX)
    assert len(pend) == 1
    assert pend[0].rnti == t_crnti and pend[0].from_rar
    assert pend[0].mcs == 5


def test_sfn_acquired_from_mib(tmp_path):
    sb = scenario.ScenarioBuilder(CELL, seed=4)
    for j in range(4):
        sb.add_subframe(j, [], with_pbch_sfn=320 if j == 0 else None)
    c, cfg = _mk_core(tmp_path)
    c.run_samples(sb.stream())
    c.close()
    assert c._mib_synced
    assert c.sfn == 320


def test_run_stream_gap_recovery_and_sfn_resync(tmp_path):
    """Continuous-stream entry: a mid-stream gap breaks timing; the tracker
    re-acquires, the core re-enters MIB acquisition, and tail subframes
    still decode with correct SFN labels (`LTESniffer_Core.cc:506-525`)."""
    sb = scenario.ScenarioBuilder(CELL, seed=11, noise=0.04)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"tail-traffic")])
    rnti = 0x3c3c
    n_sf = 80
    for j in range(n_sf):
        sf = j % 10
        txs = []
        if j >= 2 and sf not in (0, 5):
            txs.append(scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=10,
                                     prb_start=20, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        sb.add_subframe(sf, txs, with_pbch_sfn=100 + j // 10
                        if sf == 0 else None)
    stream = sb.stream()
    # cut 2.5 subframes mid-stream (inside subframe 24)
    cut = CELL.sf_len * 24 + 500
    stream = np.concatenate([stream[:cut],
                             stream[cut + int(CELL.sf_len * 2.5):]])
    c, cfg = _mk_core(tmp_path)
    c.run_stream(stream)
    c.close()
    s = c.summary()
    assert s["resyncs"] >= 1
    assert c._mib_synced            # SFN re-acquired after the gap
    # traffic decodes on both sides of the gap
    oks = [r for r in c.results if r.crc_ok and r.dci.rnti == rnti]
    assert len(oks) >= 20, len(oks)
    recs = pcap.read_pcap(cfg.pcap_path)
    tail = [r for r in recs if r.get("rnti") == rnti and r["sfn"] >= 103]
    assert tail, "no tail records after resync"
    # tail SFN labels are consistent with the transmitted MIB counter
    assert all(103 <= r["sfn"] <= 108 for r in tail)
