"""Security-API tests: RRC/NAS codecs + identity table extraction."""
import numpy as np

from ltesniffer_tpu.mac_rrc import mac, nas, rrc
from ltesniffer_tpu.sniffer import security_api


def test_paging_roundtrip_stmsi_and_imsi():
    recs = [rrc.PagingRecord(s_tmsi=0xAB12345678, cn_domain="ps"),
            rrc.PagingRecord(imsi="262011234567890", cn_domain="cs")]
    data = rrc.encode_paging(recs)
    back = rrc.decode_paging(data)
    assert back is not None and len(back) == 2
    assert back[0].s_tmsi == 0xAB12345678 and back[0].cn_domain == "ps"
    assert back[1].imsi == "262011234567890" and back[1].cn_domain == "cs"


def test_paging_empty_and_garbage():
    assert rrc.decode_paging(rrc.encode_paging([])) == []
    assert rrc.decode_paging(b"") in (None, [])


def test_connection_request_roundtrip():
    for req in (rrc.RrcConnectionRequest(s_tmsi=0x123456789A, cause="mo-Data"),
                rrc.RrcConnectionRequest(random_value=0x5555AAAA55,
                                         cause="mt-Access")):
        kind, back = rrc.decode_ul_ccch(rrc.encode_connection_request(req))
        assert kind == "connection_request"
        assert back.s_tmsi == req.s_tmsi
        assert back.random_value == req.random_value
        assert back.cause == req.cause


def test_connection_setup_roundtrip():
    s = rrc.RrcConnectionSetup(rrc_transaction_id=2, p_a_db=-3.0,
                               cqi_offset=7, ack_offset=9, ri_offset=11)
    kind, back = rrc.decode_dl_ccch(rrc.encode_connection_setup(s))
    assert kind == "connection_setup"
    assert back.p_a_db == -3.0 and back.cqi_offset == 7
    assert back.ack_offset == 9 and back.ri_offset == 11


def test_nas_mobile_identity_imsi_imei():
    for kind, digits in ((nas.ID_TYPE_IMSI, "262012345678901"),
                         (nas.ID_TYPE_IMEI, "490154203237518")):
        mi = nas.decode_mobile_identity(nas.encode_mobile_identity(kind, digits))
        assert mi.kind == kind and mi.digits == digits


def test_nas_guti_roundtrip():
    g = dict(plmn="262014", mme_group=0x8001, mme_code=0x02,
             m_tmsi=0xC0FFEE01)
    mi = nas.decode_mobile_identity(
        nas.encode_mobile_identity(nas.ID_TYPE_GUTI, guti=g))
    assert mi.kind == nas.ID_TYPE_GUTI
    assert mi.guti["m_tmsi"] == 0xC0FFEE01
    assert mi.guti["mme_group"] == 0x8001


def test_nas_attach_request_and_identity_response():
    att = nas.encode_attach_request(
        nas.MobileIdentity(kind=nas.ID_TYPE_IMSI, digits="00101123456789"))
    info = nas.parse_nas(att)
    assert info.msg_name == "attach_request"
    assert info.identity.digits == "00101123456789"

    idr = nas.encode_identity_response(
        nas.MobileIdentity(kind=nas.ID_TYPE_IMEI, digits="355402091234567"))
    info2 = nas.parse_nas(idr)
    assert info2.msg_name == "identity_response"
    assert info2.identity.kind_name == "imei"


def test_security_api_flow(tmp_path):
    api = security_api.SecurityApi(str(tmp_path / "api.pcap"))
    rnti = 0x4b4b
    # 1. paging with S-TMSI
    api.on_paging(rrc.encode_paging(
        [rrc.PagingRecord(s_tmsi=0x11DEADBEEF)]), 10, 0)
    # 2. ConnectionRequest echoed in contention resolution CE
    req = rrc.encode_connection_request(
        rrc.RrcConnectionRequest(s_tmsi=0x22DEADBEEF, cause="mo-Signalling"))
    api.on_con_res(rnti, req[:6], 10, 4)
    # 3. NAS identity response with IMSI via UL-DCCH
    nas_pdu = nas.encode_identity_response(
        nas.MobileIdentity(kind=nas.ID_TYPE_IMSI, digits="262019876543210"))
    api.on_ul_dcch(rnti, rrc.encode_ul_dcch_nas("ul_info_transfer", nas_pdu),
                   11, 2)
    api.close()

    assert api.paging_identities[0]["s_tmsi"] == 0x11DEADBEEF
    rec = api.records[rnti]
    assert rec.tmsi == 0xDEADBEEF          # low 32 bits (m-TMSI)
    assert rec.imsi == "262019876543210"
    assert rec.cause == "mo-Signalling"
    tab = api.table()
    assert tab[0]["imsi"] == "262019876543210"
    # UECapability + GUTI columns surface in the table
    # (`UL_Sniffer_PUSCH.cc:874-892` prints UECapability rows)
    assert tab[0]["ue_capability"] is False
    api.records[rnti].has_ue_capability = True
    api.records[rnti].guti = dict(plmn="26201", mme_group=0x8001,
                                  mme_code=0x02, m_tmsi=0xC0FFEE01)
    tab = api.table()
    assert tab[0]["ue_capability"] is True
    assert tab[0]["guti"] == "26201-8001-02-c0ffee01"
    from ltesniffer_tpu.sniffer import observability as obs
    rendered = obs.format_api_table(api)
    assert "yes" in rendered and "c0ffee01" in rendered
    from ltesniffer_tpu.io import pcap
    recs = pcap.read_pcap(str(tmp_path / "api.pcap"))
    assert len(recs) == 2   # paging + ul_dcch mirrors


def test_core_api_paging_and_conres(tmp_path):
    """Core-level: paging + ConRes CE through the PDSCH path."""
    from ltesniffer_tpu.phy.params import CellConfig
    from ltesniffer_tpu.sniffer import core
    from ltesniffer_tpu.testing import scenario
    cell = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)
    sb = scenario.ScenarioBuilder(cell, seed=5)
    paging = rrc.encode_paging([rrc.PagingRecord(imsi="262010000000001")])
    req6 = rrc.encode_connection_request(
        rrc.RrcConnectionRequest(s_tmsi=0x33C0FFEE11, cause="mo-Data"))[:6]
    conres_pdu = mac.build_mac_pdu(
        [mac.MacSubPdu(lcid=mac.LCID_CON_RES, payload=req6)])
    ue = 0x5c5c
    for j in range(10):
        txs = []
        if j == 0:
            txs.append(scenario.DlTx(rnti=0xFFFE, mac_pdu=paging, n_prb=6))
        if j >= 2:
            txs.append(scenario.DlTx(rnti=ue, mac_pdu=conres_pdu, n_prb=8,
                                     prb_start=30, ndi=j % 2, harq_pid=j % 8))
        sb.add_subframe(j, txs)
    cfg = core.SnifferConfig(cell=cell, batch_size=8, api_mode=0,
                             api_pcap_path=str(tmp_path / "api.pcap"))
    c = core.LTESnifferCore(cfg)
    c.run_samples(sb.stream())
    c.close()
    if c.api.paging_identities:
        assert c.api.paging_identities[0]["imsi"] == "262010000000001"
    assert ue in c.api.records
    assert c.api.records[ue].tmsi == 0xC0FFEE11
    c.api.close()


def test_sib2_codec_roundtrip():
    cfg = rrc.Sib2UlConfig(group_hopping=True, cyclic_shift=5, delta_ss=17,
                           pusch_hopping_offset=22, n_sb=2,
                           prach_root_seq_index=713, prach_freq_offset=6,
                           zero_correlation_zone=11)
    kind, back = rrc.decode_bcch(rrc.encode_sib2(cfg))
    assert kind == "sib2"
    assert back == cfg


def test_core_sib2_config_applied(tmp_path):
    """SI-RNTI PDSCH carrying SIB2 configures the UL schedule + DMRS shift."""
    from ltesniffer_tpu.phy.params import CellConfig
    from ltesniffer_tpu.sniffer import core
    from ltesniffer_tpu.testing import scenario
    cell = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)
    sb = scenario.ScenarioBuilder(cell, seed=11)
    sib2 = rrc.encode_sib2(rrc.Sib2UlConfig(cyclic_shift=4,
                                            prach_root_seq_index=88))
    for j in range(3):
        txs = []
        if j == 1:
            txs.append(scenario.DlTx(rnti=0xFFFF, mac_pdu=sib2, n_prb=6))
        sb.add_subframe(j, txs)
    cfg = core.SnifferConfig(cell=cell, batch_size=4)
    c = core.LTESnifferCoreUL(cfg)
    # run DL-only through the dual loop with a silent UL stream
    import numpy as np
    ul = np.zeros(3 * cell.sf_len, np.complex64)
    c.run_dual_samples(sb.stream(), ul)
    assert c.ulsche.sib2 is not None
    assert c.ulsche.sib2["cyclic_shift"] == 4
    assert c.ulsche.sib2["prach_root_seq_index"] == 88
    assert c.cyclic_shift_cfg == 4
