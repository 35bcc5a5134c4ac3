"""External-vector tests against the reference's shipped golden pcaps.

These files were produced by the reference implementation on a real eNodeB
(`/root/reference/pcap_file_example/`, cf. reference README.md:196-199), so
they validate our pcap framing and MAC/RRC parsers against externally
produced bytes — not our own encoder.
"""
import os

import pytest

from ltesniffer_tpu.io import pcap
from ltesniffer_tpu.mac_rrc import mac, rrc

GOLD = "/root/reference/pcap_file_example"

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLD),
                                reason="reference goldens not available")


def test_reference_dl_pcap_parses():
    recs = pcap.read_pcap(f"{GOLD}/ltesniffer_dl_mode.pcap")
    assert len(recs) == 2433
    # all downlink; SI/RA/C RNTIs as recorded by the reference run
    assert all(r["direction"] == pcap.DIRECTION_DOWNLINK for r in recs)
    types = {r["rnti_type"] for r in recs}
    assert types == {pcap.SI_RNTI, pcap.RA_RNTI, pcap.C_RNTI}
    assert sum(r["rnti_type"] == pcap.SI_RNTI for r in recs) == 1790
    r0 = recs[0]
    assert (r0["rnti"], r0["sfn"], r0["sf_idx"]) == (0xFFFF, 430, 5)
    assert r0["crc_ok"] and r0["radio"] == pcap.FDD_RADIO
    assert r0["payload"].startswith(bytes.fromhex("406404ab"))


def test_reference_ul_pcap_parses():
    recs = pcap.read_pcap(f"{GOLD}/ltesniffer_ul_mode.pcap")
    assert len(recs) == 419
    ups = [r for r in recs if r["direction"] == pcap.DIRECTION_UPLINK]
    assert len(ups) == 402
    assert all(r["rnti_type"] == pcap.C_RNTI for r in ups)


def test_reference_api_pcap_parses():
    recs = pcap.read_pcap(f"{GOLD}/api_collector.pcap")
    assert len(recs) == 20
    assert all(r["rnti_type"] == pcap.C_RNTI for r in recs)


def test_real_ul_ccch_connection_request_decodes():
    """MAC + RRC parse of a real UE's msg3 from the api golden."""
    recs = pcap.read_pcap(f"{GOLD}/api_collector.pcap")
    ups = [r for r in recs if r["direction"] == pcap.DIRECTION_UPLINK
           and r["payload"][0] == 0x00]  # single CCCH subheader
    assert ups, "no UL-CCCH records in golden"
    decoded = 0
    for r in ups:
        subs = mac.parse_mac_pdu(r["payload"], uplink=True)
        ccch = [s for s in subs if s.lcid == mac.LCID_CCCH]
        assert len(ccch) == 1
        out = rrc.decode_ul_ccch(ccch[0].payload)
        assert out is not None
        kind, req = out
        assert kind == "connection_request"
        assert (req.s_tmsi is not None) != (req.random_value is not None)
        assert req.cause in rrc.ESTABLISHMENT_CAUSES
        decoded += 1
    assert decoded >= 2


def test_real_dl_conres_echoes_msg3():
    """The DL ConRes CE must echo the first 48 bits of the UE's msg3 —
    a cross-record consistency check entirely on reference-produced data."""
    recs = pcap.read_pcap(f"{GOLD}/api_collector.pcap")
    by_rnti = {}
    for r in recs:
        by_rnti.setdefault(r["rnti"], []).append(r)
    checked = 0
    for rnti, rs in by_rnti.items():
        msg3 = [r for r in rs if r["direction"] == pcap.DIRECTION_UPLINK
                and r["payload"][0] == 0x00]
        dls = [r for r in rs if r["direction"] == pcap.DIRECTION_DOWNLINK]
        if not msg3 or not dls:
            continue
        ccch = mac.parse_mac_pdu(msg3[0]["payload"], uplink=True)[0].payload
        for d in dls:
            subs = mac.parse_mac_pdu(d["payload"])
            conres = [s for s in subs if s.lcid == mac.LCID_CON_RES]
            if conres:
                assert conres[0].payload == ccch[:6]
                checked += 1
    assert checked >= 2
