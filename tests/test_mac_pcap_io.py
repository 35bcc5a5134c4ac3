import os

import numpy as np

from ltesniffer_tpu.io import iq, pcap
from ltesniffer_tpu.mac_rrc import mac


def test_pcap_roundtrip(tmp_path):
    p = str(tmp_path / "t.pcap")
    w = pcap.MacLtePcapWriter(p)
    w.write_pdu(b"\x01\x02\x03", rnti=0x1234, direction=pcap.DIRECTION_DOWNLINK,
                sfn=512, sf_idx=3)
    w.write_pdu(b"\xAA" * 10, rnti=0xFFFF, direction=pcap.DIRECTION_DOWNLINK,
                sfn=1, sf_idx=5, crc_ok=True)
    w.write_pdu(b"\x55", rnti=0x0007, direction=pcap.DIRECTION_UPLINK,
                sfn=9, sf_idx=0, retx=2)
    w.close()
    recs = pcap.read_pcap(p)
    assert len(recs) == 3
    assert recs[0]["rnti"] == 0x1234 and recs[0]["rnti_type"] == pcap.C_RNTI
    assert recs[0]["sfn"] == 512 and recs[0]["sf_idx"] == 3
    assert recs[0]["payload"] == b"\x01\x02\x03"
    assert recs[1]["rnti_type"] == pcap.SI_RNTI
    assert recs[2]["direction"] == pcap.DIRECTION_UPLINK
    assert recs[2]["rnti_type"] == pcap.RA_RNTI  # 0x0007 in RA range


def test_dlt147_frame_bytes_match_reference():
    """The DLT-147 record body must match the reference's on-disk framing.

    Expected bytes are the first record of the shipped golden
    `/root/reference/pcap_file_example/ltesniffer_dl_mode.pcap`
    (SI-RNTI, sfn 430, sf 5): context + tag stream, NO start string.
    """
    payload = bytes.fromhex("406404ab00070019b0181460108280000000")
    frame = pcap.build_mac_lte_frame(
        payload, rnti=0xFFFF, direction=pcap.DIRECTION_DOWNLINK,
        sfn=430, sf_idx=5, crc_ok=True)
    expected = bytes.fromhex("01010402ffff030000041ae507010a000f0001") \
        + payload
    assert frame == expected
    assert not frame.startswith(pcap.MAC_LTE_START_STRING)
    # UDP-heuristic framing keeps the start string
    udp = pcap.build_udp_framed_payload(
        payload, rnti=0xFFFF, direction=pcap.DIRECTION_DOWNLINK,
        sfn=430, sf_idx=5)
    assert udp.startswith(b"mac-lte")


def test_iq_roundtrip(tmp_path):
    p = str(tmp_path / "t.iq")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
         ).astype(np.complex64)
    iq.write_iq(p, x)
    back = iq.read_iq(p)
    np.testing.assert_array_equal(back, x)
    part = iq.read_iq(p, count=100, offset_samples=50)
    np.testing.assert_array_equal(part, x[50:150])
    blocks = list(iq.stream_blocks(p, 300))
    assert [len(b) for b in blocks] == [300, 300, 300, 100]
    np.testing.assert_array_equal(np.concatenate(blocks), x)


def test_mac_pdu_roundtrip():
    subs = [mac.MacSubPdu(lcid=3, payload=b"hello"),
            mac.MacSubPdu(lcid=1, payload=b"\x01\x02")]
    pdu = mac.build_mac_pdu(subs)
    back = mac.parse_mac_pdu(pdu)
    assert [(s.lcid, s.payload) for s in back] == \
        [(3, b"hello"), (1, b"\x01\x02")]


def test_mac_pdu_with_padding_and_ce():
    subs = [mac.MacSubPdu(lcid=mac.LCID_CON_RES, payload=b"ABCDEF"),
            mac.MacSubPdu(lcid=0, payload=b"\x10\x20\x30")]
    pdu = mac.build_mac_pdu(subs, pad_to=32)
    assert len(pdu) == 32
    back = mac.parse_mac_pdu(pdu)
    assert back[0].lcid == mac.LCID_CON_RES and back[0].payload == b"ABCDEF"
    assert back[1].lcid == 0 and back[1].payload == b"\x10\x20\x30"


def test_mac_pdu_long_sdu():
    big = bytes(range(256)) * 2   # 512 bytes -> 15-bit length form
    subs = [mac.MacSubPdu(lcid=3, payload=big),
            mac.MacSubPdu(lcid=4, payload=b"tail")]
    back = mac.parse_mac_pdu(mac.build_mac_pdu(subs))
    assert back[0].payload == big and back[1].payload == b"tail"


def test_rar_roundtrip():
    rars = [mac.Rar(rapid=5, ta=100, grant=0x5A5A5, t_crnti=0x4567),
            mac.Rar(rapid=60, ta=2047, grant=0xFFFFF, t_crnti=0xFFFF)]
    pdu = mac.build_rar_pdu(rars, backoff=7)
    backoff, got = mac.parse_rar_pdu(pdu)
    assert backoff == 7
    assert got == rars
    f = mac.rar_grant_fields(rars[0].grant)
    assert set(f) == {"hopping", "rba", "trunc_mcs", "tpc", "ul_delay",
                      "cqi_request"}
    # 20-bit field split sanity
    g = mac.rar_grant_fields(0b1_0000000001_0010_001_1_0)
    assert g["hopping"] == 1 and g["rba"] == 1 and g["trunc_mcs"] == 2
    assert g["tpc"] == 1 and g["ul_delay"] == 1 and g["cqi_request"] == 0
