"""MAC-LTE pcap writer (Wireshark-compatible).

Produces byte-identical framing to the reference's `LTESniffer_pcap_writer`
(`src/src/PcapWriter.cc:75-190`, srsRAN `LTE_PCAP_MAC_WritePDU`): DLT 147
(DLT_USER0) records that start directly with the MAC-LTE context
(radio type, direction, rnti type) followed by the Wireshark tag stream

    02 <rnti:BE16> 03 <ueid:BE16> 04 <sfn<<4|sf:BE16> 07 <crc:1>
    0a <carrier:1> 0f <nb_mode:1> 01 <payload...>

as verified against the reference goldens in
`/root/reference/pcap_file_example/*.pcap` (first DL record bytes:
``01 01 04 02 ff ff 03 00 00 04 1a e5 07 01 0a 00 0f 00 01 ...``).

The ``"mac-lte"`` start string belongs ONLY to the UDP-heuristic framing
(Wireshark's mac-lte-framed dissector over UDP); `build_udp_framed_payload`
provides it for that optional transport. DLT-147 frames must NOT carry it —
round 1 did, which made our pcaps undissectable under the reference's
documented DLT_USER setup (reference README.md:196-199).
"""
from __future__ import annotations

import struct
import threading
from typing import Optional

MAC_LTE_DLT = 147
MAC_LTE_START_STRING = b"mac-lte"

FDD_RADIO = 1
TDD_RADIO = 2
DIRECTION_UPLINK = 0
DIRECTION_DOWNLINK = 1

NO_RNTI = 0
P_RNTI = 1
RA_RNTI = 2
C_RNTI = 3
SI_RNTI = 4
SPS_RNTI = 5
M_RNTI = 6

MAC_LTE_PAYLOAD_TAG = 0x01
MAC_LTE_RNTI_TAG = 0x02
MAC_LTE_UEID_TAG = 0x03
MAC_LTE_FRAME_SUBFRAME_TAG = 0x04
MAC_LTE_PREDEFINED_DATA_TAG = 0x05
MAC_LTE_RETX_TAG = 0x06
MAC_LTE_CRC_STATUS_TAG = 0x07
MAC_LTE_CARRIER_ID_TAG = 0x0A
MAC_LTE_NB_MODE_TAG = 0x0F


def rnti_type_of(rnti: int) -> int:
    if rnti == 0xFFFF:
        return SI_RNTI
    if rnti == 0xFFFE:
        return P_RNTI
    if rnti == 0xFFFD:
        return M_RNTI
    if 1 <= rnti <= 0x3C:
        return RA_RNTI
    return C_RNTI


def build_mac_lte_frame(payload: bytes, rnti: int, direction: int,
                        sfn: int, sf_idx: int, crc_ok: bool = True,
                        ueid: int = 0, rnti_type: Optional[int] = None,
                        carrier_idx: int = 0, nb_mode: int = 0) -> bytes:
    """One DLT-147 MAC-LTE record body, matching srsRAN LTE_PCAP_MAC_WritePDU.

    Note the reference writer carries a retx count in its MAC_Context but the
    srsRAN serializer never emits a RETX tag — we match the bytes on disk.
    """
    rt = rnti_type_of(rnti) if rnti_type is None else rnti_type
    ctx = bytearray()
    ctx.append(FDD_RADIO)
    ctx.append(direction)
    ctx.append(rt)
    ctx.append(MAC_LTE_RNTI_TAG)
    ctx += struct.pack(">H", rnti & 0xFFFF)
    ctx.append(MAC_LTE_UEID_TAG)
    ctx += struct.pack(">H", ueid & 0xFFFF)
    ctx.append(MAC_LTE_FRAME_SUBFRAME_TAG)
    ctx += struct.pack(">H", ((sfn & 0x3FF) << 4) | (sf_idx & 0xF))
    ctx.append(MAC_LTE_CRC_STATUS_TAG)
    ctx.append(1 if crc_ok else 0)
    ctx.append(MAC_LTE_CARRIER_ID_TAG)
    ctx.append(carrier_idx & 0xFF)
    ctx.append(MAC_LTE_NB_MODE_TAG)
    ctx.append(nb_mode & 0xFF)
    ctx.append(MAC_LTE_PAYLOAD_TAG)
    return bytes(ctx) + payload


def build_udp_framed_payload(payload: bytes, rnti: int, direction: int,
                             sfn: int, sf_idx: int, crc_ok: bool = True,
                             ueid: int = 0,
                             rnti_type: Optional[int] = None) -> bytes:
    """UDP-heuristic framing: the "mac-lte" start string + context + payload.

    For use when shipping MAC PDUs over UDP to a live Wireshark (heuristic
    dissector); never used inside DLT-147 pcap files.
    """
    return MAC_LTE_START_STRING + build_mac_lte_frame(
        payload, rnti, direction, sfn, sf_idx, crc_ok, ueid, rnti_type)


class MacLtePcapWriter:
    """Thread-safe pcap writer for MAC-LTE PDUs (main + API file roles)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        self._f = open(path, "wb")
        # pcap global header: magic, v2.4, tz 0, sigfigs 0, snaplen, network
        self._f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0,
                                  65535, MAC_LTE_DLT))

    def write_pdu(self, payload: bytes, rnti: int, direction: int,
                  sfn: int, sf_idx: int, crc_ok: bool = True,
                  retx: int = 0, ueid: int = 0,
                  rnti_type: Optional[int] = None,
                  ts_sec: int = 0, ts_usec: int = 0):
        del retx  # kept for API parity; srsRAN's serializer drops it too
        frame = build_mac_lte_frame(payload, rnti, direction, sfn, sf_idx,
                                    crc_ok, ueid, rnti_type)
        with self._lock:
            self._f.write(struct.pack("<IIII", ts_sec, ts_usec,
                                      len(frame), len(frame)))
            self._f.write(frame)

    def flush(self):
        with self._lock:
            self._f.flush()

    def close(self):
        with self._lock:
            if not self._f.closed:
                self._f.close()


_TAG_SIZES = {
    MAC_LTE_RNTI_TAG: 2,
    MAC_LTE_UEID_TAG: 2,
    MAC_LTE_FRAME_SUBFRAME_TAG: 2,
    MAC_LTE_RETX_TAG: 1,
    MAC_LTE_CRC_STATUS_TAG: 1,
    MAC_LTE_CARRIER_ID_TAG: 1,
    MAC_LTE_NB_MODE_TAG: 1,
}


def parse_mac_lte_frame(frame: bytes) -> dict:
    """Parse one MAC-LTE record body (DLT-147 style, start string optional)."""
    if frame.startswith(MAC_LTE_START_STRING):
        frame = frame[len(MAC_LTE_START_STRING):]
    radio, direction, rt = frame[0], frame[1], frame[2]
    p = 3
    rec = {"radio": radio, "direction": direction, "rnti_type": rt}
    while p < len(frame):
        tag = frame[p]
        p += 1
        if tag == MAC_LTE_PAYLOAD_TAG:
            rec["payload"] = frame[p:]
            break
        size = _TAG_SIZES.get(tag)
        if size is None:
            raise ValueError(f"unknown mac-lte tag 0x{tag:02x}")
        val = int.from_bytes(frame[p:p + size], "big")
        p += size
        if tag == MAC_LTE_RNTI_TAG:
            rec["rnti"] = val
        elif tag == MAC_LTE_UEID_TAG:
            rec["ueid"] = val
        elif tag == MAC_LTE_FRAME_SUBFRAME_TAG:
            rec["sfn"], rec["sf_idx"] = val >> 4, val & 0xF
        elif tag == MAC_LTE_RETX_TAG:
            rec["retx"] = val
        elif tag == MAC_LTE_CRC_STATUS_TAG:
            rec["crc_ok"] = bool(val)
        elif tag == MAC_LTE_CARRIER_ID_TAG:
            rec["carrier_idx"] = val
        elif tag == MAC_LTE_NB_MODE_TAG:
            rec["nb_mode"] = val
    return rec


def read_pcap(path: str):
    """Parse a MAC-LTE pcap (ours or the reference's) into dicts.

    Handles both byte orders of the classic pcap magic and both frame styles
    (bare DLT-147 context, or legacy start-string-prefixed frames).
    """
    out = []
    with open(path, "rb") as f:
        gh = f.read(24)
        magic = struct.unpack("<I", gh[:4])[0]
        if magic == 0xA1B2C3D4:
            endian = "<"
        elif magic == 0xD4C3B2A1:
            endian = ">"
        else:
            raise ValueError(f"not a classic pcap: magic 0x{magic:08x}")
        _, _, _, _, _, network = struct.unpack(endian + "HHiIII", gh[4:])
        if network != MAC_LTE_DLT:
            raise ValueError(f"unexpected DLT {network}, want {MAC_LTE_DLT}")
        while True:
            rh = f.read(16)
            if len(rh) < 16:
                break
            ts_sec, ts_usec, incl, _orig = struct.unpack(endian + "IIII", rh)
            frame = f.read(incl)
            rec = parse_mac_lte_frame(frame)
            rec["ts"] = (ts_sec, ts_usec)
            out.append(rec)
    return out
