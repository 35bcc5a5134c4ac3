"""MAC-LTE pcap writer (Wireshark-compatible).

Produces the same artifact the reference's `LTESniffer_pcap_writer` emits
(`src/src/PcapWriter.cc:75-190`): DLT 147 (DLT_USER0) frames carrying the
Wireshark "mac-lte" framed header (radio type, direction, rnti type, tagged
SFN/subframe, retx count, CRC status) followed by the MAC PDU payload.
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
        rt = rnti_type_of(rnti) if rnti_type is None else rnti_type
        ctx = bytearray()
        ctx += MAC_LTE_START_STRING
        ctx.append(FDD_RADIO)
        ctx.append(direction)
        ctx.append(rt)
        if rt in (C_RNTI, RA_RNTI, SI_RNTI, P_RNTI, SPS_RNTI, M_RNTI):
            ctx.append(MAC_LTE_RNTI_TAG)
            ctx += struct.pack(">H", rnti & 0xFFFF)
        ctx.append(MAC_LTE_UEID_TAG)
        ctx += struct.pack(">H", ueid & 0xFFFF)
        ctx.append(MAC_LTE_FRAME_SUBFRAME_TAG)
        ctx += struct.pack(">H", ((sfn & 0x3FF) << 4) | (sf_idx & 0xF))
        ctx.append(MAC_LTE_RETX_TAG)
        ctx.append(retx & 0xFF)
        ctx.append(MAC_LTE_CRC_STATUS_TAG)
        ctx.append(1 if crc_ok else 0)
        ctx.append(MAC_LTE_PAYLOAD_TAG)
        frame = bytes(ctx) + payload
        with self._lock:
            self._f.write(struct.pack("<IIII", ts_sec, ts_usec,
                                      len(frame), len(frame)))
            self._f.write(frame)

    def flush(self):
        with self._lock:
            self._f.flush()

    def close(self):
        with self._lock:
            self._f.close()


def read_pcap(path: str):
    """Parse a MAC-LTE pcap back into dicts (for tests/round-trip checks)."""
    out = []
    with open(path, "rb") as f:
        gh = f.read(24)
        magic, _, _, _, _, _, network = struct.unpack("<IHHiIII", gh)
        assert magic == 0xA1B2C3D4 and network == MAC_LTE_DLT
        while True:
            rh = f.read(16)
            if len(rh) < 16:
                break
            ts_sec, ts_usec, incl, orig = struct.unpack("<IIII", rh)
            frame = f.read(incl)
            assert frame.startswith(MAC_LTE_START_STRING)
            p = len(MAC_LTE_START_STRING)
            radio, direction, rt = frame[p], frame[p + 1], frame[p + 2]
            p += 3
            rec = {"radio": radio, "direction": direction, "rnti_type": rt,
                   "ts": (ts_sec, ts_usec)}
            while p < len(frame):
                tag = frame[p]
                p += 1
                if tag == MAC_LTE_PAYLOAD_TAG:
                    rec["payload"] = frame[p:]
                    break
                if tag == MAC_LTE_RNTI_TAG:
                    rec["rnti"] = struct.unpack(">H", frame[p:p + 2])[0]
                    p += 2
                elif tag == MAC_LTE_UEID_TAG:
                    rec["ueid"] = struct.unpack(">H", frame[p:p + 2])[0]
                    p += 2
                elif tag == MAC_LTE_FRAME_SUBFRAME_TAG:
                    v = struct.unpack(">H", frame[p:p + 2])[0]
                    rec["sfn"], rec["sf_idx"] = v >> 4, v & 0xF
                    p += 2
                elif tag == MAC_LTE_RETX_TAG:
                    rec["retx"] = frame[p]
                    p += 1
                elif tag == MAC_LTE_CRC_STATUS_TAG:
                    rec["crc_ok"] = bool(frame[p])
                    p += 1
                else:
                    raise ValueError(f"unknown tag {tag}")
            out.append(rec)
    return out
