"""NAS EMM parsing (24.301/24.008) — plain-octet, EXACT encodings.

Extracts the plaintext identities the reference's security API reports
(`README.md` api mode; `UL_Sniffer_PUSCH.cc:96-247`): IMSI/GUTI from Attach
Request, IMSI/IMEI from Identity Response, plus mobile-identity helpers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

PD_EMM = 0x07
MSG_ATTACH_REQUEST = 0x41
MSG_ATTACH_ACCEPT = 0x42
MSG_IDENTITY_REQUEST = 0x55
MSG_IDENTITY_RESPONSE = 0x56
MSG_ATTACH_COMPLETE = 0x43

ID_TYPE_IMSI = 1
ID_TYPE_IMEI = 3
ID_TYPE_IMEISV = 5
ID_TYPE_TMSI = 4
ID_TYPE_GUTI = 6


def encode_mobile_identity(kind: int, digits: str = "",
                           guti: Optional[dict] = None) -> bytes:
    """24.008 10.5.1.4 Mobile Identity IE value part (no IEI/length)."""
    if kind == ID_TYPE_GUTI:
        g = guti
        out = bytearray()
        out.append(0xF0 | kind | 0x00)   # odd/even=0, type GUTI (0xF6 form)
        out[0] = 0xF6                    # spec fixed pattern for GUTI
        plmn = g["plmn"]                 # 6 BCD digits (mcc+mnc)
        out.append((int(plmn[1]) << 4) | int(plmn[0]))
        out.append((int(plmn[2]) << 4) | int(plmn[5]))
        out.append((int(plmn[4]) << 4) | int(plmn[3]))
        out += int(g["mme_group"]).to_bytes(2, "big")
        out.append(g["mme_code"] & 0xFF)
        out += int(g["m_tmsi"]).to_bytes(4, "big")
        return bytes(out)
    odd = len(digits) % 2
    out = bytearray()
    out.append((int(digits[0]) << 4) | (odd << 3) | kind)
    rest = digits[1:]
    for i in range(0, len(rest), 2):
        lo = int(rest[i])
        hi = int(rest[i + 1]) if i + 1 < len(rest) else 0xF
        out.append((hi << 4) | lo)
    return bytes(out)


@dataclasses.dataclass
class MobileIdentity:
    kind: int
    digits: Optional[str] = None
    guti: Optional[dict] = None

    @property
    def kind_name(self) -> str:
        return {1: "imsi", 3: "imei", 4: "tmsi", 5: "imeisv",
                6: "guti"}.get(self.kind, f"type{self.kind}")


def decode_mobile_identity(b: bytes) -> Optional[MobileIdentity]:
    if not b:
        return None
    first = b[0]
    kind = first & 0x07
    if first == 0xF6 or kind == 6:
        if len(b) < 11:
            return None
        plmn = [b[1] & 0xF, b[1] >> 4, b[2] & 0xF,
                b[3] >> 4, b[3] & 0xF, b[2] >> 4]
        return MobileIdentity(kind=ID_TYPE_GUTI, guti=dict(
            plmn="".join(str(d) for d in plmn),
            mme_group=int.from_bytes(b[4:6], "big"),
            mme_code=b[6],
            m_tmsi=int.from_bytes(b[7:11], "big")))
    odd = (first >> 3) & 1
    digits = [str(first >> 4)]
    for x in b[1:]:
        digits.append(str(x & 0xF))
        hi = x >> 4
        if hi != 0xF:
            digits.append(str(hi))
    return MobileIdentity(kind=kind, digits="".join(digits))


def encode_attach_request(identity: MobileIdentity) -> bytes:
    """Minimal plain Attach Request: headers + EPS mobile identity (LV)."""
    mi = encode_mobile_identity(identity.kind, identity.digits or "",
                                identity.guti)
    out = bytearray()
    out.append(PD_EMM)              # security header 0 | PD 7
    out.append(MSG_ATTACH_REQUEST)
    out.append(0x71)                # EPS attach type 1 | NAS key set id 7
    out.append(len(mi))             # EPS mobile identity LV
    out += mi
    return bytes(out)


def encode_identity_response(identity: MobileIdentity) -> bytes:
    mi = encode_mobile_identity(identity.kind, identity.digits or "",
                                identity.guti)
    return bytes([PD_EMM, MSG_IDENTITY_RESPONSE, len(mi)]) + mi


def encode_attach_accept(guti: dict) -> bytes:
    """Minimal plain Attach Accept with a GUTI TLV (IEI 0x50)."""
    mi = encode_mobile_identity(ID_TYPE_GUTI, guti=guti)
    esm = b"\x02\x00"                   # stub ESM container
    out = bytearray([PD_EMM, MSG_ATTACH_ACCEPT, 0x01, 0x21])
    out.append(0x00)                    # empty TAI list (LV len 0)
    out += len(esm).to_bytes(2, "big") + esm
    out += bytes([0x50, len(mi)]) + mi
    return bytes(out)


@dataclasses.dataclass
class NasInfo:
    msg_type: int
    msg_name: str
    identity: Optional[MobileIdentity] = None


def parse_nas(pdu: bytes) -> Optional[NasInfo]:
    """Parse a plain (unciphered) EMM message for identities."""
    if len(pdu) < 2:
        return None
    sec_hdr = pdu[0] >> 4
    pd = pdu[0] & 0x0F
    if pd != PD_EMM:
        return None
    if sec_hdr in (2, 4):
        # "integrity protected and ciphered": with EEA0 (null ciphering —
        # what the reference's captures and many live cells run) the inner
        # message is plaintext; parse opportunistically and keep it only
        # if it frames as EMM (the reference extracts identities from
        # exactly these, `DL_Sniffer_PDSCH.cc:804-879`)
        inner = pdu[6:]
        if len(inner) >= 2 and (inner[0] & 0x0F) == PD_EMM \
                and (inner[0] >> 4) == 0:
            out = parse_nas(inner)
            if out is not None and out.msg_type > 0:
                return out
        return NasInfo(msg_type=-1, msg_name="ciphered")
    if sec_hdr not in (0, 1):
        return NasInfo(msg_type=-1, msg_name="ciphered")
    body = pdu if sec_hdr == 0 else pdu[6:]
    if len(body) < 2:
        return None
    mt = body[1]
    if mt == MSG_ATTACH_REQUEST:
        if len(body) < 4:
            return None
        ln = body[3]
        mi = decode_mobile_identity(body[4:4 + ln])
        return NasInfo(mt, "attach_request", mi)
    if mt == MSG_IDENTITY_RESPONSE:
        ln = body[2]
        mi = decode_mobile_identity(body[3:3 + ln])
        return NasInfo(mt, "identity_response", mi)
    if mt == MSG_IDENTITY_REQUEST:
        return NasInfo(mt, "identity_request")
    if mt == MSG_ATTACH_ACCEPT:
        # 24.301 8.2.1: [result/spare][T3412][TAI list LV][ESM LV-E] then
        # optional TLVs; GUTI is IEI 0x50 (the reference's Reconfig TMSI
        # source, `DL_Sniffer_PDSCH.cc:804-879`)
        try:
            p = 4                       # skip result + T3412
            p += 1 + body[p]            # TAI list (LV)
            p += 2 + int.from_bytes(body[p:p + 2], "big")   # ESM (LV-E)
            mi = None
            while p + 2 <= len(body):
                iei, ln = body[p], body[p + 1]
                if iei == 0x50:
                    mi = decode_mobile_identity(body[p + 2:p + 2 + ln])
                    break
                p += 2 + ln
            return NasInfo(mt, "attach_accept", mi)
        except (IndexError, ValueError):
            return NasInfo(mt, "attach_accept")
    return NasInfo(mt, f"emm_0x{mt:02x}")
