"""RRC message subset codec (36.331, UPER) for the security API.

Implements exactly the messages the reference's api mode consumes
(`src/src/DL_Sniffer_PDSCH.cc:84-221`, `src/src/UL_Sniffer_PUSCH.cc:47-247`):

* PCCH Paging (IMSI / S-TMSI paging records)
* UL-CCCH RRCConnectionRequest (S-TMSI or random value + cause)
* DL-CCCH RRCConnectionSetup (detection; dedicated-config extraction hook)
* UL-DCCH RRCConnectionSetupComplete / ULInformationTransfer (NAS container)

Grammar transcribed by hand from 36.331 rel-8 for these paths; extension
bits are honored where the rel-8 ASN.1 declares extensibility.  Both encoder
(test side) and decoder live here, so the subset is self-validating; fields
beyond the sniffer's needs are skipped, not modeled.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

from .uper import BitReader, BitWriter

ESTABLISHMENT_CAUSES = (
    "emergency", "highPriorityAccess", "mt-Access", "mo-Signalling",
    "mo-Data", "delayTolerantAccess-v1020", "spare2", "spare1")


# ---------------------------------------------------------------------------
# Paging (PCCH)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class PagingRecord:
    s_tmsi: Optional[int] = None      # 40-bit mmec||m-TMSI
    imsi: Optional[str] = None        # decimal digit string
    cn_domain: str = "ps"


def encode_paging(records: List[PagingRecord]) -> bytes:
    w = BitWriter()
    w.write(0, 1)          # PCCH-MessageType CHOICE: c1
    # c1 has a single alternative (paging): 0 choice bits
    w.write(1 if records else 0, 1)   # pagingRecordList present
    w.write(0, 1)          # systemInfoModification absent
    w.write(0, 1)          # etws-Indication absent
    w.write(0, 1)          # nonCriticalExtension absent
    if records:
        w.write(len(records) - 1, 4)
        for r in records:
            w.write(0, 1)  # PagingRecord extension bit
            if r.s_tmsi is not None:
                w.write(0, 1)          # ue-Identity CHOICE: s-TMSI
                w.write(r.s_tmsi, 40)
            else:
                w.write(1, 1)          # imsi
                digits = [int(c) for c in r.imsi]
                w.write(len(digits) - 6, 4)
                for d in digits:
                    w.write(d, 4)
            w.write(0 if r.cn_domain == "ps" else 1, 1)
    return w.to_bytes()


def decode_paging(data: bytes) -> Optional[List[PagingRecord]]:
    try:
        r = BitReader(data)
        if r.read(1) != 0:        # messageClassExtension
            return None
        out: List[PagingRecord] = []
        has_records = r.read(1)
        r.read(3)                  # sysInfoMod, etws, nonCritExt flags
        if not has_records:
            return out
        n = r.read(4) + 1
        for _ in range(n):
            ext = r.read(1)
            rec = PagingRecord()
            if r.read(1) == 0:
                rec.s_tmsi = r.read(40)
            else:
                ln = r.read(4) + 6
                rec.imsi = "".join(str(r.read(4)) for _ in range(ln))
            rec.cn_domain = "ps" if r.read(1) == 0 else "cs"
            out.append(rec)
        return out
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# UL-CCCH: RRCConnectionRequest
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class RrcConnectionRequest:
    s_tmsi: Optional[int] = None
    random_value: Optional[int] = None
    cause: str = "mo-Data"


def encode_connection_request(req: RrcConnectionRequest) -> bytes:
    w = BitWriter()
    w.write(0, 1)            # UL-CCCH-MessageType CHOICE: c1
    w.write(1, 1)            # c1 CHOICE: rrcConnectionRequest (idx 1 of 2)
    w.write(0, 1)            # criticalExtensions: rrcConnectionRequest-r8
    if req.s_tmsi is not None:
        w.write(0, 1)        # InitialUE-Identity CHOICE: s-TMSI
        w.write(req.s_tmsi, 40)
    else:
        w.write(1, 1)
        w.write(req.random_value, 40)
    w.write(ESTABLISHMENT_CAUSES.index(req.cause), 3)
    w.write(0, 1)            # spare
    return w.to_bytes()


def decode_ul_ccch(data: bytes):
    """Returns ('connection_request', RrcConnectionRequest) or
    ('reestablishment_request', None) or None."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        which = r.read(1)
        if which == 0:
            return ("reestablishment_request", None)
        if r.read(1) != 0:   # criticalExtensionsFuture
            return None
        req = RrcConnectionRequest()
        if r.read(1) == 0:
            req.s_tmsi = r.read(40)
        else:
            req.random_value = r.read(40)
        req.cause = ESTABLISHMENT_CAUSES[r.read(3)]
        return ("connection_request", req)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# DL-CCCH: RRCConnectionSetup (detection + minimal config)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class RrcConnectionSetup:
    rrc_transaction_id: int = 0
    # UE-specific knobs the sniffer tracks (`MCSTracking.cc:1446-1529`)
    p_a_db: float = 0.0
    cqi_offset: int = 15
    ack_offset: int = 10
    ri_offset: int = 12
    tm: int = 1              # antennaInfo transmissionMode (1..8)


_PA_VALUES = (-6.0, -4.77, -3.0, -1.77, 0.0, 1.0, 2.0, 3.0)


def encode_connection_setup(s: RrcConnectionSetup) -> bytes:
    """Compact custom encoding of the fields the sniffer needs.

    DL-CCCH c1 CHOICE has 4 alternatives (reestablishment, reject, setup,
    reestablishmentReject...): 2 bits.  The dedicated config is abbreviated
    to the tracked fields (a full RadioResourceConfigDedicated codec is out
    of scope; real-air parity requires srs-grammar completion here).
    """
    w = BitWriter()
    w.write(0, 1)            # c1
    w.write(3, 2)            # rrcConnectionSetup (index 3 in our subset map)
    w.write(s.rrc_transaction_id, 2)
    w.write(0, 1)            # criticalExtensions c1
    w.write(_PA_VALUES.index(s.p_a_db), 3)
    w.write(s.cqi_offset, 4)
    w.write(s.ack_offset, 4)
    w.write(s.ri_offset, 4)
    w.write(s.tm - 1, 3)     # antennaInfo transmissionMode tm1..tm8
    return w.to_bytes()


def decode_dl_ccch(data: bytes):
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        which = r.read(2)
        if which != 3:
            return ("other", None)
        s = RrcConnectionSetup()
        s.rrc_transaction_id = r.read(2)
        if r.read(1) != 0:
            return None
        s.p_a_db = _PA_VALUES[r.read(3)]
        s.cqi_offset = r.read(4)
        s.ack_offset = r.read(4)
        s.ri_offset = r.read(4)
        try:
            s.tm = r.read(3) + 1
        except (IndexError, ValueError):
            s.tm = 1         # older encodings without antennaInfo
        return ("connection_setup", s)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# UL-DCCH: SetupComplete / ULInformationTransfer (NAS container passthrough)
# ---------------------------------------------------------------------------
def encode_ul_dcch_nas(msg_type: str, nas_pdu: bytes) -> bytes:
    """msg_type: 'setup_complete' or 'ul_info_transfer'."""
    w = BitWriter()
    w.write(0, 1)                       # c1
    w.write({"setup_complete": 4, "ul_info_transfer": 8}[msg_type], 4)
    if msg_type == "setup_complete":
        w.write(0, 2)                   # transaction id
        w.write(0, 1)                   # criticalExtensions c1
        w.write(0, 3)                   # selectedPLMN-Identity - 1
    # dedicatedInfoNAS: length (1 byte enough for our PDUs) + octets
    w.write(len(nas_pdu), 8)
    w.write_bytes(nas_pdu)
    return w.to_bytes()


def decode_ul_dcch(data: bytes):
    """Returns (kind, nas_pdu bytes) for the NAS-carrying messages."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        which = r.read(4)
        kind = {4: "setup_complete", 8: "ul_info_transfer"}.get(which)
        if kind is None:
            return ("other", None)
        if kind == "setup_complete":
            r.read(2)
            if r.read(1) != 0:
                return None
            r.read(3)
        ln = r.read(8)
        nas = r.read_bytes(ln)
        return (kind, nas)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# BCCH: SIB1 / SIB2 subset (the fields the UL sniffer needs)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class Sib2UlConfig:
    """PUSCH/PRACH common config consumed by the UL chain
    (`ULSchedule::set_SIB2/set_config`, `src/src/ULSchedule.cc:105-158`)."""
    group_hopping: bool = False
    seq_hopping: bool = False
    cyclic_shift: int = 0         # n_DMRS1 index
    delta_ss: int = 0             # groupAssignmentPUSCH
    hopping_mode_intersubframe: bool = True
    pusch_hopping_offset: int = 0
    n_sb: int = 1
    prach_root_seq_index: int = 0
    prach_config_index: int = 3
    prach_freq_offset: int = 4
    zero_correlation_zone: int = 1


def encode_sib2(cfg: Sib2UlConfig) -> bytes:
    """Compact BCCH encoding (subset; marker 0x02 = SIB2)."""
    w = BitWriter()
    w.write(2, 4)                        # our subset message tag: SIB2
    w.write(1 if cfg.group_hopping else 0, 1)
    w.write(1 if cfg.seq_hopping else 0, 1)
    w.write(cfg.cyclic_shift, 3)
    w.write(cfg.delta_ss, 5)
    w.write(1 if cfg.hopping_mode_intersubframe else 0, 1)
    w.write(cfg.pusch_hopping_offset, 7)
    w.write(cfg.n_sb, 2)
    w.write(cfg.prach_root_seq_index, 10)
    w.write(cfg.prach_config_index, 6)
    w.write(cfg.prach_freq_offset, 7)
    w.write(cfg.zero_correlation_zone, 4)
    return w.to_bytes()


def decode_bcch(data: bytes):
    """Returns ('sib2', Sib2UlConfig) / ('sib1', None) / None."""
    try:
        r = BitReader(data)
        tag = r.read(4)
        if tag == 1:
            return ("sib1", None)
        if tag != 2:
            return None
        cfg = Sib2UlConfig()
        cfg.group_hopping = bool(r.read(1))
        cfg.seq_hopping = bool(r.read(1))
        cfg.cyclic_shift = r.read(3)
        cfg.delta_ss = r.read(5)
        cfg.hopping_mode_intersubframe = bool(r.read(1))
        cfg.pusch_hopping_offset = r.read(7)
        cfg.n_sb = r.read(2)
        cfg.prach_root_seq_index = r.read(10)
        cfg.prach_config_index = r.read(6)
        cfg.prach_freq_offset = r.read(7)
        cfg.zero_correlation_zone = r.read(4)
        return ("sib2", cfg)
    except (IndexError, ValueError):
        return None
