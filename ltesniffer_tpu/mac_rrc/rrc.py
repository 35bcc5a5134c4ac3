"""RRC message codec (36.331 rel-8, unaligned PER) for the security API
and the UL-mode configuration chain.

Covers the messages the reference's api mode consumes
(`src/src/DL_Sniffer_PDSCH.cc:84-221`, `src/src/UL_Sniffer_PUSCH.cc:47-247`)
with the REAL 36.331 grammar (hand-transcribed, validated against real-air
bytes from the reference's shipped captures
`/root/reference/pcap_file_example/*.pcap` — see tests/test_rrc_real_air.py):

* PCCH  Paging (IMSI / S-TMSI records)
* UL-CCCH  RRCConnectionRequest
* DL-CCCH  RRCConnectionSetup -> RadioResourceConfigDedicated ->
           physicalConfigDedicated (p-a, beta offsets, antennaInfo TM,
           cqi-ReportConfig) — the UE-config source for MCSTracking
           (`MCSTracking.cc:1446-1529`)
* UL-DCCH  RRCConnectionSetupComplete / ULInformationTransfer (NAS),
           UECapabilityInformation / measurementReport detection
* DL-DCCH  DLInformationTransfer (NAS), RRCConnectionReconfiguration
           (dedicatedInfoNASList + radioResourceConfigDedicated),
           SecurityModeCommand / UECapabilityEnquiry detection
* BCCH-DL-SCH  SystemInformationBlockType1 (PLMN, scheduling info) and
           SystemInformation -> SIB2 (PRACH + PUSCH common config for
           `ULSchedule::set_SIB2/set_config`, `ULSchedule.cc:105-158`)

Encoders for the same subset drive the test-side eNB; the golden pins are
the real-air vectors, not this module's own output.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from .uper import BitReader, BitWriter

ESTABLISHMENT_CAUSES = (
    "emergency", "highPriorityAccess", "mt-Access", "mo-Signalling",
    "mo-Data", "delayTolerantAccess-v1020", "spare2", "spare1")

_PA_VALUES = (-6.0, -4.77, -3.0, -1.77, 0.0, 1.0, 2.0, 3.0)


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
            r.read(1)              # PagingRecord extension bit
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
# Shared sub-IE parsers (36.331 6.3.2)
# ---------------------------------------------------------------------------
class _Bail(Exception):
    """Grammar path present in the stream but outside the implemented
    subset — the caller returns what it has decoded so far."""


def _skip_rlc_config(r: BitReader):
    """RLC-Config CHOICE {am, um-Bi-Directional, um-Uni-Directional-UL,
    um-Uni-Directional-DL} — fixed-width fields throughout."""
    which = r.read(2)
    if which == 0:           # am
        r.read(6)            # ul: t-PollRetransmit (64 values)
        r.read(3)            # pollPDU
        r.read(4)            # pollByte
        r.read(3)            # maxRetxThreshold
        _skip_dl_um_rlc(r)   # dl: t-Reordering (5 bits) ...
        r.read(6)            # t-StatusProhibit (64 values)
    elif which == 1:         # um-Bi-Directional
        r.read(1)            # ul sn-FieldLength
        r.read(1)            # dl sn-FieldLength
        r.read(5)            # dl t-Reordering
    elif which == 2:         # um-Uni-Directional-UL
        r.read(1)
    else:                    # um-Uni-Directional-DL
        r.read(1)
        r.read(5)


def _skip_dl_um_rlc(r: BitReader):
    r.read(5)                # t-Reordering (32 values)


def _parse_logical_channel_config(r: BitReader):
    """LogicalChannelConfig (rel-8): ext bit, then ul-SpecificParameters
    OPTIONAL (preamble), whose own preamble covers logicalChannelGroup."""
    if r.read(1):
        raise _Bail()
    if r.read(1):                    # ul-SpecificParameters present
        has_lcg = r.read(1)          # logicalChannelGroup OPTIONAL
        r.read(4)                    # priority (1..16)
        r.read(4)                    # prioritisedBitRate
        r.read(3)                    # bucketSizeDuration
        if has_lcg:
            r.read(2)                # logicalChannelGroup (0..3)


def _parse_srb_to_add_mod_list(r: BitReader):
    n = r.read(1) + 1                # SIZE (1..2)
    for _ in range(n):
        if r.read(1):                # SRB-ToAddMod extension bit
            raise _Bail()
        has_rlc = r.read(1)
        has_lcc = r.read(1)
        r.read(1)                    # srb-Identity (1..2)
        if has_rlc:
            if r.read(1) == 0:       # explicitValue
                _skip_rlc_config(r)
            # defaultValue: NULL, no bits
        if has_lcc:
            if r.read(1) == 0:
                _parse_logical_channel_config(r)


def _parse_mac_main_config(r: BitReader):
    """MAC-MainConfig (rel-8): skip through fixed-width fields."""
    if r.read(1):
        raise _Bail()
    has_ulsch = r.read(1)
    has_drx = r.read(1)
    has_phr = r.read(1)
    if has_ulsch:
        has_maxharq = r.read(1)
        has_pbsr = r.read(1)
        if has_maxharq:
            r.read(4)                # maxHARQ-Tx (16 values)
        if has_pbsr:
            r.read(4)                # periodicBSR-Timer (16 values)
        r.read(3)                    # retxBSR-Timer (8 values)
        r.read(1)                    # ttiBundling
    if has_drx:
        if r.read(1):                # setup
            r.read(4)                # onDurationTimer (16)
            r.read(5)                # drx-InactivityTimer (32)
            r.read(3)                # drx-RetransmissionTimer (8)
            has_short = r.read(1)    # shortDRX OPTIONAL (preamble of SEQ?)
            # longDRX-CycleStartOffset CHOICE (16 alternatives)
            which = r.read(4)
            spans = (10, 20, 32, 40, 64, 80, 128, 160, 256, 320, 512, 640,
                     1024, 1280, 2048, 2560)
            span = spans[which]
            bits = 0
            while (1 << bits) < span:
                bits += 1
            r.read(bits)
            if has_short:
                r.read(4)            # shortDRX-Cycle (16)
                r.read(4)            # drxShortCycleTimer (1..16)
    r.read(3)                        # timeAlignmentTimerDedicated
    if has_phr:
        if r.read(1):                # setup
            r.read(3)                # periodicPHR-Timer (8)
            r.read(3)                # prohibitPHR-Timer (8)
            r.read(2)                # dl-PathlossChange (4)


def _skip_tpc_pdcch_config(r: BitReader):
    if r.read(1):                    # setup
        r.read(16)                   # tpc-RNTI BIT STRING (16)
        if r.read(1) == 0:           # indexOfFormat3
            r.read(4)                # (1..15)
        else:
            r.read(5)                # (1..31)


def _skip_srs_dedicated(r: BitReader):
    if r.read(1):                    # setup
        r.read(2)                    # srs-Bandwidth
        r.read(2)                    # srs-HoppingBandwidth
        r.read(5)                    # freqDomainPosition (0..23)
        r.read(1)                    # duration
        r.read(10)                   # srs-ConfigIndex (0..1023)
        r.read(1)                    # transmissionComb (0..1)
        r.read(3)                    # cyclicShift


def _skip_scheduling_request_config(r: BitReader):
    if r.read(1):                    # setup
        r.read(11)                   # sr-PUCCH-ResourceIndex (0..2047)
        r.read(8)                    # sr-ConfigIndex (0..157)
        r.read(3)                    # dsr-TransMax


@dataclasses.dataclass
class RrcConnectionSetup:
    rrc_transaction_id: int = 0
    # UE-specific knobs the sniffer tracks (`MCSTracking.cc:1446-1529`)
    p_a_db: float = 0.0
    cqi_offset: int = 15
    ack_offset: int = 10
    ri_offset: int = 12
    tm: int = 1              # antennaInfo transmissionMode (1..8)
    cqi_aperiodic_mode: Optional[str] = None
    cqi_nom_pdsch_rs_epre_offset: int = 0
    complete: bool = True    # False: stream held IEs beyond the subset


_CQI_APERIODIC_MODES = ("rm12", "rm20", "rm22", "rm30", "rm31",
                        "spare3", "spare2", "spare1")


def _parse_physical_config_dedicated(r: BitReader, s: RrcConnectionSetup):
    """PhysicalConfigDedicated (rel-8): ten optional IEs; extract the
    sniffer-tracked fields, skip the rest field-exactly."""
    if r.read(1):
        raise _Bail()
    (has_pdsch, has_pucch, has_pusch, has_upc, has_tpc_pucch,
     has_tpc_pusch, has_cqi, has_srs, has_ant, has_sr) = (
        r.read(1) for _ in range(10))
    if has_pdsch:
        s.p_a_db = _PA_VALUES[r.read(3)]
    if has_pucch:
        has_tdd = r.read(1)          # tdd-AckNackFeedbackMode OPTIONAL
        if r.read(1):                # ackNackRepetition: setup
            r.read(2)                # repetitionFactor
            r.read(11)               # n1PUCCH-AN-Rep
        if has_tdd:
            r.read(1)
    if has_pusch:
        s.ack_offset = r.read(4)     # betaOffset-ACK-Index
        s.ri_offset = r.read(4)      # betaOffset-RI-Index
        s.cqi_offset = r.read(4)     # betaOffset-CQI-Index
    if has_upc:
        has_fc = r.read(1)           # filterCoefficient DEFAULT
        r.read(4)                    # p0-UE-PUSCH (-8..7)
        r.read(1)                    # deltaMCS-Enabled
        r.read(1)                    # accumulationEnabled
        r.read(4)                    # p0-UE-PUCCH (-8..7)
        r.read(4)                    # pSRS-Offset
        if has_fc:
            r.read(4)                # filterCoefficient (16 values)
    if has_tpc_pucch:
        _skip_tpc_pdcch_config(r)
    if has_tpc_pusch:
        _skip_tpc_pdcch_config(r)
    if has_cqi:
        has_aper = r.read(1)
        has_per = r.read(1)
        if has_aper:
            s.cqi_aperiodic_mode = _CQI_APERIODIC_MODES[r.read(3)]
        s.cqi_nom_pdsch_rs_epre_offset = r.read(3) - 1   # (-1..6)
        if has_per:
            if r.read(1):            # setup
                has_ri = r.read(1)
                r.read(11)           # cqi-PUCCH-ResourceIndex (0..1185)
                r.read(10)           # cqi-pmi-ConfigIndex (0..1023)
                if r.read(1):        # subbandCQI
                    r.read(2)        # k (1..4)
                if has_ri:
                    r.read(10)       # ri-ConfigIndex
                r.read(1)            # simultaneousAckNackAndCQI
    if has_srs:
        _skip_srs_dedicated(r)
    if has_ant:
        if r.read(1) == 0:           # explicitValue AntennaInfoDedicated
            has_cb = r.read(1)       # codebookSubsetRestriction OPTIONAL
            s.tm = r.read(3) + 1     # transmissionMode tm1..tm8
            if has_cb:
                which = r.read(3)    # CHOICE of 8 bit-string widths
                widths = (2, 4, 6, 64, 4, 16, 4, 16)
                r.read(widths[which])
            if r.read(1):            # ue-TransmitAntennaSelection: setup
                r.read(1)
    if has_sr:
        _skip_scheduling_request_config(r)


def _parse_radio_resource_config_dedicated(r: BitReader,
                                           s: RrcConnectionSetup):
    if r.read(1):
        raise _Bail()
    has_srb = r.read(1)
    has_drb = r.read(1)
    has_drb_rel = r.read(1)
    has_mac = r.read(1)
    has_sps = r.read(1)
    has_phys = r.read(1)
    if has_srb:
        _parse_srb_to_add_mod_list(r)
    if has_drb or has_drb_rel or has_sps:
        raise _Bail()        # DRB/SPS grammar outside the subset
    if has_mac:
        if r.read(1) == 0:   # explicitValue
            _parse_mac_main_config(r)
    if has_phys:
        _parse_physical_config_dedicated(r, s)


def encode_connection_setup(s: RrcConnectionSetup) -> bytes:
    """Real UPER RRCConnectionSetup: radioResourceConfigDedicated carrying
    only physicalConfigDedicated (pdsch p-a, pusch beta offsets,
    cqi-ReportConfig, antennaInfo) — a legal minimal encoding."""
    w = BitWriter()
    w.write(0, 1)            # DL-CCCH c1
    w.write(3, 2)            # rrcConnectionSetup
    w.write(s.rrc_transaction_id, 2)
    w.write(0, 1)            # criticalExtensions: c1
    w.write(0, 3)            # rrcConnectionSetup-r8
    w.write(0, 1)            # nonCriticalExtension absent
    # RadioResourceConfigDedicated
    w.write(0, 1)            # extension bit
    w.write(0, 1)            # srb-ToAddModList absent
    w.write(0, 1)            # drb-ToAddModList absent
    w.write(0, 1)            # drb-ToReleaseList absent
    w.write(0, 1)            # mac-MainConfig absent
    w.write(0, 1)            # sps-Config absent
    w.write(1, 1)            # physicalConfigDedicated present
    # PhysicalConfigDedicated
    w.write(0, 1)            # extension bit
    w.write(1, 1)            # pdsch-ConfigDedicated
    w.write(0, 1)            # pucch-ConfigDedicated
    w.write(1, 1)            # pusch-ConfigDedicated
    w.write(0, 1)            # uplinkPowerControlDedicated
    w.write(0, 1)            # tpc-PDCCH-ConfigPUCCH
    w.write(0, 1)            # tpc-PDCCH-ConfigPUSCH
    w.write(1, 1)            # cqi-ReportConfig
    w.write(0, 1)            # soundingRS-UL-ConfigDedicated
    w.write(1, 1)            # antennaInfo
    w.write(0, 1)            # schedulingRequestConfig
    w.write(_PA_VALUES.index(s.p_a_db), 3)      # pdsch: p-a
    w.write(s.ack_offset, 4)                    # pusch: betaOffset-ACK
    w.write(s.ri_offset, 4)                     # betaOffset-RI
    w.write(s.cqi_offset, 4)                    # betaOffset-CQI
    # cqi-ReportConfig: aperiodic present iff set, periodic absent
    if s.cqi_aperiodic_mode is not None:
        w.write(1, 1)
        w.write(0, 1)
        w.write(_CQI_APERIODIC_MODES.index(s.cqi_aperiodic_mode), 3)
    else:
        w.write(0, 1)
        w.write(0, 1)
    w.write(s.cqi_nom_pdsch_rs_epre_offset + 1, 3)
    # antennaInfo: explicitValue, no codebook restriction
    w.write(0, 1)            # explicitValue
    w.write(0, 1)            # codebookSubsetRestriction absent
    w.write(s.tm - 1, 3)     # transmissionMode
    w.write(0, 1)            # ue-TransmitAntennaSelection: release
    return w.to_bytes()


def decode_dl_ccch(data: bytes):
    """('connection_setup', RrcConnectionSetup) / ('reject', None) /
    ('reestablishment', None) / ('reestablishment_reject', None) / None."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        which = r.read(2)
        if which == 0:
            return ("reestablishment", None)
        if which == 1:
            return ("reestablishment_reject", None)
        if which == 2:
            return ("reject", None)
        s = RrcConnectionSetup()
        s.rrc_transaction_id = r.read(2)
        if r.read(1) != 0:       # criticalExtensionsFuture
            return None
        if r.read(3) != 0:       # c1: rrcConnectionSetup-r8 only
            return None
        r.read(1)                # nonCriticalExtension flag
        try:
            _parse_radio_resource_config_dedicated(r, s)
        except _Bail:
            s.complete = False
        return ("connection_setup", s)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# UL-DCCH
# ---------------------------------------------------------------------------
_UL_DCCH_C1 = (
    "csfbParametersRequestCDMA2000", "measurementReport",
    "rrcConnectionReconfigurationComplete",
    "rrcConnectionReestablishmentComplete", "rrcConnectionSetupComplete",
    "securityModeComplete", "securityModeFailure", "ueCapabilityInformation",
    "ulHandoverPreparationTransfer", "ulInformationTransfer",
    "counterCheckResponse", "ueInformationResponse-r9",
    "proximityIndication-r9", "rnReconfigurationComplete-r10",
    "spare2", "spare1")


def encode_ul_dcch_nas(msg_type: str, nas_pdu: bytes) -> bytes:
    """Real UPER UL-DCCH: 'setup_complete' (RRCConnectionSetupComplete-r8)
    or 'ul_info_transfer' (ULInformationTransfer-r8), carrying nas_pdu."""
    w = BitWriter()
    w.write(0, 1)                       # c1
    if msg_type == "setup_complete":
        w.write(4, 4)                   # rrcConnectionSetupComplete
        w.write(0, 2)                   # rrc-TransactionIdentifier
        w.write(0, 1)                   # criticalExtensions: c1
        w.write(0, 2)                   # c1: ...-r8
        w.write(0, 1)                   # registeredMME absent
        w.write(0, 1)                   # nonCriticalExtension absent
        w.write(0, 3)                   # selectedPLMN-Identity - 1
        w.write_octet_string(nas_pdu)   # dedicatedInfoNAS
    elif msg_type == "ul_info_transfer":
        w.write(9, 4)                   # ulInformationTransfer
        w.write(0, 1)                   # criticalExtensions: c1
        w.write(0, 2)                   # c1: ...-r8
        w.write(0, 1)                   # nonCriticalExtension absent
        w.write(0, 2)                   # dedicatedInfoType: dedicatedInfoNAS
        w.write_octet_string(nas_pdu)
    else:
        raise ValueError(msg_type)
    return w.to_bytes()


def decode_ul_dcch(data: bytes):
    """Returns (kind, nas_pdu | None).  kind in {'setup_complete',
    'ul_info_transfer', 'ue_capability_information', 'measurement_report',
    'other'}; NAS bytes for the two NAS-carrying messages."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        which = r.read(4)
        name = _UL_DCCH_C1[which]
        if name == "rrcConnectionSetupComplete":
            r.read(2)                   # rrc-TransactionIdentifier
            if r.read(1) != 0:
                return None
            if r.read(2) != 0:          # c1: ...-r8
                return None
            has_mme = r.read(1)
            r.read(1)                   # nonCriticalExtension flag
            r.read(3)                   # selectedPLMN-Identity
            if has_mme:
                # RegisteredMME ::= SEQ { plmn-Identity OPTIONAL,
                #   mmegi BIT STRING(16), mmec BIT STRING(8) }
                if r.read(1):
                    _skip_plmn_identity(r)
                r.read(16)
                r.read(8)
            nas = r.read_octet_string()
            return ("setup_complete", nas)
        if name == "ulInformationTransfer":
            if r.read(1) != 0:
                return None
            if r.read(2) != 0:
                return None
            r.read(1)                   # nonCriticalExtension flag
            if r.read(2) != 0:          # dedicatedInfoType: NAS only
                return ("ul_info_transfer", None)
            nas = r.read_octet_string()
            return ("ul_info_transfer", nas)
        if name == "ueCapabilityInformation":
            return ("ue_capability_information", None)
        if name == "measurementReport":
            return ("measurement_report", None)
        return ("other", None)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# DL-DCCH
# ---------------------------------------------------------------------------
_DL_DCCH_C1 = (
    "csfbParametersResponseCDMA2000", "dlInformationTransfer",
    "handoverFromEUTRAPreparationRequest", "mobilityFromEUTRACommand",
    "rrcConnectionReconfiguration", "rrcConnectionRelease",
    "securityModeCommand", "ueCapabilityEnquiry", "counterCheck",
    "ueInformationRequest-r9", "loggedMeasurementConfiguration-r10",
    "rnReconfiguration-r10", "spare4", "spare3", "spare2", "spare1")


@dataclasses.dataclass
class Reconfiguration:
    rrc_transaction_id: int = 0
    nas_pdus: List[bytes] = dataclasses.field(default_factory=list)
    setup: Optional[RrcConnectionSetup] = None   # rrcd phys-config reuse
    has_meas_config: bool = False
    has_mobility_control: bool = False
    complete: bool = True


_Q_OFFSET_BITS = 5            # Q-OffsetRange: 31 enum values


def _skip_threshold_eutra(r: BitReader):
    if r.read(1) == 0:
        r.read(7)                        # threshold-RSRP (0..97)
    else:
        r.read(6)                        # threshold-RSRQ (0..34)


def _skip_report_config_eutra(r: BitReader):
    if r.read(1):
        raise _Bail()
    if r.read(1) == 0:                   # triggerType: event
        if r.read(1):                    # eventId extension
            raise _Bail()
        ev = r.read(3)                   # a1..a5 (+3 spare? rel8: 5 root)
        if ev in (0, 1, 3):              # a1/a2/a4: one threshold
            _skip_threshold_eutra(r)
        elif ev == 2:                    # a3: offset + reportOnLeave
            r.read(6)                    # a3-Offset (-30..30)
            r.read(1)
        elif ev == 4:                    # a5: two thresholds
            _skip_threshold_eutra(r)
            _skip_threshold_eutra(r)
        else:
            raise _Bail()
        r.read(5)                        # hysteresis (0..30)
        r.read(4)                        # timeToTrigger (16 values)
    else:                                # periodical
        r.read(1)                        # purpose (2 values)
    r.read(1)                            # triggerQuantity
    r.read(1)                            # reportQuantity
    r.read(3)                            # maxReportCells (1..8)
    r.read(4)                            # reportInterval (16 values)
    r.read(3)                            # reportAmount (8 values)


def _skip_meas_object_eutra(r: BitReader):
    if r.read(1):
        raise _Bail()
    has = [r.read(1) for _ in range(6)]  # offsetFreq DEFAULT + 5 optionals
    r.read(16)                           # carrierFreq
    r.read(3)                            # allowedMeasBandwidth (6 values)
    r.read(1)                            # presenceAntennaPort1
    r.read(2)                            # neighCellConfig BIT(2)
    if has[0]:
        r.read(_Q_OFFSET_BITS)           # offsetFreq
    if has[1]:                           # cellsToRemoveList (1..32 of 1..32)
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
    if has[2]:                           # cellsToAddModList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)                    # cellIndex
            r.read(9)                    # physCellId
            r.read(_Q_OFFSET_BITS)       # cellIndividualOffset
    if has[3]:                           # blackCellsToRemoveList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
    if has[4]:                           # blackCellsToAddModList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
            has_range = r.read(1)        # physCellIdRange preamble
            r.read(9)                    # start
            if has_range:
                r.read(4)                # range (16 values)
    if has[5]:
        r.read(5)                        # cellForWhichToReportCGI (1..32)


def _skip_meas_config(r: BitReader):
    """MeasConfig (rel-8), EUTRA subset: field-exact skip so the
    Reconfiguration fields AFTER it (dedicatedInfoNASList,
    radioResourceConfigDedicated) stay parseable.  Inter-RAT objects bail."""
    if r.read(1):
        raise _Bail()
    has = [r.read(1) for _ in range(11)]
    if has[0]:                           # measObjectToRemoveList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
    if has[1]:                           # measObjectToAddModList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)                    # measObjectId
            if r.read(1):                # measObject CHOICE extension
                raise _Bail()
            which = r.read(2)
            if which != 0:               # only measObjectEUTRA modeled
                raise _Bail()
            _skip_meas_object_eutra(r)
    if has[2]:                           # reportConfigToRemoveList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
    if has[3]:                           # reportConfigToAddModList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)                    # reportConfigId
            if r.read(1) != 0:           # CHOICE: only reportConfigEUTRA
                raise _Bail()
            _skip_report_config_eutra(r)
    if has[4]:                           # measIdToRemoveList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
    if has[5]:                           # measIdToAddModList
        n = r.read(5) + 1
        for _ in range(n):
            r.read(5)
            r.read(5)
            r.read(5)
    if has[6]:                           # quantityConfig
        if r.read(1):
            raise _Bail()
        q = [r.read(1) for _ in range(4)]
        if q[0]:                         # quantityConfigEUTRA
            fp = r.read(1)               # filterCoefficientRSRP DEFAULT
            fq = r.read(1)               # filterCoefficientRSRQ DEFAULT
            if fp:
                r.read(4)
            if fq:
                r.read(4)
        if q[1] or q[2] or q[3]:
            raise _Bail()                # inter-RAT quantity configs
    if has[7]:                           # measGapConfig
        if r.read(1):                    # setup
            if r.read(1):                # gapOffset CHOICE extension
                raise _Bail()
            if r.read(1) == 0:
                r.read(6)                # gp0 (0..39)
            else:
                r.read(7)                # gp1 (0..79)
    if has[8]:
        r.read(7)                        # s-Measure (0..97)
    if has[9]:
        raise _Bail()                    # preRegistrationInfoHRPD
    if has[10]:                          # speedStatePars
        if r.read(1):                    # setup
            r.read(3)                    # t-Evaluation
            r.read(3)                    # t-HystNormal
            r.read(4)                    # n-CellChangeMedium (1..16)
            r.read(4)                    # n-CellChangeHigh
            r.read(2)                    # timeToTrigger-SF sf-Medium
            r.read(2)                    # sf-High


def encode_dl_info_transfer(nas_pdu: bytes) -> bytes:
    w = BitWriter()
    w.write(0, 1)                       # c1
    w.write(1, 4)                       # dlInformationTransfer
    w.write(0, 2)                       # rrc-TransactionIdentifier
    w.write(0, 1)                       # criticalExtensions: c1
    w.write(0, 2)                       # c1: ...-r8
    w.write(0, 1)                       # nonCriticalExtension absent
    w.write(0, 2)                       # dedicatedInfoType: NAS
    w.write_octet_string(nas_pdu)
    return w.to_bytes()


def encode_reconfiguration(nas_pdus: List[bytes],
                           setup: Optional[RrcConnectionSetup] = None
                           ) -> bytes:
    """RRCConnectionReconfiguration-r8 with dedicatedInfoNASList (and
    optionally a radioResourceConfigDedicated carrying phys config)."""
    w = BitWriter()
    w.write(0, 1)                       # c1
    w.write(4, 4)                       # rrcConnectionReconfiguration
    w.write(0, 2)                       # rrc-TransactionIdentifier
    w.write(0, 1)                       # criticalExtensions: c1
    w.write(0, 3)                       # c1: ...-r8
    w.write(0, 1)                       # measConfig absent
    w.write(0, 1)                       # mobilityControlInfo absent
    w.write(1 if nas_pdus else 0, 1)    # dedicatedInfoNASList
    w.write(1 if setup is not None else 0, 1)  # radioResourceConfigDedicated
    w.write(0, 1)                       # securityConfigHO absent
    w.write(0, 1)                       # nonCriticalExtension absent
    if nas_pdus:
        w.write(len(nas_pdus) - 1, 4)   # SIZE (1..maxDRB=11)
        for p in nas_pdus:
            w.write_octet_string(p)
    if setup is not None:
        # reuse the ConnectionSetup encoder's RRCD body: skip its header
        # (1+2+2+1+3+1 = 10 bits) by re-emitting the RRCD fields
        w.write(0, 1)                   # RRCD extension bit
        w.write(0, 1)
        w.write(0, 1)
        w.write(0, 1)
        w.write(0, 1)
        w.write(0, 1)
        w.write(1, 1)                   # physicalConfigDedicated
        w.write(0, 1)                   # phys extension bit
        w.write(1, 1)                   # pdsch-ConfigDedicated
        w.write(0, 7)                   # other phys IEs absent
        w.write(0, 1)
        w.write(0, 1)
        w.write(_PA_VALUES.index(setup.p_a_db), 3)
    return w.to_bytes()


def decode_dl_dcch(data: bytes):
    """Returns one of
      ('dl_info_transfer', nas bytes)
      ('reconfiguration', Reconfiguration)
      ('security_mode_command', None)
      ('ue_capability_enquiry', None)
      ('release', None) / ('other', None) / None."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:
            return None
        name = _DL_DCCH_C1[r.read(4)]
        if name == "dlInformationTransfer":
            r.read(2)                   # rrc-TransactionIdentifier
            if r.read(1) != 0:
                return None
            if r.read(2) != 0:
                return None
            r.read(1)                   # nonCriticalExtension flag
            if r.read(2) != 0:
                return ("dl_info_transfer", None)
            return ("dl_info_transfer", r.read_octet_string())
        if name == "rrcConnectionReconfiguration":
            rec = Reconfiguration()
            rec.rrc_transaction_id = r.read(2)
            if r.read(1) != 0:
                return None
            if r.read(3) != 0:
                return None
            rec.has_meas_config = bool(r.read(1))
            rec.has_mobility_control = bool(r.read(1))
            has_nas = r.read(1)
            has_rrcd = r.read(1)
            r.read(1)                   # securityConfigHO flag
            r.read(1)                   # nonCriticalExtension flag
            if rec.has_meas_config:
                try:
                    _skip_meas_config(r)
                except _Bail:
                    rec.complete = False
                    return ("reconfiguration", rec)
            if rec.has_mobility_control:
                # handover mobilityControlInfo outside the subset
                rec.complete = False
                return ("reconfiguration", rec)
            if has_nas:
                n = r.read(4) + 1
                for _ in range(n):
                    rec.nas_pdus.append(r.read_octet_string())
            if has_rrcd:
                s = RrcConnectionSetup()
                try:
                    _parse_radio_resource_config_dedicated(r, s)
                except _Bail:
                    rec.complete = False
                rec.setup = s
            return ("reconfiguration", rec)
        if name == "securityModeCommand":
            return ("security_mode_command", None)
        if name == "ueCapabilityEnquiry":
            return ("ue_capability_enquiry", None)
        if name == "rrcConnectionRelease":
            return ("release", None)
        return ("other", None)
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# BCCH-DL-SCH: SIB1 + SystemInformation(SIB2)
# ---------------------------------------------------------------------------
def _skip_plmn_identity(r: BitReader) -> Tuple[Optional[str], str]:
    """PLMN-Identity ::= SEQ { mcc OPTIONAL, mnc (SIZE 2..3 of digit) }."""
    mcc = None
    if r.read(1):
        mcc = "".join(str(r.read(4)) for _ in range(3))
    n = r.read(1) + 2
    mnc = "".join(str(r.read(4)) for _ in range(n))
    return mcc, mnc


_SIB_TYPES = ("sibType3", "sibType4", "sibType5", "sibType6", "sibType7",
              "sibType8", "sibType9", "sibType10", "sibType11",
              "spare7", "spare6", "spare5", "spare4", "spare3", "spare2",
              "spare1")
_SI_PERIODICITY_RF = (8, 16, 32, 64, 128, 256, 512)
_SI_WINDOW_MS = (1, 2, 5, 10, 15, 20, 40)


@dataclasses.dataclass
class Sib1Info:
    mcc: Optional[str] = None
    mnc: str = ""
    tac: int = 0
    cell_identity: int = 0
    cell_barred: bool = False
    intra_freq_reselection: bool = True
    q_rx_lev_min: int = -70           # dBm*2 units decoded to dBm*2
    freq_band: int = 1
    # scheduling: list of (si_periodicity_rf, [mapped sib names]); entry 0
    # implicitly carries SIB2 (36.331 5.2.2.7)
    scheduling: List[Tuple[int, List[str]]] = dataclasses.field(
        default_factory=list)
    si_window_ms: int = 10
    system_info_value_tag: int = 0

    def si_message_for(self, sib: str) -> Optional[int]:
        """Index of the SI message carrying `sib` ('sibType3'...); SIB2 is
        always message 0."""
        if sib == "sibType2":
            return 0
        for i, (_p, sibs) in enumerate(self.scheduling):
            if sib in sibs:
                return i
        return None


def encode_sib1(info: Sib1Info) -> bytes:
    w = BitWriter()
    w.write(0, 1)                       # BCCH-DL-SCH c1
    w.write(1, 1)                       # systemInformationBlockType1
    w.write(0, 1)                       # p-Max absent
    w.write(0, 1)                       # tdd-Config absent
    w.write(0, 1)                       # nonCriticalExtension absent
    # cellAccessRelatedInfo
    w.write(0, 1)                       # csg-Identity absent
    w.write(0, 3)                       # plmn-IdentityList: 1 entry
    w.write(1, 1)                       # mcc present
    for c in (info.mcc or "001"):
        w.write(int(c), 4)
    w.write(len(info.mnc) - 2, 1)
    for c in info.mnc:
        w.write(int(c), 4)
    w.write(1, 1)                       # cellReservedForOperatorUse: notRes
    w.write(info.tac, 16)
    w.write(info.cell_identity, 28)
    w.write(1, 1)                       # cellBarred: notBarred
    w.write(0 if info.intra_freq_reselection else 1, 1)
    w.write(0, 1)                       # csg-Indication FALSE
    # cellSelectionInfo
    w.write(0, 1)                       # q-RxLevMinOffset absent
    w.write(info.q_rx_lev_min + 70, 6)
    w.write(info.freq_band - 1, 6)
    w.write(len(info.scheduling) - 1, 5)
    for per_rf, sibs in info.scheduling:
        w.write(_SI_PERIODICITY_RF.index(per_rf), 3)
        w.write(len(sibs), 5)
        for sib in sibs:
            w.write(0, 1)               # SIB-Type extension bit
            w.write(_SIB_TYPES.index(sib), 4)
    w.write(_SI_WINDOW_MS.index(info.si_window_ms), 3)
    w.write(info.system_info_value_tag, 5)
    return w.to_bytes()


def _decode_sib1(r: BitReader) -> Sib1Info:
    info = Sib1Info()
    has_pmax = r.read(1)
    has_tdd = r.read(1)
    r.read(1)                           # nonCriticalExtension flag
    has_csg_id = r.read(1)
    n_plmn = r.read(3) + 1
    for i in range(n_plmn):
        mcc, mnc = _skip_plmn_identity(r)
        r.read(1)                       # cellReservedForOperatorUse
        if i == 0:
            info.mcc, info.mnc = mcc, mnc
    info.tac = r.read(16)
    info.cell_identity = r.read(28)
    info.cell_barred = r.read(1) == 0   # ENUM {barred, notBarred}
    info.intra_freq_reselection = r.read(1) == 0
    r.read(1)                           # csg-Indication
    if has_csg_id:
        r.read(27)
    has_qoff = r.read(1)
    info.q_rx_lev_min = r.read(6) - 70
    if has_qoff:
        r.read(3)                       # q-RxLevMinOffset (1..8)
    if has_pmax:
        r.read(6)                       # p-Max (-30..33)
    info.freq_band = r.read(6) + 1
    n_si = r.read(5) + 1
    for _ in range(n_si):
        per = _SI_PERIODICITY_RF[r.read(3)]
        n_map = r.read(5)
        sibs = []
        for _ in range(n_map):
            if r.read(1):               # extension value
                r.read(6)
                sibs.append("ext")
            else:
                sibs.append(_SIB_TYPES[r.read(4)])
        info.scheduling.append((per, sibs))
    if has_tdd:
        r.read(3)                       # subframeAssignment
        r.read(4)                       # specialSubframePatterns
    info.si_window_ms = _SI_WINDOW_MS[r.read(3)]
    info.system_info_value_tag = r.read(5)
    return info


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
    enable_64qam: bool = True
    prach_root_seq_index: int = 0
    prach_config_index: int = 3
    prach_high_speed: bool = False
    prach_freq_offset: int = 4
    zero_correlation_zone: int = 1


def encode_sib2(cfg: Sib2UlConfig) -> bytes:
    """Real BCCH-DL-SCH SystemInformation carrying one SIB2 (rel-8
    grammar; unspecified mandatory fields take fixed sane defaults)."""
    w = BitWriter()
    w.write(0, 1)                       # BCCH-DL-SCH c1
    w.write(0, 1)                       # systemInformation
    w.write(0, 1)                       # criticalExtensions: -r8
    w.write(0, 1)                       # nonCriticalExtension absent
    w.write(0, 5)                       # sib-TypeAndInfo: 1 entry
    w.write(0, 1)                       # CHOICE extension bit
    w.write(0, 4)                       # sib2
    _write_sib2_body(w, cfg)
    return w.to_bytes()


def _write_sib3_body(w: BitWriter, with_extension: bool = False):
    """Minimal rel-8 SystemInformationBlockType3 (all OPTIONALs present
    so the skip parser's widest path is exercised)."""
    w.write(1 if with_extension else 0, 1)   # extension bit
    w.write(1, 1)                       # speedStateReselectionPars present
    w.write(4, 4)                       # q-Hyst dB4
    w.write(1, 3)                       # t-Evaluation s60
    w.write(1, 3)                       # t-HystNormal s60
    w.write(5, 4)                       # n-CellChangeMedium 6
    w.write(7, 4)                       # n-CellChangeHigh 8
    w.write(1, 2)                       # q-HystSF sf-Medium dB-4
    w.write(2, 2)                       # q-HystSF sf-High dB-2
    w.write(1, 1)                       # s-NonIntraSearch present
    w.write(9, 5)                       # s-NonIntraSearch
    w.write(4, 5)                       # threshServingLow
    w.write(5, 3)                       # cellReselectionPriority
    w.write(1, 1)                       # p-Max present
    w.write(1, 1)                       # s-IntraSearch present
    w.write(1, 1)                       # allowedMeasBandwidth present
    w.write(1, 1)                       # t-ReselectionEUTRA-SF present
    w.write(24, 6)                      # q-RxLevMin -46
    w.write(53, 6)                      # p-Max 23
    w.write(31, 5)                      # s-IntraSearch
    w.write(3, 3)                       # allowedMeasBandwidth mbw50
    w.write(1, 1)                       # presenceAntennaPort1
    w.write(1, 2)                       # neighCellConfig
    w.write(2, 3)                       # t-ReselectionEUTRA
    w.write(0, 2)                       # sf-Medium
    w.write(3, 2)                       # sf-High
    if with_extension:
        # one extension addition group, present, opaque 3-byte open type
        w.write(0, 1)                   # normally-small: short form
        w.write(0, 6)                   # m - 1 = 0 -> one addition bit
        w.write(1, 1)                   # present
        w.write(3, 8)                   # open-type length determinant
        w.write_bytes(b"\x5a\xa5\x3c")


def encode_si_sib3_sib2(cfg: Sib2UlConfig,
                        sib3_extension: bool = False) -> bytes:
    """SystemInformation listing SIB3 BEFORE SIB2 — the packing that
    round 4 could not recover a SIB2 from (`si_other` bail)."""
    w = BitWriter()
    w.write(0, 1)                       # BCCH-DL-SCH c1
    w.write(0, 1)                       # systemInformation
    w.write(0, 1)                       # criticalExtensions: -r8
    w.write(0, 1)                       # nonCriticalExtension absent
    w.write(1, 5)                       # sib-TypeAndInfo: 2 entries
    w.write(0, 1)                       # CHOICE extension bit
    w.write(1, 4)                       # sib3
    _write_sib3_body(w, sib3_extension)
    w.write(0, 1)                       # CHOICE extension bit
    w.write(0, 4)                       # sib2
    _write_sib2_body(w, cfg)
    return w.to_bytes()


def _write_sib2_body(w: BitWriter, cfg: Sib2UlConfig):
    # SystemInformationBlockType2 (extensible)
    w.write(0, 1)                       # extension bit
    w.write(0, 1)                       # ac-BarringInfo absent
    w.write(0, 1)                       # mbsfn-SubframeConfigList absent
    # radioResourceConfigCommon (RadioResourceConfigCommonSIB, extensible)
    w.write(0, 1)                       # extension bit
    # rach-ConfigCommon (extensible)
    w.write(0, 1)                       # extension bit
    w.write(0, 1)                       # preamblesGroupAConfig absent
    w.write(12, 4)                      # numberOfRA-Preambles: n52
    w.write(1, 2)                       # powerRampingStep dB2
    w.write(5, 4)                       # preambleInitialReceivedTargetPower
    w.write(5, 4)                       # preambleTransMax n8
    w.write(6, 3)                       # ra-ResponseWindowSize sf8
    w.write(5, 3)                       # mac-ContentionResolutionTimer sf48
    w.write(4, 3)                       # maxHARQ-Msg3Tx 5
    # bcch-Config / pcch-Config
    w.write(0, 2)                       # modificationPeriodCoeff n2
    w.write(1, 2)                       # defaultPagingCycle rf64
    w.write(3, 3)                       # nB: halfT
    # prach-Config
    w.write(cfg.prach_root_seq_index, 10)
    w.write(cfg.prach_config_index, 6)
    w.write(1 if cfg.prach_high_speed else 0, 1)
    w.write(cfg.zero_correlation_zone, 4)
    w.write(cfg.prach_freq_offset, 7)
    # pdsch-ConfigCommon
    w.write(60, 7)                      # referenceSignalPower 0 dBm
    w.write(0, 2)                       # p-b
    # pusch-ConfigCommon
    w.write(cfg.n_sb - 1, 2)
    w.write(0 if cfg.hopping_mode_intersubframe else 1, 1)
    w.write(cfg.pusch_hopping_offset, 7)
    w.write(1 if cfg.enable_64qam else 0, 1)
    w.write(1 if cfg.group_hopping else 0, 1)
    w.write(cfg.delta_ss, 5)
    w.write(1 if cfg.seq_hopping else 0, 1)
    w.write(cfg.cyclic_shift, 3)
    # pucch-ConfigCommon
    w.write(1, 2)                       # deltaPUCCH-Shift ds2
    w.write(2, 7)                       # nRB-CQI
    w.write(0, 3)                       # nCS-AN
    w.write(36, 11)                     # n1PUCCH-AN
    # soundingRS-UL-ConfigCommon: release
    w.write(0, 1)
    # uplinkPowerControlCommon
    w.write(41, 8)                      # p0-NominalPUSCH -85 dBm (-126..24)
    w.write(7, 3)                       # alpha al1
    w.write(22, 5)                      # p0-NominalPUCCH -105
    w.write(1, 2)                       # deltaF-PUCCH-Format1 deltaF0
    w.write(1, 2)                       # Format1b deltaF3? (index 1)
    w.write(1, 2)                       # Format2
    w.write(1, 2)                       # Format2a
    w.write(1, 2)                       # Format2b
    w.write(5, 3)                       # deltaPreambleMsg3 = 4
    w.write(0, 1)                       # ul-CyclicPrefixLength len1
    # ue-TimersAndConstants (extensible)
    w.write(0, 1)                       # extension bit
    w.write(5, 3)                       # t300 ms1000
    w.write(5, 3)                       # t301 ms1000
    w.write(5, 3)                       # t310 ms1000
    w.write(3, 3)                       # n310 n4
    w.write(2, 3)                       # t311 ms5000
    w.write(3, 3)                       # n311 n5
    # freqInfo
    w.write(0, 1)                       # ul-CarrierFreq absent
    w.write(0, 1)                       # ul-Bandwidth absent
    w.write(0, 5)                       # additionalSpectrumEmission 1
    w.write(0, 3)                       # timeAlignmentTimerCommon sf500


def _parse_rach_config_common(r: BitReader):
    if r.read(1):
        raise _Bail()
    has_group_a = r.read(1)
    r.read(4)                           # numberOfRA-Preambles
    if has_group_a:
        if r.read(1):
            raise _Bail()               # preamblesGroupAConfig extension
        r.read(4)                       # sizeOfRA-PreamblesGroupA
        r.read(2)                       # messageSizeGroupA
        r.read(3)                       # messagePowerOffsetGroupB
    r.read(2)                           # powerRampingStep
    r.read(4)                           # preambleInitialReceivedTargetPower
    r.read(4)                           # preambleTransMax (11 values)
    r.read(3)                           # ra-ResponseWindowSize
    r.read(3)                           # mac-ContentionResolutionTimer
    r.read(3)                           # maxHARQ-Msg3Tx (1..8)


def _decode_sib2_body(r: BitReader) -> Sib2UlConfig:
    cfg = Sib2UlConfig()
    if r.read(1):                       # SIB2 extension bit
        pass                            # extension additions follow the
                                        # root fields; root parse still valid
    has_ac = r.read(1)
    has_mbsfn = r.read(1)
    if has_ac:
        has_mo_sig = r.read(1)
        has_mo_data = r.read(1)
        r.read(1)                       # ac-BarringForEmergency
        for present in (has_mo_sig, has_mo_data):
            if present:
                r.read(4)               # ac-BarringFactor (16 values)
                r.read(3)               # ac-BarringTime (8 values)
                r.read(5)               # ac-BarringForSpecialAC BIT(5)
    # radioResourceConfigCommon
    if r.read(1):
        raise _Bail()
    _parse_rach_config_common(r)
    r.read(2)                           # bcch modificationPeriodCoeff
    r.read(2)                           # pcch defaultPagingCycle
    r.read(3)                           # pcch nB
    cfg.prach_root_seq_index = r.read(10)
    cfg.prach_config_index = r.read(6)
    cfg.prach_high_speed = bool(r.read(1))
    cfg.zero_correlation_zone = r.read(4)
    cfg.prach_freq_offset = r.read(7)
    r.read(7)                           # pdsch referenceSignalPower
    r.read(2)                           # pdsch p-b
    cfg.n_sb = r.read(2) + 1
    cfg.hopping_mode_intersubframe = r.read(1) == 0
    cfg.pusch_hopping_offset = r.read(7)
    cfg.enable_64qam = bool(r.read(1))
    cfg.group_hopping = bool(r.read(1))
    cfg.delta_ss = r.read(5)
    cfg.seq_hopping = bool(r.read(1))
    cfg.cyclic_shift = r.read(3)
    return cfg


def _skip_seq_extensions(r: BitReader):
    """Skip a SEQUENCE's extension additions (X.691 18.7-18.9): a
    normally-small bitmap length, the presence bitmap, then one
    length-delimited open type per present addition — exact regardless of
    the additions' inner grammar."""
    m = r.read_normally_small() + 1
    present = [r.read(1) for _ in range(m)]
    for p in present:
        if p:
            r.skip_open_type()


def _skip_sib3_body(r: BitReader):
    """Field-exact skip of SystemInformationBlockType3 (36.331 rel-8
    §6.3.1) so a SystemInformation message that lists SIB3 BEFORE SIB2
    (legal packing the reference handles via full asn1,
    `DL_Sniffer_PDSCH.cc:459-570`) still yields the SIB2 UL config."""
    ext = r.read(1)                      # SIB3 extension bit
    # cellReselectionInfoCommon
    has_speed = r.read(1)                # speedStateReselectionPars
    r.read(4)                            # q-Hyst (16 values)
    if has_speed:
        r.read(3)                        # t-Evaluation
        r.read(3)                        # t-HystNormal
        r.read(4)                        # n-CellChangeMedium (1..16)
        r.read(4)                        # n-CellChangeHigh (1..16)
        r.read(2)                        # q-HystSF sf-Medium
        r.read(2)                        # q-HystSF sf-High
    # cellReselectionServingFreqInfo
    has_nonintra = r.read(1)             # s-NonIntraSearch
    if has_nonintra:
        r.read(5)
    r.read(5)                            # threshServingLow
    r.read(3)                            # cellReselectionPriority
    # intraFreqCellReselectionInfo
    has_pmax = r.read(1)
    has_sintra = r.read(1)
    has_ambw = r.read(1)
    has_sf = r.read(1)                   # t-ReselectionEUTRA-SF
    r.read(6)                            # q-RxLevMin (-70..-22)
    if has_pmax:
        r.read(6)                        # p-Max (-30..33)
    if has_sintra:
        r.read(5)                        # s-IntraSearch
    if has_ambw:
        r.read(3)                        # allowedMeasBandwidth (6 values)
    r.read(1)                            # presenceAntennaPort1
    r.read(2)                            # neighCellConfig
    r.read(3)                            # t-ReselectionEUTRA
    if has_sf:
        r.read(2)                        # sf-Medium
        r.read(2)                        # sf-High
    if ext:
        _skip_seq_extensions(r)          # lateNonCriticalExtension etc.


def decode_bcch(data: bytes):
    """Returns ('sib1', Sib1Info) or ('sib2', Sib2UlConfig) (first SIB2 in
    a SystemInformation message) or ('si_other', None) or None."""
    try:
        r = BitReader(data)
        if r.read(1) != 0:              # messageClassExtension
            return None
        if r.read(1) == 1:              # systemInformationBlockType1
            return ("sib1", _decode_sib1(r))
        if r.read(1) != 0:              # criticalExtensionsFuture
            return None
        r.read(1)                       # nonCriticalExtension flag
        n = r.read(5) + 1               # sib-TypeAndInfo count
        for _ in range(n):
            if r.read(1):               # CHOICE extension: skip open type
                r.skip_open_type()
                continue
            which = r.read(4)           # sib2..sib11
            if which == 0:
                try:
                    return ("sib2", _decode_sib2_body(r))
                except _Bail:
                    return ("si_other", None)
            if which == 1:              # sib3: field-exact skip, keep
                try:                    # scanning for a later SIB2
                    _skip_sib3_body(r)
                    continue
                except (IndexError, ValueError):
                    return ("si_other", None)
            # other SIBs: grammar not modeled; without their length we
            # cannot continue past them
            return ("si_other", None)
        return ("si_other", None)
    except (IndexError, ValueError):
        return None
