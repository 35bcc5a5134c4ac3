"""Security API: plaintext identity extraction + RNTI mapping table.

Re-design of the reference's api mode (`README.md:120-160`,
`DL_Sniffer_PDSCH.cc:804-879` paging/ConRes/Reconfig hooks,
`UL_Sniffer_PUSCH.cc:96-247` ConnectionRequest/NAS hooks): consumes decoded
MAC SDUs from both directions and maintains the identity table
(TMSI/IMSI/IMEI per RNTI, contention resolution, UECapability sightings),
optionally mirroring source PDUs into an api pcap.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

from ltesniffer_tpu.io import pcap as pcap_mod
from ltesniffer_tpu.mac_rrc import mac as mac_mod, nas as nas_mod, rrc as rrc_mod


@dataclasses.dataclass
class IdentityRecord:
    rnti: int
    tmsi: Optional[int] = None
    imsi: Optional[str] = None
    imei: Optional[str] = None
    guti: Optional[dict] = None
    con_res_id: Optional[bytes] = None
    cause: Optional[str] = None
    has_ue_capability: bool = False
    first_seen: float = 0.0
    events: List[str] = dataclasses.field(default_factory=list)


class SecurityApi:
    def __init__(self, api_pcap_path: Optional[str] = None):
        self.records: Dict[int, IdentityRecord] = {}
        self.paging_identities: List[dict] = []
        self.pcap = (pcap_mod.MacLtePcapWriter(api_pcap_path)
                     if api_pcap_path else None)

    def _rec(self, rnti: int) -> IdentityRecord:
        if rnti not in self.records:
            self.records[rnti] = IdentityRecord(rnti=rnti,
                                                first_seen=time.time())
        return self.records[rnti]

    # ------------------------------------------------------------------
    def on_paging(self, payload: bytes, sfn: int, sf: int):
        """P-RNTI PDSCH payload -> paging identities
        (`decode_imsi_tmsi_paging`, `DL_Sniffer_PDSCH.cc:84-128`)."""
        recs = rrc_mod.decode_paging(payload)
        if not recs:
            return
        for r in recs:
            self.paging_identities.append(dict(
                sfn=sfn, sf=sf,
                s_tmsi=r.s_tmsi, imsi=r.imsi, cn_domain=r.cn_domain))
        self._mirror(payload, 0xFFFE, sfn, sf, pcap_mod.DIRECTION_DOWNLINK)

    def on_dl_ccch(self, rnti: int, sdu: bytes, sfn: int, sf: int):
        out = rrc_mod.decode_dl_ccch(sdu)
        if out and out[0] == "connection_setup":
            rec = self._rec(rnti)
            rec.events.append("rrc_connection_setup")
            self._mirror(sdu, rnti, sfn, sf, pcap_mod.DIRECTION_DOWNLINK)
            return out[1]
        return None

    def on_con_res(self, rnti: int, con_res: bytes, sfn: int, sf: int):
        """MAC Contention Resolution CE: 48 bits echoing the UL CCCH SDU —
        ties the T-CRNTI to the ConnectionRequest identity."""
        rec = self._rec(rnti)
        rec.con_res_id = con_res
        out = rrc_mod.decode_ul_ccch(con_res)
        if out and out[0] == "connection_request" and out[1]:
            req = out[1]
            if req.s_tmsi is not None:
                rec.tmsi = req.s_tmsi & 0xFFFFFFFF
            rec.cause = req.cause
            rec.events.append("con_res_matched")

    def on_ul_ccch(self, rnti: int, sdu: bytes, sfn: int, sf: int):
        out = rrc_mod.decode_ul_ccch(sdu)
        if out and out[0] == "connection_request" and out[1]:
            req = out[1]
            rec = self._rec(rnti)
            if req.s_tmsi is not None:
                rec.tmsi = req.s_tmsi & 0xFFFFFFFF
            rec.cause = req.cause
            rec.events.append("rrc_connection_request")
            self._mirror(sdu, rnti, sfn, sf, pcap_mod.DIRECTION_UPLINK)

    def on_ul_dcch(self, rnti: int, sdu: bytes, sfn: int, sf: int):
        out = rrc_mod.decode_ul_dcch(sdu)
        if not out:
            return
        kind, nas_pdu = out
        if kind == "ue_capability_information":
            # `UL_Sniffer_PUSCH.cc:96-247` records UECapability sightings
            rec = self._rec(rnti)
            rec.has_ue_capability = True
            rec.events.append("ue_capability_information")
            self._mirror(sdu, rnti, sfn, sf, pcap_mod.DIRECTION_UPLINK)
            return
        if nas_pdu is None:
            return
        if self._absorb_nas(rnti, nas_pdu):
            self._mirror(sdu, rnti, sfn, sf, pcap_mod.DIRECTION_UPLINK)

    def on_dl_dcch(self, rnti: int, sdu: bytes, sfn: int, sf: int):
        """DL DCCH SDU: DLInformationTransfer NAS, Reconfiguration-carried
        NAS (TMSI via Attach Accept GUTI — `DL_Sniffer_PDSCH.cc:804-879`),
        SecurityModeCommand / UECapabilityEnquiry sightings."""
        out = rrc_mod.decode_dl_dcch(sdu)
        if not out:
            return
        kind, val = out
        got = False
        if kind == "dl_info_transfer" and isinstance(val, bytes):
            got = self._absorb_nas(rnti, val)
        elif kind == "reconfiguration" and val is not None:
            rec = self._rec(rnti)
            rec.events.append("rrc_reconfiguration")
            for pdu in val.nas_pdus:
                got = self._absorb_nas(rnti, pdu) or got
        elif kind in ("security_mode_command", "ue_capability_enquiry"):
            self._rec(rnti).events.append(kind)
        if got:
            self._mirror(sdu, rnti, sfn, sf, pcap_mod.DIRECTION_DOWNLINK)

    def _absorb_nas(self, rnti: int, nas_pdu: bytes) -> bool:
        """Record any identity carried by a NAS PDU; True if one was."""
        info = nas_mod.parse_nas(nas_pdu)
        if info is None or info.identity is None:
            return False
        rec = self._rec(rnti)
        mi = info.identity
        if mi.kind == nas_mod.ID_TYPE_IMSI:
            rec.imsi = mi.digits
        elif mi.kind in (nas_mod.ID_TYPE_IMEI, nas_mod.ID_TYPE_IMEISV):
            rec.imei = mi.digits
        elif mi.kind == nas_mod.ID_TYPE_GUTI:
            rec.guti = mi.guti
            rec.tmsi = mi.guti["m_tmsi"]
        rec.events.append(f"{info.msg_name}:{mi.kind_name}")
        return True

    # ------------------------------------------------------------------
    def _mirror(self, payload: bytes, rnti: int, sfn: int, sf: int,
                direction: int):
        if self.pcap:
            self.pcap.write_pdu(payload, rnti=rnti, direction=direction,
                                sfn=sfn, sf_idx=sf)

    def table(self) -> List[dict]:
        """Identity table rows — every recorded column surfaced,
        including UECapability sightings and the Attach-Accept GUTI
        (the reference prints UECapability rows in its api table,
        `UL_Sniffer_PUSCH.cc:874-892`)."""
        out = []
        for rnti, r in sorted(self.records.items()):
            guti = None
            if r.guti is not None:
                g = r.guti
                guti = (f"{g.get('plmn', '?')}-"
                        f"{g.get('mme_group', 0):04x}-"
                        f"{g.get('mme_code', 0):02x}-"
                        f"{g.get('m_tmsi', 0):08x}")
            out.append(dict(
                rnti=hex(rnti), tmsi=hex(r.tmsi) if r.tmsi else None,
                imsi=r.imsi, imei=r.imei, cause=r.cause,
                guti=guti, ue_capability=r.has_ue_capability,
                events=list(r.events)))
        return out

    def close(self):
        if self.pcap:
            self.pcap.close()
