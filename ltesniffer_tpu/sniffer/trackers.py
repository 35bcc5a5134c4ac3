"""Cross-subframe state trackers (host-side): MCS tracking, HARQ, UL schedule.

Functional re-design of the reference's mutex-guarded L5 singletons
(SURVEY.md §2.0):

* MCSTracking (`src/src/MCSTracking.cc`): per-RNTI auto-detection of the DL
  (64QAM vs 256QAM) and UL (16/64/256QAM) MCS tables, UE-specific config
  learned from RRC, per-RNTI statistics, 5 s inactivity expiry.
* HARQ (`src/src/HARQ.cc`): per-(rnti, pid, tb) new-TX/re-TX classification
  by NDI toggle + TTI distance, last-TBS lookup for mcs 29-31 re-TX, and the
  soft-buffer keying used by `pdsch_rx.decode_grant`.
* ULSchedule (`src/src/ULSchedule.cc`): DCI0 grants issued at TTI t apply at
  t+4; RAR grants at t+6.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple


class McsTable(enum.Enum):
    UNKNOWN = 0
    QAM64 = 1
    QAM256 = 2
    # UL variants
    UL_16QAM = 3
    UL_64QAM = 4
    UL_256QAM = 5


TTI_MAX = 10240


def tti_of(sfn: int, sf_idx: int) -> int:
    return (sfn * 10 + sf_idx) % TTI_MAX


def tti_delta(a: int, b: int) -> int:
    """Forward distance from b to a in TTIs (modular)."""
    return (a - b) % TTI_MAX


@dataclasses.dataclass
class RntiStats:
    new_tx: int = 0
    retx: int = 0
    success: int = 0
    fail: int = 0
    wrong_mimo: int = 0
    last_seen_tti: int = 0


@dataclasses.dataclass
class UeConfig:
    """UE-specific config learned from RRCConnectionSetup
    (`MCSTracking.cc:1446-1529`)."""
    p_a: float = 0.0
    uci_offset_ack: int = 10
    uci_offset_ri: int = 12
    uci_offset_cqi: int = 15
    cqi_mode: int = -1
    tm: int = 1            # transmission mode (antennaInfo); RI for TM3/4
    has_config: bool = False


class MCSTracking:
    INACTIVITY_MS = 5000   # `MCSTracking.cc` 5 s expiry
    # full-cascade failures tolerated for an unknown-table RNTI before its
    # trials drop to the default 16QAM table only (the reference tracks
    # per-RNTI attempts and stops burning trial decodes on RNTIs that never
    # decode, `MCSTracking.cc:758-827` per-RNTI DB timestamps/attempts)
    UL_TRIAL_LIMIT = 8
    # wrong-MIMO evictions: RNTIs whose grants only ever produce
    # inconsistent MIMO configs get pruned (`MCSTracking.cc:98-110`)
    WRONG_MIMO_LIMIT = 8

    def __init__(self):
        self.dl_table: Dict[int, McsTable] = {}
        self.ul_table: Dict[int, McsTable] = {}
        self.ue_config: Dict[int, UeConfig] = {}
        self.stats_dl: Dict[int, RntiStats] = {}
        self.stats_ul: Dict[int, RntiStats] = {}
        self.ul_trials: Dict[int, int] = {}

    def ul_trial_budget_ok(self, rnti: int) -> bool:
        return self.ul_trials.get(rnti, 0) < self.UL_TRIAL_LIMIT

    def note_ul_trial_fail(self, rnti: int):
        self.ul_trials[rnti] = self.ul_trials.get(rnti, 0) + 1

    def note_wrong_mimo(self, rnti: int) -> bool:
        """Record an inconsistent MIMO config; True -> evict the RNTI
        (only-wrong-MIMO RNTIs, `MCSTracking.cc:98-110`)."""
        st = self.stat_dl(rnti)
        st.wrong_mimo += 1
        if st.success == 0 and st.wrong_mimo >= self.WRONG_MIMO_LIMIT:
            self.stats_dl.pop(rnti, None)
            self.dl_table.pop(rnti, None)
            self.ue_config.pop(rnti, None)
            return True
        return False

    def dl_table_of(self, rnti: int) -> McsTable:
        return self.dl_table.get(rnti, McsTable.UNKNOWN)

    def ul_table_of(self, rnti: int) -> McsTable:
        return self.ul_table.get(rnti, McsTable.UNKNOWN)

    def learn_dl_table(self, rnti: int, table: "McsTable"):
        self.dl_table[rnti] = table

    def learn_ul_table(self, rnti: int, table: "McsTable"):
        self.ul_table[rnti] = table
        self.ul_trials.pop(rnti, None)

    def set_ue_config(self, rnti: int, cfg: UeConfig):
        cfg.has_config = True
        self.ue_config[rnti] = cfg

    def stat_dl(self, rnti: int) -> RntiStats:
        return self.stats_dl.setdefault(rnti, RntiStats())

    def stat_ul(self, rnti: int) -> RntiStats:
        return self.stats_ul.setdefault(rnti, RntiStats())

    def update_database(self, now_tti: int):
        """Expire RNTIs idle for > 5 s (`MCSTracking.cc:87-110`)."""
        for d, st in ((self.dl_table, self.stats_dl),
                      (self.ul_table, self.stats_ul)):
            dead = [r for r, s in st.items()
                    if tti_delta(now_tti, s.last_seen_tti) > self.INACTIVITY_MS]
            for r in dead:
                st.pop(r, None)
                d.pop(r, None)
                self.ue_config.pop(r, None)
                self.ul_trials.pop(r, None)

    def table_summary(self):
        return {
            "dl": {hex(r): t.name for r, t in self.dl_table.items()},
            "ul": {hex(r): t.name for r, t in self.ul_table.items()},
        }


# McsTable forward alias used in annotations above
McsTable = McsTable


@dataclasses.dataclass
class HarqProcState:
    ndi: int = -1
    tbs: int = 0
    last_tti: int = 0
    active: bool = False
    decoded: bool = False


@dataclasses.dataclass
class HarqDecision:
    is_retx: bool
    tbs: int
    decoded: bool = False   # re-TX of a TB that already passed CRC -> skip


class HarqEntity:
    """DL HARQ classification DB (reference: 150 RNTIs x 8 proc x 2 TB,
    `HARQ.cc:71-130`).

    Classification per the reference's `is_retransmission`:
    * unseen process -> new TX (`HARQ.cc:112` `is_first_transmission`);
    * TTI distance from the last grant != 8 ms -> new TX (`comparetti`,
      `HARQ.cc:60-68`: the FDD HARQ process recurrence is exactly 8 ms);
    * NDI toggled or TBS changed -> new TX (`HARQ.cc:110-113`);
    * otherwise re-TX; if the stored TB already passed CRC the decision is
      DECODED and the caller skips the decode (`HARQ.cc:121-127`).
    """

    RECURRENCE = 8      # ms; `HARQ.cc:60-68`
    MAX_RNTIS = 150     # `HARQ.h:45-46` 150-entry DB (FULL_BUFFER beyond)
    INACTIVITY_MS = 5000

    def __init__(self):
        self.db: Dict[Tuple[int, int, int], HarqProcState] = {}
        self._rntis: Dict[int, int] = {}   # rnti -> last_tti

    def classify(self, rnti: int, pid: int, tb: int, ndi: int, tbs: int,
                 tti: int) -> HarqDecision:
        """Returns the HARQ decision and the TBS to use.  For re-TX with
        unknown TBS (mcs 29-31 -> tbs<=0) the stored TBS is returned
        (`getlastTbs`, `HARQ.h:107-132`)."""
        if rnti not in self._rntis and len(self._rntis) >= self.MAX_RNTIS:
            # DL_SNIFFER_HARQ_FULL_BUFFER: decode as new TX, no tracking
            return HarqDecision(False, tbs)
        self._rntis[rnti] = tti
        key = (rnti, pid, tb)
        st = self.db.setdefault(key, HarqProcState())
        dist = tti_delta(tti, st.last_tti)
        is_new = (not st.active
                  or dist != self.RECURRENCE
                  or st.ndi != ndi
                  or (tbs > 0 and st.tbs > 0 and tbs != st.tbs))
        if is_new:
            st.ndi, st.tbs, st.last_tti = ndi, tbs, tti
            st.active, st.decoded = True, False
            return HarqDecision(False, tbs)
        # same NDI, 8 ms recurrence -> retransmission
        use_tbs = tbs if tbs > 0 else st.tbs
        st.last_tti = tti
        if tbs > 0:
            st.tbs = tbs
        return HarqDecision(True, use_tbs, decoded=st.decoded)

    def report_crc(self, rnti: int, pid: int, tb: int, crc_ok: bool):
        """Record the decode outcome (`last_decoded`,
        `DL_Sniffer_PDSCH.cc:1009`): a later re-TX of a decoded TB is
        skipped instead of re-decoded."""
        st = self.db.get((rnti, pid, tb))
        if st is not None and st.active:
            st.decoded = bool(crc_ok)

    def prune(self, now_tti: int):
        """Free DB slots of RNTIs idle > 5 s (`updateHARQDatabase`)."""
        dead = [r for r, t in self._rntis.items()
                if tti_delta(now_tti, t) > self.INACTIVITY_MS]
        for r in dead:
            del self._rntis[r]
        if dead:
            dead_set = set(dead)
            for key in [k for k in self.db if k[0] in dead_set]:
                del self.db[key]

    def buffer_key(self, rnti: int, pid: int, tb: int) -> Tuple:
        return (rnti, pid, tb)


class SoftBufferPool(dict):
    """Bounded pool of HARQ soft-combining buffers keyed ((rnti,pid,tb), ci).

    The reference pre-allocates 150x8x2 softbuffers (`HARQ::init_HARQ`);
    here device LLR arrays are pooled with insertion-order eviction once
    `max_buffers` is exceeded (`SnifferConfig.max_harq_retx_buffers`)."""

    def __init__(self, max_buffers: int = 4096):
        super().__init__()
        self.max_buffers = max_buffers
        self._by_harq: Dict = {}   # harq_key -> set of pool keys

    def __setitem__(self, key, value):
        if key in self:
            super().pop(key)   # re-insert at the back (LRU-by-insertion)
        super().__setitem__(key, value)
        self._by_harq.setdefault(key[0], set()).add(key)
        while len(self) > self.max_buffers:
            self._drop(next(iter(self)))

    def _drop(self, key):
        super().pop(key, None)
        s = self._by_harq.get(key[0])
        if s is not None:
            s.discard(key)
            if not s:
                del self._by_harq[key[0]]

    def pop(self, key, *default):
        had = key in self
        if had:
            val = self[key]
            self._drop(key)
            return val
        if default:
            return default[0]
        raise KeyError(key)

    def clear_harq(self, harq_key):
        """Drop every code-block buffer of one HARQ process (new TX resets
        the soft buffer, `srsran_softbuffer_rx_reset_tbs` analog)."""
        for k in list(self._by_harq.get(harq_key, ())):
            self._drop(k)


class UlGrantHistory:
    """Per-RNTI initial-grant memory for UCI Q' sizing.

    36.212 5.2.2.6 computes Q' from the TB's INITIAL PUSCH allocation
    (M_sc^initial, K_r^initial); an adaptive retransmission (same NDI,
    different allocation) keeps the initial dimensions.  The reference gets
    this via srsRAN's UL softbuffer/grant state; here the (ndi, n_prb, mcs)
    of the last new transmission per RNTI is remembered."""

    def __init__(self):
        self.last: Dict[int, Tuple[int, int, int]] = {}

    def initial_dims(self, rnti: int, ndi: int, n_prb: int,
                     mcs: int) -> Tuple[int, int]:
        prev = self.last.get(rnti)
        if prev is not None and prev[0] == ndi:
            return prev[1], prev[2]      # retransmission: initial dims
        self.last[rnti] = (ndi, n_prb, mcs)
        return n_prb, mcs

    def prune(self, keep_rntis):
        for r in [r for r in self.last if r not in keep_rntis]:
            del self.last[r]


@dataclasses.dataclass
class UlGrantPending:
    rnti: int
    tti_apply: int
    mcs: int
    prb_start: int
    n_prb: int
    ndi: int
    hopping: int = 0
    dmrs_cs: int = 0
    cqi_request: int = 0
    from_rar: bool = False
    rapid: int = -1
    # HARQ-ACKs multiplexed on this PUSCH: count of TBs the same RNTI was
    # assigned in the DCI0's subframe (`SubframeWorker.cc:319-337`)
    nof_ack: int = 0


class ULSchedule:
    """TTI-indexed pending UL grant DB (`ULSchedule.cc:11-138`)."""

    DCI0_DELAY = 4   # `get_ul_tti`, `ULSchedule.cc:112`
    RAR_DELAY = 6    # `ULSchedule.cc:126`

    def __init__(self):
        self.pending: Dict[int, List[UlGrantPending]] = {}
        self.sib2: Optional[dict] = None

    def push_dci0(self, tti_now: int, g: UlGrantPending):
        g.tti_apply = (tti_now + self.DCI0_DELAY) % TTI_MAX
        self.pending.setdefault(g.tti_apply, []).append(g)

    def push_rar(self, tti_now: int, g: UlGrantPending):
        g.from_rar = True
        g.tti_apply = (tti_now + self.RAR_DELAY) % TTI_MAX
        self.pending.setdefault(g.tti_apply, []).append(g)

    def pop(self, tti: int) -> List[UlGrantPending]:
        return self.pending.pop(tti % TTI_MAX, [])

    def set_sib2(self, cfg: dict):
        self.sib2 = cfg
