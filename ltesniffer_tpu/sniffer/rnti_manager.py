"""RNTI validation state (host-side, NumPy) — FALCON RNTIManager semantics.

Behavioral parity with `lib/src/util/RNTIManager.cc` (see SURVEY.md §2.0b):
per-format ring-buffer histograms over a 200 ms window (depth = 200 * 60
entries, threshold 5), evergreen/forbidden RNTI ranges, an active set with
10 s RRC-inactivity lifetime and activation reasons, per-subframe time
stepping that pads unused candidate slots with the illegal RNTI 0.

Vectorized: histograms are flat uint32 arrays of size 65536 with a packed
circular history; all operations are O(1) per candidate.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple

import numpy as np

RNTI_VALUE_RANGE = 65536
RNTI_PER_SUBFRAME = 304 // 5            # 60, `RNTIManager.h:48`
RNTI_HISTORY_DEPTH = 200 * RNTI_PER_SUBFRAME
RRC_INACTIVITY_TIMER_MS = 10000
ILLEGAL_RNTI = 0
FORMAT_INDEX_UPLINK = 0
ASSOC_FORMAT_UNCERTAIN = 0
NOF_FORMATS = 9                          # 0,1,1A,1B,1C,1D,2,2A,2B


class ActivationReason(enum.Enum):
    UNSET = 0
    EVERGREEN = 1
    RAR = 2
    SHORTCUT = 3
    HISTOGRAM = 4
    OTHER = 5


class _Histogram:
    """Fixed-depth ring-buffer histogram (`lib/src/util/Histogram.cc`)."""

    def __init__(self, depth: int = RNTI_HISTORY_DEPTH):
        self.depth = depth
        self.history = np.zeros(depth, dtype=np.uint16)
        self.counts = np.zeros(RNTI_VALUE_RANGE, dtype=np.int64)
        self.pos = 0
        self.ready = False

    def add(self, rnti: int, n: int = 1):
        for _ in range(n):
            if self.ready:
                self.counts[self.history[self.pos]] -= 1
            self.history[self.pos] = rnti
            self.counts[rnti] += 1
            self.pos += 1
            if self.pos == self.depth:
                self.ready = True
                self.pos = 0

    def frequency(self, rnti: int) -> int:
        return int(self.counts[rnti])


class RNTIManager:
    def __init__(self, nformats: int = NOF_FORMATS,
                 max_candidates_per_step: int = RNTI_PER_SUBFRAME,
                 threshold: int = 5,
                 lifetime_ms: int = RRC_INACTIVITY_TIMER_MS):
        self.nformats = nformats
        self.hist = [_Histogram() for _ in range(nformats)]
        self.evergreen: List[List[Tuple[int, int]]] = [[] for _ in range(nformats)]
        self.forbidden: List[List[Tuple[int, int]]] = [[] for _ in range(nformats)]
        self.active = np.zeros(RNTI_VALUE_RANGE, dtype=bool)
        self.reason: Dict[int, ActivationReason] = {}
        self.last_seen = np.zeros(RNTI_VALUE_RANGE, dtype=np.int64)
        self.assoc_format = np.zeros(RNTI_VALUE_RANGE, dtype=np.int64)
        self.timestamp = 0
        self.lifetime = lifetime_ms
        self.threshold = threshold
        self.max_candidates = max_candidates_per_step
        self.remaining = [max_candidates_per_step] * nformats

    # --- configuration ---------------------------------------------------
    def add_evergreen(self, lo: int, hi: int, fmt_idx: int):
        self.evergreen[fmt_idx].append((lo, hi))

    def add_forbidden(self, lo: int, hi: int, fmt_idx: int):
        self.forbidden[fmt_idx].append((lo, hi))

    def is_evergreen(self, rnti: int, fmt_idx: int) -> bool:
        return any(lo <= rnti <= hi for lo, hi in self.evergreen[fmt_idx])

    def is_forbidden(self, rnti: int, fmt_idx: int) -> bool:
        return any(lo <= rnti <= hi for lo, hi in self.forbidden[fmt_idx])

    # --- candidate bookkeeping -------------------------------------------
    def add_candidate(self, rnti: int, fmt_idx: int):
        self.hist[fmt_idx].add(rnti)
        self.remaining[fmt_idx] -= 1

    def get_frequency(self, rnti: int, fmt_idx: int) -> int:
        return self.hist[fmt_idx].frequency(rnti)

    # --- validation (`RNTIManager.cc:167-205`) ---------------------------
    def validate(self, rnti: int, fmt_idx: int) -> bool:
        if self.is_evergreen(rnti, fmt_idx):
            return True
        if self.is_forbidden(rnti, fmt_idx):
            return False
        if self.active[rnti]:
            if self.timestamp - self.last_seen[rnti] < self.lifetime:
                return True
            self._deactivate(rnti)
        return self._validate_by_histogram(rnti, fmt_idx)

    def validate_and_refresh(self, rnti: int, fmt_idx: int) -> bool:
        ok = self.validate(rnti, fmt_idx)
        if ok:
            self.last_seen[rnti] = self.timestamp
        return ok

    def activate_and_refresh(self, rnti: int, fmt_idx: int,
                             reason: ActivationReason):
        self._activate(rnti, reason)
        self.last_seen[rnti] = self.timestamp
        self.assoc_format[rnti] = fmt_idx

    def get_activation_reason(self, rnti: int) -> ActivationReason:
        if self.active[rnti]:
            return self.reason.get(rnti, ActivationReason.UNSET)
        return ActivationReason.UNSET

    def _likely_dl_format(self, rnti: int) -> int:
        best, best_f = 0, ASSOC_FORMAT_UNCERTAIN
        for f in range(1, self.nformats):
            c = self.hist[f].frequency(rnti)
            if c > best:
                best, best_f = c, f
        return best_f

    def _validate_by_histogram(self, rnti: int, fmt_idx: int) -> bool:
        likely = self._likely_dl_format(rnti)
        if fmt_idx != FORMAT_INDEX_UPLINK and fmt_idx != likely:
            return False
        ul = self.hist[FORMAT_INDEX_UPLINK].frequency(rnti)
        dl = self.hist[likely].frequency(rnti) if likely != ASSOC_FORMAT_UNCERTAIN else 0
        if ul + dl > self.threshold:
            self._activate(rnti, ActivationReason.HISTOGRAM)
            self.assoc_format[rnti] = likely if dl > self.threshold else ASSOC_FORMAT_UNCERTAIN
            return True
        return False

    def _activate(self, rnti: int, reason: ActivationReason):
        if not self.active[rnti]:
            self.active[rnti] = True
            self.reason[rnti] = reason

    def _deactivate(self, rnti: int):
        if self.active[rnti]:
            self.active[rnti] = False
            self.assoc_format[rnti] = 0
            self.reason.pop(rnti, None)

    # --- time ------------------------------------------------------------
    def step_time(self, n_steps: int = 1):
        for _ in range(n_steps):
            for f in range(self.nformats):
                if self.remaining[f] > 0:
                    self.hist[f].add(ILLEGAL_RNTI, self.remaining[f])
                self.remaining[f] = self.max_candidates
            self.timestamp += 1

    # --- reporting -------------------------------------------------------
    def active_set(self) -> List[Tuple[int, ActivationReason, int]]:
        out = []
        for rnti in np.nonzero(self.active)[0]:
            if self.timestamp - self.last_seen[rnti] >= self.lifetime:
                self._deactivate(int(rnti))
                continue
            out.append((int(rnti), self.reason.get(int(rnti), ActivationReason.UNSET),
                        int(self.timestamp - self.last_seen[rnti])))
        return out


def default_manager(threshold: int = 5) -> RNTIManager:
    """Manager with the reference's evergreen/forbidden setup
    (`LTESniffer_Core.cc:398-417`): RA-RNTI + P/SI-RNTI evergreen for formats
    0 (UL), 1A and 1C; RNTI 0 forbidden everywhere."""
    from ltesniffer_tpu.phy.params import RARNTI_START, RARNTI_END, PRNTI, SIRNTI
    m = RNTIManager(threshold=threshold)
    for fmt_name, idx in FORMAT_TO_INDEX.items():
        if fmt_name in ("1A", "1C"):
            m.add_evergreen(RARNTI_START, RARNTI_END, idx)
            m.add_evergreen(PRNTI, SIRNTI, idx)
        m.add_forbidden(0x0, 0x0, idx)
    return m


# global format ordering (matches falcon_ue_all_formats, `DCISearch.cc:84-95`)
FORMAT_ORDER = ("0", "1", "1A", "1B", "1C", "1D", "2", "2A", "2B")
FORMAT_TO_INDEX = {f: i for i, f in enumerate(FORMAT_ORDER)}
