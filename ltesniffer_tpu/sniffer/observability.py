"""Observability: terminal tables, DCI trace, CSV stats, heartbeat.

Parity with the reference's output layer (SURVEY.md §5 metrics):
* 1 Hz "Processed N/1000 subframes" heartbeat (`LTESniffer_Core.cc:463-472`)
* 10 s per-RNTI DL/UL tables with Active/Success/NewTX/ReTX columns
  (`MCSTracking.cc:999-1267`, README.md:206-221)
* `mcs_statistic.csv` (`MCSTracking.cc:1414`)
* tab-separated DCI trace lines (`DCIToFile`, `SubframeInfoConsumer.cc:66-138`)
* security-API identity table (`LTESniffer_Core.cc:623-638`)
"""
from __future__ import annotations

import csv
import sys
import time
from typing import Optional, TextIO

from . import trackers


class Heartbeat:
    """Processed/skipped counter printed once per 1000 subframes."""

    def __init__(self, out: TextIO = sys.stdout, every: int = 1000):
        self.out = out
        self.every = every
        self.processed = 0
        self.skipped = 0
        self._window = 0
        self._window_skipped = 0

    def tick(self, processed: int = 1, skipped: int = 0):
        self.processed += processed
        self.skipped += skipped
        self._window += processed + skipped
        self._window_skipped += skipped
        if self._window >= self.every:
            self.out.write(
                f"[heartbeat] Processed {self._window - self._window_skipped}"
                f"/{self._window} subframes\n")
            self._window = 0
            self._window_skipped = 0


def format_dl_table(mcs: trackers.MCSTracking, rm=None) -> str:
    """Per-RNTI DL table in the reference's column layout."""
    lines = ["RNTI    Table    Active  NewTX  ReTX  Success  Fail  W_MIMO"]
    for rnti in sorted(mcs.stats_dl):
        st = mcs.stats_dl[rnti]
        table = mcs.dl_table_of(rnti).name
        active = "yes" if rm is not None and getattr(rm, "is_active",
                                                     lambda r: False)(rnti) \
            else "-"
        lines.append(f"0x{rnti:04x}  {table:<8} {active:<7} {st.new_tx:<6} "
                     f"{st.retx:<5} {st.success:<8} {st.fail:<5} "
                     f"{st.wrong_mimo}")
    return "\n".join(lines)


def format_ul_table(mcs: trackers.MCSTracking) -> str:
    lines = ["RNTI    Table       NewTX  Success  Fail"]
    for rnti in sorted(mcs.stats_ul):
        st = mcs.stats_ul[rnti]
        table = mcs.ul_table_of(rnti).name
        lines.append(f"0x{rnti:04x}  {table:<11} {st.new_tx:<6} "
                     f"{st.success:<8} {st.fail}")
    return "\n".join(lines)


def write_mcs_csv(path: str, mcs: trackers.MCSTracking):
    """mcs_statistic.csv equivalent."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["direction", "rnti", "table", "new_tx", "retx",
                    "success", "fail", "wrong_mimo"])
        for rnti in sorted(mcs.stats_dl):
            st = mcs.stats_dl[rnti]
            w.writerow(["dl", f"0x{rnti:04x}", mcs.dl_table_of(rnti).name,
                        st.new_tx, st.retx, st.success, st.fail,
                        st.wrong_mimo])
        for rnti in sorted(mcs.stats_ul):
            st = mcs.stats_ul[rnti]
            w.writerow(["ul", f"0x{rnti:04x}", mcs.ul_table_of(rnti).name,
                        st.new_tx, st.retx, st.success, st.fail,
                        st.wrong_mimo])


class DciTraceFile:
    """Tab-separated per-DCI trace lines (`DCIToFile` format: timestamp,
    sfn, sf, rnti, format, ncce, L, histval)."""

    def __init__(self, path: str):
        self._f = open(path, "w")

    def write(self, accepted, timestamp: Optional[float] = None):
        ts = timestamp if timestamp is not None else time.time()
        for a in accepted:
            self._f.write(
                f"{ts:.6f}\t{a.sfn}\t{a.sf_idx}\t{a.rnti}\t{a.fmt}\t"
                f"{a.ncce}\t{1 << a.l}\t{a.histval}\n")

    def close(self):
        self._f.close()


# ---------------------------------------------------------------------------
# ASCII RB-map / power-map rendering (`DCIPrint.cc:40-75`,
# `SubframeInfoConsumer.cc` DCIDrawASCII / PowerDrawASCII)
# ---------------------------------------------------------------------------
_ANSI = ["\x1b[31m", "\x1b[32m", "\x1b[33m", "\x1b[34m", "\x1b[35m",
         "\x1b[36m", "\x1b[32m", "\x1b[33m", "\x1b[34m", "\x1b[35m"]
_RESET = "\x1b[0m"


def rb_map_of(accepted_grants, n_prb: int):
    """(n_prb,) int array: owning RNTI per PRB (-1 free).  Input:
    [(rnti, prb_mask or (start, len)), ...]."""
    import numpy as np
    m = np.full(n_prb, -1, np.int64)
    for rnti, alloc in accepted_grants:
        if isinstance(alloc, tuple):
            s, l = alloc
            m[s:s + l] = rnti
        else:
            m[np.asarray(alloc, bool)] = rnti
    return m


def render_rb_map(rb_map, color: bool = True) -> str:
    """One char per PRB: '_' free, rnti%10 digit (colored per RNTI) else."""
    out = []
    for v in rb_map:
        if v < 0:
            out.append("_")
        elif color:
            out.append(f"{_ANSI[v % 10]}{v % 10}{_RESET}")
        else:
            out.append(str(v % 10))
    return "".join(out)


def render_power_map(power_db, color: bool = True) -> str:
    """Per-PRB power quantized to 0..9 across the subframe's dynamic
    range (`PowerDrawASCII` analog)."""
    import numpy as np
    p = np.asarray(power_db, np.float64)
    lo, hi = float(np.min(p)), float(np.max(p))
    span = max(hi - lo, 1e-6)
    q = np.clip(((p - lo) / span * 9.999).astype(int), 0, 9)
    if not color:
        return "".join(str(int(v)) for v in q)
    return "".join(f"{_ANSI[min(int(v) * len(_ANSI) // 10, 9)]}"
                   f"{int(v)}{_RESET}" for v in q) + _RESET


def format_api_table(api) -> str:
    """Identity table like the reference's api-mode terminal output —
    including the UECapability-seen and GUTI columns the reference
    surfaces (`UL_Sniffer_PUSCH.cc:874-892`)."""
    lines = ["RNTI    TMSI        IMSI             IMEI             "
             "UECap  GUTI                      Cause"]
    for row in api.table():
        lines.append(f"{row['rnti']:<7} {row['tmsi'] or '-':<11} "
                     f"{row['imsi'] or '-':<16} {row['imei'] or '-':<16} "
                     f"{'yes' if row['ue_capability'] else '-':<6} "
                     f"{row['guti'] or '-':<25} "
                     f"{row['cause'] or '-'}")
    return "\n".join(lines)
