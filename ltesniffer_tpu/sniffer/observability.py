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


def format_api_table(api) -> str:
    """Identity table like the reference's api-mode terminal output."""
    lines = ["RNTI    TMSI        IMSI             IMEI             Cause"]
    for row in api.table():
        lines.append(f"{row['rnti']:<7} {row['tmsi'] or '-':<11} "
                     f"{row['imsi'] or '-':<16} {row['imei'] or '-':<16} "
                     f"{row['cause'] or '-'}")
    return "\n".join(lines)
