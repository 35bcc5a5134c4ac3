"""Lightweight stage profiler (the reference's `lib/src/prof/` Stopwatch /
PrintLifetime analog, `Lifetime.cc:27-48`, `Stopwatch.cc:24-40`).

Usage:
    from ltesniffer_tpu.sniffer import prof
    with prof.span("pdcch"):
        ...
    prof.report()        # dict of {stage: {"s": total, "n": calls}}

Enabled by default (nanosecond-scale overhead); `prof.reset()` clears.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

_acc: Dict[str, list] = defaultdict(lambda: [0.0, 0])


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        a = _acc[name]
        a[0] += time.perf_counter() - t0
        a[1] += 1


def add(name: str, seconds: float):
    a = _acc[name]
    a[0] += seconds
    a[1] += 1


def report() -> Dict[str, dict]:
    return {k: {"s": round(v[0], 4), "n": v[1]} for k, v in
            sorted(_acc.items(), key=lambda kv: -kv[1][0])}


def reset():
    _acc.clear()


def pretty() -> str:
    lines = [f"{k:24s} {v['s']:9.3f} s  x{v['n']}"
             for k, v in report().items()]
    return "\n".join(lines)
