"""Profiled e2e run: the bench scenario with the prof-span stage table.

Usage: python scripts/profile_e2e.py [N_SF] [BATCH]
Prints per-stage wall clock for the warm pass (cold pass separately).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SF = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
os.environ["BENCH_SF"] = str(N_SF)

import bench
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import prof

bench.N_SF = N_SF
bench.BATCH = BATCH

cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
stream, placed = bench.build_stream(cell)
print(f"[prof] scenario: {N_SF} sf, {placed} grants", file=sys.stderr)

t0 = time.perf_counter()
dt_cold, s1 = bench.run_e2e(cell, stream)
print(f"[prof] cold pass: {dt_cold:.1f}s, {s1['dcis']} DCIs, "
      f"{s1['pdsch_ok']} ok", file=sys.stderr)
print("[prof] cold stage table:\n" + prof.pretty(), file=sys.stderr)

prof.reset()
dt, s2 = bench.run_e2e(cell, stream)
print(f"[prof] warm pass: {dt:.2f}s = {N_SF/dt:.1f} sf/s, "
      f"{s2['dcis']} DCIs, {s2['pdsch_ok']} ok")
print("[prof] warm stage table:\n" + prof.pretty())
