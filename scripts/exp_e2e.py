"""Experiment: loaded-cell scenario generation + one e2e core pass."""
import sys
import time

import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario

N_SF = int(sys.argv[1]) if len(sys.argv) > 1 else 40
N_RNTI = int(sys.argv[2]) if len(sys.argv) > 2 else 50
GRANTS = int(sys.argv[3]) if len(sys.argv) > 3 else 12

CELL = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)

t0 = time.perf_counter()
sb = scenario.ScenarioBuilder(CELL, cfi=2, seed=7)
print("nof_cce:", sb._nof_cce())
rntis = [0x100 + i for i in range(N_RNTI)]
ndi = {}
placed_total = 0
for j in range(N_SF):
    sf = j % 10
    txs = []
    for g in range(GRANTS):
        r = rntis[(j * GRANTS + g) % N_RNTI]
        pid = (j // 8) % 8
        key = (r, pid)
        ndi[key] = ndi.get(key, 1) ^ 1
        pdu = mac.build_mac_pdu([mac.MacSubPdu(
            lcid=3, payload=bytes([g]) * (40 + 10 * (g % 3)))])
        txs.append(scenario.DlTx(rnti=r, mac_pdu=pdu, n_prb=8,
                                 prb_start=g * 8, harq_pid=pid,
                                 ndi=ndi[key]))
    placed_total += sb.add_subframe(
        sf, txs, strict=False,
        with_pbch_sfn=j // 10 if sf == 0 else None)
t1 = time.perf_counter()
print(f"gen: {N_SF} sf with {GRANTS} grants/sf in {t1-t0:.1f}s "
      f"({(t1-t0)/N_SF*1000:.0f} ms/sf), placed {placed_total}")

stream = sb.stream()
print("stream MB:", stream.nbytes / 1e6)

cfg = core.SnifferConfig(cell=CELL, batch_size=int(sys.argv[4]) if len(sys.argv) > 4 else 32)
c = core.LTESnifferCore(cfg)
t2 = time.perf_counter()
c.run_samples(stream)
t3 = time.perf_counter()
s = c.summary()
print(f"pass1 (compile): {t3-t2:.1f}s  summary: {s['subframes']} sf, "
      f"{s['dcis']} dcis, {s['pdsch_ok']} ok")

c2 = core.LTESnifferCore(cfg)
t4 = time.perf_counter()
c2.run_samples(stream)
t5 = time.perf_counter()
s2 = c2.summary()
print(f"pass2 (warm): {t5-t4:.2f}s -> {N_SF/(t5-t4):.0f} sf/s; "
      f"{s2['dcis']} dcis, {s2['pdsch_ok']} ok")

from ltesniffer_tpu.sniffer import prof
prof.reset()
c3 = core.LTESnifferCore(cfg)
t6 = time.perf_counter()
c3.run_samples(stream)
t7 = time.perf_counter()
print(f"pass3 (warm): {t7-t6:.2f}s -> {N_SF/(t7-t6):.0f} sf/s")
print(prof.pretty())
