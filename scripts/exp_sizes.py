"""One-process comparison: warm e2e rate at several stream sizes/batches."""
import sys
import time

import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.sniffer import core, prof
from ltesniffer_tpu.testing import scenario

N_RNTI, GRANTS = 50, 12
CELL = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)

N_MAX = 1024
sb = scenario.ScenarioBuilder(CELL, cfi=2, seed=7)
rntis = [0x100 + i for i in range(N_RNTI)]
ndi = {}
for j in range(N_MAX):
    sf = j % 10
    txs = []
    for g in range(GRANTS):
        r = rntis[(j * GRANTS + g) % N_RNTI]
        pid = (j // 8) % 8
        ndi[(r, pid)] = ndi.get((r, pid), 1) ^ 1
        pdu = mac.build_mac_pdu([mac.MacSubPdu(
            lcid=3, payload=bytes([g]) * (40 + 10 * (g % 3)))])
        txs.append(scenario.DlTx(rnti=r, mac_pdu=pdu, n_prb=8,
                                 prb_start=g * 8, harq_pid=pid,
                                 ndi=ndi[(r, pid)]))
    sb.add_subframe(sf, txs, strict=False,
                    with_pbch_sfn=j // 10 if sf == 0 else None)
stream = sb.stream()
sf_len = CELL.sf_len
print(f"scenario ready: {N_MAX} sf, {stream.nbytes/1e6:.0f} MB", flush=True)

t0 = time.perf_counter()
c = core.LTESnifferCore(core.SnifferConfig(cell=CELL, batch_size=256))
c.run_samples(stream)
print(f"warmup (compile): {time.perf_counter()-t0:.0f}s, "
      f"{c.summary()['pdsch_ok']} ok", flush=True)

for n_sf, bs in ((512, 256), (1024, 256), (1024, 128), (512, 128)):
    best = 0.0
    s = None
    for _ in range(2):
        cc = core.LTESnifferCore(core.SnifferConfig(cell=CELL, batch_size=bs))
        t0 = time.perf_counter()
        cc.run_samples(stream[:n_sf * sf_len])
        dt = time.perf_counter() - t0
        best = max(best, n_sf / dt)
        s = cc.summary()
    print(f"n_sf={n_sf:5d} batch={bs:3d}: {best:7.1f} sf/s  "
          f"({s['dcis']} dcis, {s['pdsch_ok']} ok)", flush=True)

prof.reset()
cc = core.LTESnifferCore(core.SnifferConfig(cell=CELL, batch_size=256))
t0 = time.perf_counter()
cc.run_samples(stream)
print(f"profiled 1024/256: {1024/(time.perf_counter()-t0):.1f} sf/s",
      flush=True)
print(prof.pretty())
