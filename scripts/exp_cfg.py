"""Config sweep: turbo_iters x batch_size on the loaded-cell stream."""
import time

import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario

N_SF, N_RNTI, GRANTS = 512, 50, 12
CELL = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)

sb = scenario.ScenarioBuilder(CELL, cfi=2, seed=7)
rntis = [0x100 + i for i in range(N_RNTI)]
ndi = {}
for j in range(N_SF):
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
    sb.add_subframe(j % 10, txs, strict=False,
                    with_pbch_sfn=j // 10 if j % 10 == 0 else None)
stream = sb.stream()
print(f"scenario: {N_SF} sf", flush=True)

for it, bs in ((4, 256), (3, 256), (2, 256), (4, 512), (3, 512),
               (4, 128), (3, 384)):
    kw = dict(cell=CELL, batch_size=bs, turbo_iters=it)
    c = core.LTESnifferCore(core.SnifferConfig(**kw))
    t0 = time.perf_counter()
    c.run_samples(stream)
    cold = time.perf_counter() - t0
    best, s = 0.0, None
    for _ in range(2):
        cc = core.LTESnifferCore(core.SnifferConfig(**kw))
        t0 = time.perf_counter()
        cc.run_samples(stream)
        best = max(best, N_SF / (time.perf_counter() - t0))
        s = cc.summary()
    print(f"it={it} bs={bs:3d}: cold={cold:6.1f}s warm={best:7.1f} sf/s "
          f"({s['pdsch_ok']} ok)", flush=True)
