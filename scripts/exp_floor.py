"""Floor analysis: rate without PDSCH decode, and span profile of both."""
import time

import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.sniffer import core, prof
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


def run(tag, **kw):
    c = core.LTESnifferCore(core.SnifferConfig(cell=CELL, batch_size=256,
                                               **kw))
    c.run_samples(stream)          # warm
    prof.reset()
    best = 0.0
    for _ in range(2):
        cc = core.LTESnifferCore(core.SnifferConfig(cell=CELL,
                                                    batch_size=256, **kw))
        t0 = time.perf_counter()
        cc.run_samples(stream)
        best = max(best, N_SF / (time.perf_counter() - t0))
    print(f"{tag:28s}: {best:7.1f} sf/s", flush=True)
    print(prof.pretty(), flush=True)
    print("----", flush=True)


run("no-pdsch (search+resolve)", decode_pdsch=False)
run("full chain")
