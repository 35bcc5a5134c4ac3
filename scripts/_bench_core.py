"""Full-system DL throughput: LTESnifferCore on a synthesized 20MHz cell."""
import sys, time
import numpy as np
import jax
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario
from ltesniffer_tpu.mac_rrc import mac

N_SF = int(sys.argv[1]) if len(sys.argv) > 1 else 60
N_UE = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 32
cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
sb = scenario.ScenarioBuilder(cell, seed=3)
rng = np.random.default_rng(5)
rntis = [0x4000 + i for i in range(N_UE)]
pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=bytes(rng.integers(0, 256, 40, dtype=np.uint8).tolist()))])
t0 = time.time()
ndis = {r: 0 for r in rntis}
for j in range(N_SF):
    txs = []
    if j >= 2:
        start = 0
        for i in range(4):   # 4 UEs per subframe, round-robin over the pool
            r = rntis[(j * 4 + i) % N_UE]
            ndis[r] ^= 1
            try:
                txs.append(scenario.DlTx(rnti=r, mac_pdu=pdu, n_prb=10,
                                         prb_start=start, harq_pid=j % 8,
                                         ndi=ndis[r]))
            except ValueError:
                pass
            start += 10
    sb.add_subframe(j % 10, txs)
print(f"scenario built in {time.time()-t0:.1f}s")
stream = sb.stream()
cfg = core.SnifferConfig(cell=cell, pcap_path="/tmp/bench_core.pcap", batch_size=BATCH)
c = core.LTESnifferCore(cfg)
# warmup compile on first batch
t0 = time.time()
c.run_samples(stream)
dt = time.time() - t0
c.close()
s = c.summary()
print(f"first pass (incl compile): {N_SF/dt:.1f} sf/s; {s['dcis']} DCIs {s['pdsch_ok']} ok")
from ltesniffer_tpu.sniffer import prof
prof.reset()
c2 = core.LTESnifferCore(core.SnifferConfig(cell=cell, pcap_path="/tmp/bench_core2.pcap", batch_size=BATCH))
t0 = time.time()
c2.run_samples(stream)
dt = time.time() - t0
c2.close()
s = c2.summary()
print(f"steady: {N_SF/dt:.1f} sf/s ({dt/N_SF*1e3:.1f} ms/sf); dcis={s['dcis']} pdsch_ok={s['pdsch_ok']}")
from ltesniffer_tpu.sniffer import prof
print(prof.pretty())
