import time
import numpy as np, jax, jax.numpy as jnp
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import pdcch_rx
from ltesniffer_tpu.kernels import cplx

cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
b = pdcch_rx._build_pipeline(cell, 3)
run = b["run"].jitted_ri
B = 64
rng = np.random.default_rng(0)
s = (rng.standard_normal((B,1,cell.sf_len))+1j*rng.standard_normal((B,1,cell.sf_len))).astype(np.complex64)
dev = jax.devices()[0]
x = jax.device_put(cplx.to_ri(s), dev); sf = jax.device_put((np.arange(B)%10).astype(np.int32), dev)

out = run(x, sf); jax.block_until_ready(out)
_ = float(jnp.sum(out["cce_power"]))

# 1) tunnel RTT: tiny transfer
t0=time.perf_counter()
for _ in range(5): _ = float(jnp.sum(out["snr_db"]))
print("readback scalar RTT:", (time.perf_counter()-t0)/5*1e3, "ms")

# 2) one run + readback
t0=time.perf_counter()
for _ in range(5):
    o = run(x, sf)
    _ = float(jnp.sum(o["snr_db"]))
print("run+readback:", (time.perf_counter()-t0)/5*1e3, "ms")

# 3) 10 runs chained then readback
t0=time.perf_counter()
for _ in range(10):
    o = run(x, sf)
_ = float(jnp.sum(o["snr_db"]))
print("10 runs + 1 readback:", (time.perf_counter()-t0)/10*1e3, "ms/run")

# 4) block_until_ready only
t0=time.perf_counter()
for _ in range(10):
    o = run(x, sf)
jax.block_until_ready(o)
print("10 runs + block:", (time.perf_counter()-t0)/10*1e3, "ms/run")
