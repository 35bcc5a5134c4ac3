"""Device-level stage timing for the loaded-cell e2e path.

Measures, on the real chip:
  - H2D bandwidth of the int16 IQ stream (the ingest floor)
  - frontend compute with data already on device
  - blind search compute
  - PDSCH eq/demap + turbo for a loaded batch of grants

axon note: only a value readback is a reliable barrier; times are
N chained dispatches + one scalar readback.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import frontend as fe_mod, pdcch_rx, pdsch_rx
from ltesniffer_tpu.kernels import cplx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
dev = jax.devices()[0]
rng = np.random.default_rng(0)


def force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=ITERS, bytes_moved=0):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {bytes_moved/dt/1e6:8.1f} MB/s" if bytes_moved else ""
    print(f"{name:30s} {dt*1e3:9.2f} ms  ({B/dt:8.1f} sf/s){extra}",
          flush=True)
    return out


samples = (rng.standard_normal((B, 1, cell.sf_len))
           + 1j * rng.standard_normal((B, 1, cell.sf_len))
           ).astype(np.complex64)
sf_idx = (np.arange(B) % 10).astype(np.int32)
i16, scale = cplx.to_i16(samples)

# --- 1. H2D bandwidth ---------------------------------------------------
timeit("h2d int16 frames", lambda: jax.device_put(i16, dev),
       bytes_moved=i16.nbytes)

# --- 2. frontend with data on device ------------------------------------
front = fe_mod.make_frontend(cell)
i16_d = jax.device_put(i16, dev)
sf_d = jax.device_put(sf_idx, dev)
timeit("frontend (on-dev, i16)", lambda: front.jitted_i16(
    i16_d, sf_d, scale, np.float32(0.0)))
fe = front.jitted_i16(i16_d, sf_d, scale, np.float32(0.0))
force(fe["scalars"])

# --- 3. blind search ---------------------------------------------------
run, st = pdcch_rx.make_search_from_grids(cell, 2)
CH = 32
sub = jnp.arange(CH)


def search_all():
    outs = []
    for a in range(0, B, CH):
        outs.append(run(fe["grids"][sub + a], fe["h"][sub + a],
                        fe["noise_var"][sub + a], fe["snr_db"][sub + a],
                        sf_d[sub + a]))
    return outs[-1]["cand_fused"]


timeit("blind search (8x32 chunks)", search_all)

# --- 4. PDSCH decode of a loaded batch ----------------------------------
GRANTS = 12
jobs = []
for i in range(B):
    for g in range(GRANTS):
        mask = np.zeros(cell.n_prb, bool)
        mask[g * 8:(g + 1) * 8] = True
        jobs.append(pdsch_rx.GrantJob(
            b=i, sf_idx=int(sf_idx[i]), cfi=2, rnti=0x100 + g,
            prb_mask=mask, qm=4, tbs=4392, rv=0, prb_mask_slot1=None,
            harq_key=None, is_retx=False, pa=1.0))


def pdsch_all():
    pb = pdsch_rx.dispatch_grants_batch(fe["grids"], fe["h"],
                                        fe["noise_var"], cell, jobs)
    return np.asarray(pb.fused_dev)


out = pdsch_all()
t0 = time.perf_counter()
for _ in range(ITERS):
    out = pdsch_all()
dt = (time.perf_counter() - t0) / ITERS
print(f"{'pdsch decode %d grants' % len(jobs):30s} {dt*1e3:9.2f} ms  "
      f"({B/dt:8.1f} sf/s)", flush=True)
