"""Dissect dispatch_grants_batch device pieces at the e2e bench shapes."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import pdsch as pdsch_mod, turbo as turbo_host
from ltesniffer_tpu.sniffer import frontend as fe_mod, pdsch_rx
from ltesniffer_tpu.kernels import cplx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
GRANTS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
TBS = int(sys.argv[3]) if len(sys.argv) > 3 else 424
QM = int(sys.argv[4]) if len(sys.argv) > 4 else 2
ITERS = 3
cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
rng = np.random.default_rng(0)
dev = jax.devices()[0]

samples = (rng.standard_normal((B, 1, cell.sf_len))
           + 1j * rng.standard_normal((B, 1, cell.sf_len))
           ).astype(np.complex64)
sf_idx = (np.arange(B) % 10).astype(np.int32)
front = fe_mod.make_frontend(cell)
fe = front(samples, sf_idx)
float(jnp.sum(fe["scalars"]))


def timeit(name, fn, iters=ITERS):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:9.2f} ms ({B/dt:8.1f} sf/s)", flush=True)
    return out


jobs = []
for i in range(B):
    for g in range(GRANTS):
        mask = np.zeros(cell.n_prb, bool)
        mask[g * 8:(g + 1) * 8] = True
        jobs.append(pdsch_rx.GrantJob(
            b=i, sf_idx=int(sf_idx[i]), cfi=2, rnti=0x100 + g,
            prb_mask=mask, qm=QM, tbs=TBS, rv=0, prb_mask_slot1=None,
            harq_key=None, is_retx=False, pa=1.0))

# --- full dispatch+finish --------------------------------------------------
def full():
    pb = pdsch_rx.dispatch_grants_batch(fe["grids"], fe["h"],
                                        fe["noise_var"], cell, jobs)
    return np.asarray(pb.fused_dev)

timeit("dispatch+finish (full)", full)

# --- eq/demap alone --------------------------------------------------------
re_idx = pdsch_mod.grant_re_indices(cell, 0, 2, jobs[0].prb_mask)
n_re = len(re_idx)
n_pad = pdsch_rx._bucket(n_re)
G = len(jobs)
G_pad = pdsch_rx._pow2(G, 4)
bidx = np.zeros(G_pad, np.int32)
idx = np.zeros((G_pad, n_pad), np.int32)
cinit = np.zeros(G_pad, np.uint32)
pa = np.ones(G_pad, np.float32)
for row, j in enumerate(jobs):
    ri = pdsch_mod.grant_re_indices(cell, j.sf_idx, j.cfi, j.prb_mask)
    idx[row, :len(ri)] = ri
    idx[row, len(ri):] = ri[-1]
    bidx[row] = j.b
    cinit[row] = pdsch_mod.scrambling_cinit(j.rnti, 0, j.sf_idx,
                                            cell.n_id_cell)
gflat = fe["grids"].reshape(B, 1, -1, 2)
hflat = fe["h"].reshape(B, 1, 2, -1, 2)
combos = []
u_idx = np.zeros(G_pad, np.int32)
u_of = {}
for row, j in enumerate(jobs):
    combo = (j.sf_idx, j.cfi, j.prb_mask.tobytes(), None)
    u = u_of.get(combo)
    if u is None:
        u = u_of[combo] = len(combos)
        combos.append(combo)
    u_idx[row] = u
re_tab = pdsch_rx._re_tab_device(cell, n_pad, tuple(combos))
eqfn = pdsch_rx._eq_demap_batch_fn(cell, QM, n_pad, True,
                                   int(re_tab.shape[0]))
bidx_d, u_d = jnp.asarray(bidx), jnp.asarray(u_idx)
cin_d, pa_d = jnp.asarray(cinit), jnp.asarray(pa)
out = timeit("eq/demap batch", lambda: eqfn(
    gflat, hflat, fe["noise_var"], bidx_d, u_d, re_tab, cin_d, pa_d))
print(f"  [G_pad={G_pad} n_pad={n_pad} n_re={n_re}]")

# --- derm+turbo+crc+pack ---------------------------------------------------
seg = turbo_host.segment_sizes(TBS)
K = seg.K[0]
E = pdsch_mod.cb_rate_match_sizes(n_re * QM, seg.C, QM)[0]
n_b = G_pad
Wm = pdsch_rx._pow2(n_pad * QM, 1 << 12)
rows_mat = pdsch_rx._stack_rows([out], Wm)
rows_idx = jnp.asarray((np.arange(n_b) % G).astype(np.int32))
e_d = jnp.asarray(np.full(n_b, E, np.int32))
laps = pdsch_rx._derm_laps(K, seg.F, E)
for it in (8, 3):
    fn = pdsch_rx._derm_turbo_static_fn(Wm, K, seg.F, laps, 0, n_b, False,
                                        it, ("lin", 0))
    timeit(f"derm+turbo+crc K={K} it={it}",
           lambda fn=fn: fn(rows_mat, rows_idx, e_d))
