"""Stage-level profiling of the PDCCH pipeline on the real chip.

axon note: `jax.block_until_ready` is not a reliable barrier on this
backend — only a value readback forces execution.  Each stage is timed as
N chained dispatches + one scalar readback (tunnel RTT ~95 ms amortizes
over N).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import pdcch_rx
from ltesniffer_tpu.kernels import cplx, ofdm, chest, viterbi

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
cfi = 3

rng = np.random.default_rng(0)
samples = (rng.standard_normal((B, 1, cell.sf_len))
           + 1j * rng.standard_normal((B, 1, cell.sf_len))).astype(np.complex64)
sf_idx = (np.arange(B) % 10).astype(np.int32)
dev = jax.devices()[0]
x = jax.device_put(cplx.to_ri(samples), dev)
sf = jax.device_put(sf_idx, dev)


def force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms  ({B/dt:9.1f} sf/s)", flush=True)
    return fn(*args)


demod = jax.jit(lambda s: ofdm.demodulate_ri(s, cell))
grids = timeit("ofdm.demodulate", demod, x)

est = jax.jit(lambda g, si: chest.estimate(g, si, cell))
ch = timeit("chest.estimate", est, grids, sf)

b = pdcch_rx._build_pipeline(cell, cfi)
fg = b["from_grids"]
timeit("pdcch from_grids (eq+deRM+vit)", fg, grids, ch["h"], ch["noise_var"], ch["snr_db"], sf)
timeit("full pipeline", b["run"].jitted_ri, x, sf)

st = b["st"]
n_loc = len(st["locs"])
for D in sorted(st["size_maps"].keys()):
    llrs = jnp.asarray(rng.standard_normal((B * n_loc, 3, D)).astype(np.float32))
    vit = jax.jit(viterbi.viterbi_decode_tb)
    timeit(f"viterbi D={D} (N={B*n_loc})", vit, llrs)
