"""Dissect _derm_turbo_fn: gather vs turbo vs crc vs pack at bench shapes."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.phy import crc, turbo as turbo_host, pdsch as pdsch_mod
from ltesniffer_tpu.sniffer import pdsch_rx
from ltesniffer_tpu.kernels import turbo as kturbo

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TBS = int(sys.argv[2]) if len(sys.argv) > 2 else 4392
NIT = int(sys.argv[3]) if len(sys.argv) > 3 else 4
rng = np.random.default_rng(0)
seg = turbo_host.segment_sizes(TBS)
K = seg.K[0]
Kp = K + 4
n_re = 1056
QM = 4
E = pdsch_mod.cb_rate_match_sizes(n_re * QM, seg.C, QM)[0]
flat = jnp.asarray(rng.standard_normal(N * 5120).astype(np.float32))
starts = jnp.asarray(((np.arange(N) % N) * 5120).astype(np.int32))
tab = pdsch_rx._inv_tab_device(((K, seg.F, E, 0),))
R = int(tab.shape[2])
du = jnp.asarray(np.zeros(N, np.int32))
f_d = jnp.asarray(np.full(N, seg.F, np.int32))
print(f"K={K} E={E} R={R} N={N}")


def timeit(name, fn, iters=3):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.2f} ms", flush=True)
    return out


@jax.jit
def derm_only(flat_llr, starts, u_idx, inv_tab, F):
    inv = inv_tab[u_idx]
    valid = inv >= 0
    gidx = starts[:, None, None] + jnp.where(valid, inv, 0)
    vals = jnp.where(valid, flat_llr[gidx], 0.0)
    d = jnp.sum(vals, axis=-1).reshape(N, 3, Kp)
    fm = jnp.arange(Kp)[None, :] < F[:, None]
    d = d.at[:, 0, :].set(jnp.where(fm, 1e4, d[:, 0, :]))
    d = d.at[:, 1, :].set(jnp.where(fm, 1e4, d[:, 1, :]))
    return d


d = timeit("derm gather", lambda: derm_only(flat, starts, du, tab, f_d))

dec = kturbo.make_decoder(K, NIT)
out = timeit(f"turbo it={NIT}", lambda: dec(d))
bits = out[0]

timeit("crc24b batched", lambda: crc.batched_crc(bits, crc.CRC24B))

Wk = (K + 31) // 32
w32 = (1 << np.arange(32, dtype=np.int64)).astype(np.uint32)


@jax.jit
def pack(bits):
    pad = jnp.pad(bits, ((0, 0), (0, Wk * 32 - K)))
    return jnp.sum(pad.reshape(N, Wk, 32).astype(jnp.uint32) * w32,
                   axis=-1, dtype=jnp.uint32)


timeit("bit pack", lambda: pack(bits))
