"""Compare turbo BCJR layouts: (B, NW, 8) batch-major vs (8, L) lane-major.

One full decode (n_iter iterations) at bench shapes; checks bit equality.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.phy import turbo as turbo_host, tables
from ltesniffer_tpu.kernels import turbo as kturbo

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
TBS = int(sys.argv[2]) if len(sys.argv) > 2 else 4392
NIT = int(sys.argv[3]) if len(sys.argv) > 3 else 4
seg = turbo_host.segment_sizes(TBS)
K = seg.K[0]
rng = np.random.default_rng(0)

# real codewords so bit equality is meaningful
bits = rng.integers(0, 2, (4, K), dtype=np.uint8)
d_enc = np.stack([turbo_host.turbo_encode(b) for b in bits])   # (4,3,K+4)
llr = (1.0 - 2.0 * d_enc.astype(np.float32)) * 4.0
llr += rng.standard_normal(llr.shape).astype(np.float32) * 1.0
d = jnp.asarray(np.tile(llr, (B // 4 + 1, 1, 1))[:B])


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
    print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
    return out


dec_pw = kturbo._make_decoder_pw(K, NIT)
b1 = timeit(f"pw (B,NW,8) it={NIT}", lambda: dec_pw(d))

dec_ln = kturbo._make_decoder_lanes(K, NIT)
b2 = timeit(f"lanes (8,L) it={NIT}", lambda: dec_ln(d))

a1 = np.asarray(b1[0])
a2 = np.asarray(b2[0])
print("bit agreement:", float((a1 == a2).mean()))
print("pw errors vs tx:", int((a1[:4] != bits).sum()),
      " lanes errors vs tx:", int((a2[:4] != bits).sum()))
