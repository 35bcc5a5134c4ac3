"""Microbench: turbo decoder variants at the loaded-cell shape."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.kernels import turbo as kturbo
from ltesniffer_tpu.phy import turbo as hturbo

K = int(sys.argv[1]) if len(sys.argv) > 1 else 456
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

rng = np.random.default_rng(0)
# encode one real codeword so BER is measurable
bits = rng.integers(0, 2, K - 24).astype(np.uint8)
from ltesniffer_tpu.phy import crc as crc_mod
msg = np.concatenate([bits, crc_mod.crc_bits(bits, crc_mod.CRC24A)])
d = hturbo.turbo_encode(msg)          # (3, K+4)
snr_db = 0.0
sigma = 10 ** (-snr_db / 20)
llr = (1 - 2.0 * d) * 2 / sigma**2 + rng.normal(0, 2 / sigma, d.shape)
d_llrs = np.broadcast_to(llr[None], (B, 3, K + 4)).astype(np.float32).copy()
d_dev = jax.device_put(jnp.asarray(d_llrs))


def timeit(name, fn):
    out = fn(d_dev)
    b = np.asarray(out[0])
    ber = float((b[0] != msg).mean())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(d_dev)
    _ = np.asarray(out[0][0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:9.2f} ms  ber={ber:.4f} "
          f"({B*K/dt/1e6:.1f} Mbit/s)", flush=True)


for n_it in (2, 4, 8):
    timeit(f"full-scan K={K} it={n_it}",
           kturbo._make_decoder_full(K, n_it))
for W in (8, 16, 32):
    if K % W == 0:
        for n_it in (2, 4, 8):
            timeit(f"pw W={W} K={K} it={n_it}",
                   kturbo._make_decoder_pw(K, n_it, W))
