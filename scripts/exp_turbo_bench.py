import time, sys
import numpy as np
import jax
from ltesniffer_tpu.kernels import turbo as kturbo

for K in (416, 512, 616):
    for B in (256, 768):
        for windowed in (False, True):
            fn = kturbo.make_decoder(K, 8, windowed=windowed)
            d = np.random.randn(B, 3, K + 4).astype(np.float32) * 2
            out = fn(jax.numpy.asarray(d))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(jax.numpy.asarray(d))
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"K={K} B={B} win={windowed}: {dt*1000:.1f} ms "
                  f"({B*K/dt/1e6:.1f} Mbit/s)")
