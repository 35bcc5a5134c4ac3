"""Probe the axon tunnel H2D: dtype, chunk size, concurrency."""
import time

import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
rng = np.random.default_rng(0)
MB = 1 << 20


def force(x):
    return float(jnp.sum(x[..., 0].astype(jnp.float32)))


def put(arrs):
    ds = [jax.device_put(a, dev) for a in arrs]
    for d in ds:
        force(d)
    return ds


def timeit(name, arrs, iters=3):
    put(arrs)
    t0 = time.perf_counter()
    for _ in range(iters):
        put(arrs)
    dt = (time.perf_counter() - t0) / iters
    nbytes = sum(a.nbytes for a in arrs)
    print(f"{name:36s} {dt*1e3:9.2f} ms  {nbytes/dt/1e6:8.1f} MB/s",
          flush=True)


N = 32 * MB
base = rng.integers(-100, 100, N, dtype=np.int16)
timeit("int16 32M elems (64MB) x1", [base])
timeit("int8  32M elems (32MB) x1", [base.astype(np.int8)])
timeit("f32   32M elems (128MB) x1", [base.astype(np.float32)])
timeit("int16 64MB as 4x16MB", np.split(base, 4))
timeit("int16 64MB as 16x4MB", np.split(base, 16))
timeit("int8  32MB as 4x8MB", np.split(base.astype(np.int8), 4))
small = rng.integers(-100, 100, MB // 2, dtype=np.int16)
timeit("int16 1MB x1", [small], iters=10)
