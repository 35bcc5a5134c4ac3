"""H2D probe 2: element-count vs bytes — packed-word transfers."""
import time

import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
rng = np.random.default_rng(0)


def force(x):
    return float(jnp.sum(x.reshape(-1)[:64].astype(jnp.float32)))


def timeit(name, arrs, iters=3):
    ds = [jax.device_put(a, dev) for a in arrs]
    [force(d) for d in ds]
    t0 = time.perf_counter()
    for _ in range(iters):
        ds = [jax.device_put(a, dev) for a in arrs]
        [force(d) for d in ds]
    dt = (time.perf_counter() - t0) / iters
    nbytes = sum(a.nbytes for a in arrs)
    print(f"{name:36s} {dt*1e3:9.2f} ms  {nbytes/dt/1e6:8.1f} MB/s",
          flush=True)


N = 32 << 20                       # 32M int16 elements = 64 MB
base = rng.integers(-100, 100, N, dtype=np.int16)
i32 = base.view(np.int32)          # 16M elems, 64 MB
i64 = base.view(np.int64)          # 8M elems, 64 MB
timeit("int16 32M elems (64MB)", [base])
timeit("int32-packed 16M elems (64MB)", [i32])
timeit("int64-packed 8M elems (64MB)", [i64])
timeit("int32-packed 4x4M elems", np.split(i32, 4))
timeit("int64-packed 4x2M elems", np.split(i64, 4))
timeit("f32 view 16M elems (64MB)", [base.view(np.float32)])
