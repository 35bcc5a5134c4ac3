import time
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def bump(x):
    return x + 1

for shape, dt in [((8,), np.float32), ((128, 84), np.float32),
                  ((128, 157, 28), np.float32), ((128, 157, 67), np.float32),
                  ((4300800,), np.float32)]:
    x = jax.device_put(jnp.zeros(shape, dt))
    x = bump(x); _ = np.asarray(x)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        x = bump(x)
        _ = np.asarray(x)
    t = (time.perf_counter()-t0)/n
    mb = float(np.prod(shape))*4/1e6
    print(f"{str(shape):20s} {mb:8.2f} MB  {t*1e3:7.1f} ms  {mb/t:8.1f} MB/s")
