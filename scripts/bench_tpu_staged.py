"""Staged TPU probe with progress logging: isolates lower/compile/execute/
readback for one batch size.  Usage: python bench_tpu_staged.py <B>"""
import sys
import time


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ltesniffer_tpu.phy.params import CellConfig
    from ltesniffer_tpu.sniffer import pdcch_rx
    from ltesniffer_tpu.kernels import cplx

    cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
    run, st = pdcch_rx.make_pipeline(cell, 3)
    rng = np.random.default_rng(0)
    s = (rng.standard_normal((B, 1, cell.sf_len))
         + 1j * rng.standard_normal((B, 1, cell.sf_len))).astype(np.complex64)
    sf = (np.arange(B) % 10).astype(np.int32)
    log(f"B={B} transferring inputs")
    s_d = jax.device_put(cplx.to_ri(s))
    sf_d = jax.device_put(sf)
    jax.block_until_ready((s_d, sf_d))
    log("inputs on device; lowering")
    low = run.jitted_ri.lower(s_d, sf_d)
    log("lowered; compiling")
    t0 = time.time()
    comp = low.compile()
    log(f"compiled in {time.time()-t0:.1f}s; executing")
    t0 = time.time()
    out = comp(s_d, sf_d)
    jax.block_until_ready(out)
    log(f"executed in {time.time()-t0:.2f}s; reading back")
    v = float(jnp.sum(out["cce_power"]))
    log(f"READBACK OK checksum={v:.2f}")
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = comp(s_d, sf_d)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out["cce_power"]))
    dt = time.perf_counter() - t0
    log(f"steady: {B*n/dt:.1f} sf/s ({1000*dt/(B*n):.2f} ms/sf)")


if __name__ == "__main__":
    main()
