"""Progressive TPU bench probe: one batch size per process invocation.

The axon device wedges for tens of minutes after certain failures, so each
probe runs a single batch size and exits; drive it as
    python bench_tpu_probe.py <B> [n_iters]
and stop escalating at the first hang (external timeout recommended).
Prints one JSON line on success.
"""
import json
import sys
import time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
    s_d = jax.device_put(cplx.to_ri(s))
    sf_d = jax.device_put(sf)
    t0 = time.time()
    out = run.jitted_ri(s_d, sf_d)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    checksum = float(jnp.sum(out["cce_power"]))   # forces real execution

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run.jitted_ri(s_d, sf_d)
    jax.block_until_ready(out)
    checksum2 = float(jnp.sum(out["cce_power"]))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "B": B, "n_iters": n_iters, "compile_s": round(compile_s, 1),
        "sf_per_s": round(B * n_iters / dt, 1),
        "ms_per_subframe": round(1000 * dt / (B * n_iters), 3),
        "checksum": round(checksum2, 2)}))


if __name__ == "__main__":
    main()
