"""Benchmark: LTE subframes/s through the batched PDCCH blind-decode pipeline.

Runs on the real TPU chip (axon).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference sustains 1000 subframes/s (real-time, 20 MHz,
i7-9700K, `BASELINE.md`).  This bench measures the same unit of work per
subframe the reference's hot path does: OFDM demod + channel estimation +
blind Viterbi decode of every (location x payload-size) candidate.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from ltesniffer_tpu.phy.params import CellConfig
    from ltesniffer_tpu.sniffer import pdcch_rx

    # 20 MHz cell, CFI 3 -> 84 CCEs, 157 blind locations (reference maximums)
    cell = CellConfig(n_id_cell=301, n_prb=100, nof_ports=2, nof_rx_ant=1)
    cfi = 3
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from ltesniffer_tpu.kernels import cplx
    run, st = pdcch_rx.make_pipeline(cell, cfi)
    run = run.jitted_ri
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal((B, 1, cell.sf_len))
               + 1j * rng.standard_normal((B, 1, cell.sf_len))).astype(np.complex64)
    sf_idx = (np.arange(B) % 10).astype(np.int32)

    dev = jax.devices()[0]
    samples_d = jax.device_put(cplx.to_ri(samples), dev)
    sf_d = jax.device_put(sf_idx, dev)

    # compile + warmup; read a value back to force real execution end-to-end
    out = run(samples_d, sf_d)
    jax.block_until_ready(out)
    _ = float(jax.numpy.sum(out["cce_power"]))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run(samples_d, sf_d)
    # checksum readback inside the timed region pins the full pipeline
    checksum = float(jax.numpy.sum(out["cce_power"]))
    dt = time.perf_counter() - t0
    assert checksum == checksum  # not NaN

    sf_per_s = B * n_iters / dt
    print(json.dumps({
        "metric": "pdcch_blind_decode_subframes_per_second",
        "value": round(sf_per_s, 1),
        "unit": "subframes/s (20MHz, cfi3, 157 locations x 7 sizes, 1 chip)",
        "vs_baseline": round(sf_per_s / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
