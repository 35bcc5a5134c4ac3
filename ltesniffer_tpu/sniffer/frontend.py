"""Batched subframe frontend: OFDM demod + CRS chest + PCFICH (CFI) detect.

Splitting the frontend from the per-CFI PDCCH search lets the host group
subframes by detected CFI (CFI changes the control-region shapes, which are
compile-time constants) while demod/chest run exactly once per subframe.

Replaces `srsran_ue_dl_decode_fft_estimate`'s FFT/chest/PCFICH stage
(`src/src/DCISearch.cc:562`, SURVEY.md §2.1 ue_dl row).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import grid as grid_mod
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.kernels import chest, cplx, demapper, ofdm


@functools.lru_cache(maxsize=16)
def make_frontend(cell: CellConfig):
    """fn(samples (B, RX, sf_len), sf_idx (B,)) -> dict with
    grids, h, noise_var, snr_db, rsrp, cfi (B,) int32, cfi_corr (B, 3)."""
    # PCFICH REs: constant positions (symbol 0)
    reg = grid_mod.control_region(cell, 1)
    re_idx = np.array([[r.l * cell.n_sc + k for k in r.res]
                       for r in reg["pcfich_regs"]],
                      dtype=np.int32).reshape(-1)              # (16,)
    scr = np.stack([1.0 - 2.0 * grid_mod.pcfich_scrambling(cell, sf)
                    for sf in range(10)]).astype(np.float32)   # (10, 32)
    cw = grid_mod.cfi_codewords_matrix()                       # (3, 32) +-1
    n_ports = cell.nof_ports
    # DFT matrices ride as device-resident ARGUMENTS: baked as constants
    # they made every (batch-shape) frontend variant a ~7 MB program
    dft = ofdm.dft_mats_device(cell)

    @jax.jit
    def run_ri_mats(samples_ri, sf_idx, mats):
        grids = ofdm.demodulate_ri(samples_ri, cell,
                                   mats=mats)          # (B,RX,14,n_sc,2)
        B = grids.shape[0]
        ch = chest.estimate(grids, sf_idx, cell)
        h = ch["h"]
        gflat = grids.reshape(B, grids.shape[1], -1, 2)
        hflat = h.reshape(B, h.shape[1], h.shape[2], -1, 2)
        y = gflat[:, :, re_idx, :]
        hh = hflat[:, :, :, re_idx, :]
        x = chest.equalize_ports(y, hh, ch["noise_var"], n_ports)
        llr = demapper.qpsk_llr(x) * jnp.asarray(scr)[sf_idx]  # (B, 32)
        corr = jnp.einsum("bj,cj->bc", llr, cw)                # (B, 3)
        cfi = 1 + jnp.argmax(corr, axis=-1).astype(jnp.int32)
        # fused per-subframe scalars: ONE device->host transfer serves the
        # whole host-side control flow (tunnel D2H costs ~25 ms flat)
        scalars = jnp.stack([cfi.astype(jnp.float32), ch["snr_db"],
                             ch["cfo"], ch["rsrp"]], axis=-1)   # (B, 4)
        return {"grids": grids, "h": h, "noise_var": ch["noise_var"],
                "snr_db": ch["snr_db"], "rsrp": ch["rsrp"],
                "cfo": ch["cfo"], "cfi": cfi, "cfi_corr": corr,
                "scalars": scalars}

    # NOTE: the device-resident `dft` pair is passed as an explicit ARG of
    # the inner jits (never closed over inside a trace — the axon backend
    # rejects captured device arrays) via thin plain-Python wrappers.
    def run_ri(samples_ri, sf_idx):
        return run_ri_mats(samples_ri, sf_idx, dft)

    @jax.jit
    def _run_i16_mats(samples_i16, sf_idx, scale, cfo, mats):
        x = samples_i16.astype(jnp.float32) * scale
        n = x.shape[-2]
        theta = (-2.0 * np.pi / cell.n_fft) * cfo * jnp.arange(n,
                                                               dtype=jnp.float32)
        c, s = jnp.cos(theta), jnp.sin(theta)
        xr, xi = x[..., 0], x[..., 1]
        x = jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)
        return run_ri_mats(x, sf_idx, mats)

    def run_i16(samples_i16, sf_idx, scale, cfo):
        """Quantized-IQ ingest: (B, RX, sf_len, 2) int16 + scale, with the
        residual-CFO de-rotation applied on device (the reference's host-side
        `srsran_cfo_correct`; here it rides the H2D-halving int16 path)."""
        return _run_i16_mats(samples_i16, sf_idx, scale, cfo, dft)

    def _unpack_i8(p, scales, cfo):
        B = p.shape[0]
        bytes_ = [((p >> (8 * k)) & 0xFF) for k in range(4)]
        b = jnp.stack(bytes_, axis=-1)                 # (B, RX, n/2, 4)
        b = ((b ^ 0x80) - 0x80).astype(jnp.float32)    # sign-extend int8
        x = b.reshape(B, p.shape[1], -1, 2) * scales[:, None, None, None]
        n = x.shape[-2]
        theta = (-2.0 * np.pi / cell.n_fft) * cfo * jnp.arange(
            n, dtype=jnp.float32)
        c, s = jnp.cos(theta), jnp.sin(theta)
        xr, xi = x[..., 0], x[..., 1]
        return jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)

    @jax.jit
    def _run_i8_mats(samples_p32, sf_idx, scales, cfo, mats):
        return run_ri_mats(_unpack_i8(samples_p32, scales, cfo), sf_idx,
                           mats)

    def run_i8(samples_p32, sf_idx, scales, cfo):
        """Packed-int8 ingest: (B, RX, n/2) int32 words of 4 int8 IQ bytes
        + per-subframe scales (B,).  4 shift/mask ops unpack on device; the
        packed words quarter the tunnel's element-count-bound H2D cost vs
        int16 pairs (see `cplx.to_i8_packed`)."""
        return _run_i8_mats(samples_p32, sf_idx, scales, cfo, dft)

    @jax.jit
    def _run_i8c64_mats(chunk64, sf_idx, scales, cfo, mats):
        # int64 H2D carrier (see `cplx.view_i64`): first op restores the
        # int32 word stream, everything downstream is unchanged
        p = jax.lax.bitcast_convert_type(chunk64, jnp.int32)
        p = p.reshape(chunk64.shape[0], chunk64.shape[1], -1)
        return run_ri_mats(_unpack_i8(p, scales, cfo), sf_idx, mats)

    def run_i8c64(chunk64, sf_idx, scales, cfo):
        """Per-batch chunked ingest from the int64-carried packed stream:
        the caller `device_put`s batch-sized chunks (under
        `jax.enable_x64(True)`) a few batches ahead, so the tunnel H2D
        overlaps device compute instead of stalling the first batch
        behind one monolithic stream transfer."""
        return _run_i8c64_mats(chunk64, jnp.asarray(sf_idx), scales,
                               cfo, dft)

    def run(samples, sf_idx):
        x = np.asarray(samples)
        if np.iscomplexobj(x):
            x = cplx.to_ri(x)
        return run_ri(jnp.asarray(x), jnp.asarray(np.asarray(sf_idx)))

    run.jitted_ri = run_ri
    run.jitted_i16 = run_i16
    run.jitted_i8 = run_i8
    run.jitted_i8c64 = run_i8c64
    return run
