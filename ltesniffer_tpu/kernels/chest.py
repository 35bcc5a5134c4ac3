"""CRS-based channel estimation + control-channel equalization (batched JAX).

Replaces srsRAN `chest_dl` (LS at CRS + filtering + interpolation, noise/SNR
estimates) as configured by the reference (`src/src/SubframeWorker.cc:376-399`:
Gaussian filter, interpolation, SNR/CFO estimates).

TPU-first formulation: all interpolation is expressed as two constant-matrix
contractions (freq: (n_sc x 2*n_prb) per port, time: (14 x 4)), so the whole
estimator is a pair of small matmuls per batch — no sequential filtering.
CRS values per (sf_idx, port, symbol) are precomputed host-side into a
(10, P, 4, 2*n_prb) constant and gathered by the traced sf_idx.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import sequences
from ltesniffer_tpu.phy.params import CellConfig

CRS_SYMS = (0, 4, 7, 11)   # ports 0/1, normal CP


@functools.lru_cache(maxsize=16)
def crs_constants(cell: CellConfig):
    """Static CRS tables.

    Returns (k_pos, values):
      k_pos:  (P, 4) lists -> (P, 2*n_prb) int subcarrier positions per symbol
              (same for all 4 CRS symbols of ports 0/1 given vshift)
      values: (10, P, 4, 2*n_prb) complex64 CRS symbols per subframe index.
    """
    P = min(cell.nof_ports, 2)
    n2 = 2 * cell.n_prb
    k_pos = np.zeros((P, 4, n2), dtype=np.int64)
    values = np.zeros((10, P, 4, n2), dtype=np.complex64)
    for port in range(P):
        for si, l_sf in enumerate(CRS_SYMS):
            k = sequences.crs_re_positions(cell.n_id_cell, port, l_sf, cell.n_prb)
            k_pos[port, si] = k
            for sf in range(10):
                slot = 2 * sf + l_sf // 7
                values[sf, port, si] = sequences.crs_sequence(
                    cell.n_id_cell, slot, l_sf % 7, cell.n_prb)
    return k_pos, values


@functools.lru_cache(maxsize=16)
def interp_matrices(cell: CellConfig):
    """(W_freq per port: (P, n_sc, 2*n_prb), W_time: (14, 4)) linear interp."""
    P = min(cell.nof_ports, 2)
    n_sc, n2 = cell.n_sc, 2 * cell.n_prb
    k_pos, _ = crs_constants(cell)
    wf = np.zeros((P, n_sc, n2), dtype=np.float32)
    for p in range(P):
        pos = k_pos[p, 0].astype(np.float64)   # same spacing each CRS symbol
        for k in range(n_sc):
            j = np.searchsorted(pos, k)
            if j == 0:
                i0, i1 = 0, 1
            elif j >= n2:
                i0, i1 = n2 - 2, n2 - 1
            else:
                i0, i1 = j - 1, j
            denom = pos[i1] - pos[i0]
            t = (k - pos[i0]) / denom
            wf[p, k, i0] = 1.0 - t
            wf[p, k, i1] = t
    wt = np.zeros((14, 4), dtype=np.float32)
    ts = np.asarray(CRS_SYMS, dtype=np.float64)
    for l in range(14):
        j = np.searchsorted(ts, l)
        if j == 0:
            i0, i1 = 0, 1
        elif j >= 4:
            i0, i1 = 2, 3
        else:
            i0, i1 = j - 1, j
        t = (l - ts[i0]) / (ts[i1] - ts[i0])
        wt[l, i0] = 1.0 - t
        wt[l, i1] = t
    return wf, wt


# small frequency-domain smoothing of raw LS estimates (reference uses a
# Gaussian filter; 3-tap here, applied along the pilot axis)
_SMOOTH = np.array([0.25, 0.5, 0.25], dtype=np.float32)


def _smooth_freq(h):
    """3-tap smoothing along last axis with edge replication."""
    pad = jnp.concatenate([h[..., :1], h, h[..., -1:]], axis=-1)
    return (_SMOOTH[0] * pad[..., :-2] + _SMOOTH[1] * pad[..., 1:-1]
            + _SMOOTH[2] * pad[..., 2:])


def estimate(grid, sf_idx, cell: CellConfig):
    """LS + interpolated channel estimate.

    Args:
      grid:   (B, RX, 14, n_sc) complex64 resource grids.
      sf_idx: (B,) int32 subframe indices 0..9 (selects CRS sequences).
    Returns dict:
      h:         (B, RX, P, 14, n_sc) complex64
      noise_var: (B,) float32
      rsrp:      (B,) float32 (mean |h|^2 at pilots)
      snr_db:    (B,) float32
    """
    k_pos, values = crs_constants(cell)
    wf, wt = interp_matrices(cell)
    k_pos_j = jnp.asarray(k_pos)           # (P, 4, n2)
    # complex64 gather by a traced index is unimplemented on the axon TPU
    # backend: gather real/imag planes as float32 and recombine.
    vals_ri = jnp.asarray(
        np.stack([values.real, values.imag], axis=-1).astype(np.float32))
    vri = vals_ri[sf_idx]                  # (B, P, 4, n2, 2)
    vals = jax.lax.complex(vri[..., 0], vri[..., 1])
    wf_j = jnp.asarray(wf)
    wt_j = jnp.asarray(wt)

    # gather pilot REs: grid (B, RX, 14, n_sc) -> (B, RX, P, 4, n2)
    sym_idx = jnp.asarray(np.array(CRS_SYMS))           # (4,)
    g_sym = grid[:, :, sym_idx, :]                      # (B, RX, 4, n_sc)
    pil = jnp.take_along_axis(
        g_sym[:, :, None, :, :],
        k_pos_j[None, None, :, :, :], axis=-1)          # (B, RX, P, 4, n2)
    h_ls = pil * jnp.conj(vals[:, None])                # LS estimate

    h_sm = _smooth_freq(h_ls)
    # noise: residual power of LS vs smoothed, scaled (3-tap leaves ~3/8 noise)
    resid = h_ls - h_sm
    noise_var = jnp.mean(jnp.abs(resid) ** 2, axis=(1, 2, 3, 4)) / 0.375
    rsrp = jnp.mean(jnp.abs(h_sm) ** 2, axis=(1, 2, 3, 4))
    snr_db = 10.0 * jnp.log10(jnp.maximum(rsrp, 1e-12)
                              / jnp.maximum(noise_var, 1e-12))

    # interpolate: freq then time
    h_f = jnp.einsum("brpts,pks->brptk", h_sm, wf_j)    # (B,RX,P,4,n_sc)
    h = jnp.einsum("brptk,lt->brplk", h_f, wt_j)        # (B,RX,P,14,n_sc)
    return {"h": h, "noise_var": noise_var, "rsrp": rsrp, "snr_db": snr_db}


def equalize_sfbc(y, h, noise_var):
    """Alamouti SFBC combining over adjacent RE pairs (36.211 6.3.4.3).

    y: (..., 2M) received symbols (RX antenna axis at -2: (B, RX, 2M))
    h: (B, RX, P=2, 2M) channel at those REs.
    Returns x_hat (B, 2M) normalized symbol estimates.
    """
    y0, y1 = y[..., 0::2], y[..., 1::2]
    h0 = h[:, :, 0, :]
    h1 = h[:, :, 1, :]
    h00, h01 = h0[..., 0::2], h0[..., 1::2]
    h10, h11 = h1[..., 0::2], h1[..., 1::2]
    # combine across rx antennas
    x0 = jnp.sum(jnp.conj(h00) * y0 + h11 * jnp.conj(y1), axis=1)
    x1 = jnp.sum(jnp.conj(h01) * y1 - h10 * jnp.conj(y0), axis=1)
    norm = jnp.sum(jnp.abs(h00) ** 2 + jnp.abs(h10) ** 2, axis=1) + noise_var[:, None]
    x0 = x0 / norm
    x1 = x1 / norm
    out = jnp.stack([x0, x1], axis=-1).reshape(y.shape[0], -1)
    # SFBC tx power split sqrt(2) restore
    return out * np.float32(np.sqrt(2.0))


def equalize_port0(y, h, noise_var):
    """Single-port MMSE: y (B, RX, M), h (B, RX, M) -> (B, M)."""
    num = jnp.sum(jnp.conj(h) * y, axis=1)
    den = jnp.sum(jnp.abs(h) ** 2, axis=1) + noise_var[:, None]
    return num / den
