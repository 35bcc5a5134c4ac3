"""SC-FDMA (de)modulation + DFT transform (de)precoding (36.211 5.6).

Float-pair device path (no complex64 on the axon TPU): the half-subcarrier
shift is a cos/sin pair multiply, the symbol DFT and the per-grant transform
deprecoding are MXU matmuls against precomputed matrices.

Replaces `srsran_enb_ul_fft` + the PUSCH transform precoding inside
`srsran_pusch_decode` (`src/src/UL_Sniffer_PUSCH.cc:392,262`).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import params
from ltesniffer_tpu.phy.params import CellConfig
from . import cplx, ofdm

DMRS_SYM = (3, 10)     # pilot symbol per slot (normal CP), subframe indexing
DATA_SYMS = (0, 1, 2, 4, 5, 6, 7, 8, 9, 11, 12, 13)


@functools.lru_cache(maxsize=8)
def _half_shift_ri(n_fft: int, sf_len: int):
    n = np.arange(sf_len)
    ang = -np.pi * n / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=8)
def ul_subcarrier_bins(n_fft: int, n_sc: int) -> np.ndarray:
    """UL mapping: n_sc contiguous subcarriers centered (no DC gap)."""
    f = np.arange(n_sc) - n_sc // 2
    return np.where(f < 0, f + n_fft, f).astype(np.int64)


@functools.lru_cache(maxsize=8)
def _ul_dft_mats(n_fft: int, n_sc: int):
    bins = ul_subcarrier_bins(n_fft, n_sc)
    return cplx.dft_matrices(n_fft, bins, sign=-1.0,
                             scale=1.0 / np.sqrt(n_fft))


def demodulate_ul_ri(samples_ri, cell: CellConfig, mats=None):
    """(..., sf_len, 2) -> (..., 14, n_sc, 2), half-subcarrier shift removed.

    mats: optional (w_re, w_im) DFT matrices as ARGUMENTS (see
    `ofdm.demodulate_ri` — keeps per-shape program variants small)."""
    cr, si = _half_shift_ri(cell.n_fft, cell.sf_len)
    shift = jnp.stack([jnp.asarray(cr), jnp.asarray(si)], axis=-1)
    x = cplx.cmul(samples_ri, shift)
    starts = np.asarray(ofdm.symbol_starts(cell.n_fft))
    idx = starts[:, None] + np.arange(cell.n_fft)[None, :]
    sym = x[..., idx, :]
    if mats is None:
        mats = _ul_dft_mats(cell.n_fft, cell.n_sc)
    return cplx.cmatmul(sym, mats[0], mats[1])


def ul_dft_mats_device(cell: CellConfig):
    """Device-resident (w_re, w_im) for `demodulate_ul_ri`."""
    import jax
    w_re, w_im = _ul_dft_mats(cell.n_fft, cell.n_sc)
    return jax.device_put(w_re), jax.device_put(w_im)


def modulate_ul_np(grid: np.ndarray, cell: CellConfig) -> np.ndarray:
    """(14, n_sc) -> (sf_len,) time samples (test TX side, NumPy complex)."""
    n_fft, n_sc = cell.n_fft, cell.n_sc
    bins = ul_subcarrier_bins(n_fft, n_sc)
    out = np.zeros(cell.sf_len, dtype=np.complex64)
    starts = ofdm.symbol_starts(n_fft)
    cps = params.cp_lengths(n_fft) * 2
    for i in range(params.N_SYM_SF):
        spec = np.zeros(n_fft, dtype=np.complex64)
        spec[bins] = grid[i]
        td = np.fft.ifft(spec) * np.sqrt(n_fft)
        s = starts[i]
        out[s:s + n_fft] = td
        out[s - cps[i]:s] = td[-cps[i]:]
    # TX applies +7.5 kHz: multiply by conj of the RX shift exp(-j*pi*n/N)
    cr, si = _half_shift_ri(n_fft, cell.sf_len)
    return out * (cr - 1j * si)


def dft_precode_np(x: np.ndarray, m_sc: int) -> np.ndarray:
    """(n_sym * m_sc,) modulation symbols -> DFT-spread symbols (TX)."""
    blocks = x.reshape(-1, m_sc)
    return (np.fft.fft(blocks, axis=-1) / np.sqrt(m_sc)).reshape(-1)


@functools.lru_cache(maxsize=64)
def _idft_mats(m_sc: int):
    return cplx.dft_matrices(m_sc, np.arange(m_sc), sign=+1.0,
                             scale=1.0 / np.sqrt(m_sc))


def dft_deprecode_ri(x, m_sc: int):
    """(..., n_sym, m_sc, 2) equalized symbols -> despread (IDFT matmul)."""
    w_re, w_im = _idft_mats(m_sc)
    return cplx.cmatmul(x, w_re, w_im)
