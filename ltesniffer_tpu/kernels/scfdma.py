"""SC-FDMA (de)modulation + DFT transform (de)precoding (36.211 5.6).

Replaces `srsran_enb_ul_fft` + the PUSCH transform precoding inside
`srsran_pusch_decode` (`src/src/UL_Sniffer_PUSCH.cc:392,262`).

UL specifics vs the DL OFDM kernel: a +7.5 kHz half-subcarrier shift, no DC
hole (n_sc contiguous subcarriers), and per-symbol M-point DFT spreading of
the data symbols.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import params
from ltesniffer_tpu.phy.params import CellConfig
from . import ofdm

DMRS_SYM = (3, 10)     # pilot symbol per slot (normal CP), subframe indexing
DATA_SYMS = (0, 1, 2, 4, 5, 6, 7, 8, 9, 11, 12, 13)


@functools.lru_cache(maxsize=8)
def _half_shift(n_fft: int, sf_len: int) -> np.ndarray:
    n = np.arange(sf_len)
    return np.exp(-1j * np.pi * n / n_fft).astype(np.complex64)


@functools.lru_cache(maxsize=8)
def ul_subcarrier_bins(n_fft: int, n_sc: int) -> np.ndarray:
    """UL mapping: n_sc contiguous subcarriers centered (no DC gap)."""
    f = np.arange(n_sc) - n_sc // 2
    return np.where(f < 0, f + n_fft, f).astype(np.int64)


def demodulate_ul(samples, cell: CellConfig):
    """(..., sf_len) -> (..., 14, n_sc) with the half-subcarrier shift removed."""
    shift = jnp.asarray(_half_shift(cell.n_fft, cell.sf_len))
    x = samples * shift
    starts = np.asarray(ofdm.symbol_starts(cell.n_fft))
    idx = starts[:, None] + np.arange(cell.n_fft)[None, :]
    sym = x[..., idx]
    spec = jnp.fft.fft(sym, axis=-1)
    bins = jnp.asarray(ul_subcarrier_bins(cell.n_fft, cell.n_sc))
    return jnp.take(spec, bins, axis=-1) / np.float32(np.sqrt(cell.n_fft))


def modulate_ul_np(grid: np.ndarray, cell: CellConfig) -> np.ndarray:
    """(14, n_sc) -> (sf_len,) time samples (test TX side)."""
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
    # apply +7.5 kHz half-subcarrier shift
    return out * np.conj(_half_shift(n_fft, cell.sf_len))


def dft_precode_np(x: np.ndarray, m_sc: int) -> np.ndarray:
    """(n_sym * m_sc,) modulation symbols -> DFT-spread symbols (TX)."""
    blocks = x.reshape(-1, m_sc)
    return (np.fft.fft(blocks, axis=-1) / np.sqrt(m_sc)).reshape(-1)


def dft_deprecode(x, m_sc: int):
    """(..., n_sym, m_sc) equalized symbols -> despread (IDFT per symbol)."""
    return jnp.fft.ifft(x, axis=-1) * np.float32(np.sqrt(m_sc))
