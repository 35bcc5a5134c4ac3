"""OFDM (de)modulation kernels (36.211 6.12).

RX path is batched JAX (XLA FFT on TPU); TX path is NumPy (test encoder /
waveform synthesis only).  Replaces srsRAN's per-subframe `srsran_ofdm` FFT
used via `srsran_ue_dl_decode_fft_estimate` (`src/src/DCISearch.cc:562`).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import params
from ltesniffer_tpu.phy.params import CellConfig


@functools.lru_cache(maxsize=8)
def symbol_starts(n_fft: int):
    """Start offset of each symbol's data part (after CP) within a subframe."""
    cps = params.cp_lengths(n_fft)
    starts = []
    off = 0
    for _slot in range(2):
        for cp in cps:
            off += cp
            starts.append(off)
            off += n_fft
    return tuple(starts)


@functools.lru_cache(maxsize=8)
def subcarrier_bins(n_fft: int, n_sc: int) -> np.ndarray:
    """FFT bin index for each of the n_sc used subcarriers (DC excluded)."""
    k = np.arange(n_sc)
    f = np.where(k < n_sc // 2, k - n_sc // 2, k - n_sc // 2 + 1)
    return np.where(f < 0, f + n_fft, f).astype(np.int64)


def demodulate(samples, cell: CellConfig):
    """Time samples -> resource grid.

    samples: (..., sf_len) complex64  ->  grid (..., 14, n_sc) complex64.
    """
    n_fft, n_sc = cell.n_fft, cell.n_sc
    starts = np.asarray(symbol_starts(n_fft))
    idx = starts[:, None] + np.arange(n_fft)[None, :]          # (14, n_fft)
    sym = samples[..., idx]                                    # (..., 14, n_fft)
    spec = jnp.fft.fft(sym, axis=-1)
    bins = jnp.asarray(subcarrier_bins(n_fft, n_sc))
    return jnp.take(spec, bins, axis=-1) / np.float32(np.sqrt(n_fft))


def modulate_np(grid: np.ndarray, cell: CellConfig) -> np.ndarray:
    """Resource grid (14, n_sc) -> time samples (sf_len,).  Test-side TX."""
    n_fft, n_sc = cell.n_fft, cell.n_sc
    bins = subcarrier_bins(n_fft, n_sc)
    out = np.zeros(cell.sf_len, dtype=np.complex64)
    starts = symbol_starts(n_fft)
    cps = params.cp_lengths(n_fft) * 2
    for i in range(params.N_SYM_SF):
        spec = np.zeros(n_fft, dtype=np.complex64)
        spec[bins] = grid[i]
        td = np.fft.ifft(spec) * np.sqrt(n_fft)
        s = starts[i]
        cp = cps[i]
        out[s:s + n_fft] = td
        out[s - cp:s] = td[-cp:]
    return out
