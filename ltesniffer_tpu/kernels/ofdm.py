"""OFDM (de)modulation kernels (36.211 6.12) — float-pair, MXU-based.

RX demodulation is expressed as four real matmuls against precomputed
(n_fft x n_sc) DFT matrices instead of a complex FFT: the axon TPU runtime
has no complex support, and for LTE sizes (<=2048-point, only n_sc of n_fft
bins needed) a dense DFT on the MXU is fast (~137 MFLOP per 20 MHz subframe)
and fuses cleanly with the rest of the pipeline.

TX path (test encoder / waveform synthesis) stays NumPy complex.
Replaces srsRAN's per-subframe `srsran_ofdm` FFT
(`src/src/DCISearch.cc:562`, SURVEY.md §2.1).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import params
from ltesniffer_tpu.phy.params import CellConfig
from . import cplx


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


@functools.lru_cache(maxsize=8)
def _dft_mats(n_fft: int, n_sc: int):
    bins = subcarrier_bins(n_fft, n_sc)
    return cplx.dft_matrices(n_fft, bins, sign=-1.0,
                             scale=1.0 / np.sqrt(n_fft))


def demodulate_ri(samples_ri, cell: CellConfig, mats=None):
    """Float-pair demod: (..., sf_len, 2) -> (..., 14, n_sc, 2).

    mats: optional (w_re, w_im) DFT matrices passed as ARGUMENTS (e.g.
    device-resident from `dft_mats_device`).  The ~20 MB matrices baked
    as closure constants made every (batch-shape) variant of a frontend
    program a ~7 MB artifact with minutes-long remote compiles; as args
    they are uploaded once and shared by all variants."""
    n_fft, n_sc = cell.n_fft, cell.n_sc
    starts = np.asarray(symbol_starts(n_fft))
    idx = starts[:, None] + np.arange(n_fft)[None, :]          # (14, n_fft)
    sym = samples_ri[..., idx, :]                              # (...,14,n_fft,2)
    if mats is None:
        mats = _dft_mats(n_fft, n_sc)
    return cplx.cmatmul(sym, mats[0], mats[1])                 # (...,14,n_sc,2)


def dft_mats_device(cell: CellConfig):
    """Device-resident (w_re, w_im) for `demodulate_ri`'s mats argument."""
    import jax
    w_re, w_im = _dft_mats(cell.n_fft, cell.n_sc)
    return jax.device_put(w_re), jax.device_put(w_im)


def demodulate(samples, cell: CellConfig):
    """Host-convenience wrapper: complex64 numpy/jnp -> (..., 14, n_sc, 2).

    NOTE: returns the float-pair representation (no complex on device).
    """
    x = np.asarray(samples)
    if np.iscomplexobj(x):
        x = cplx.to_ri(x)
    return demodulate_ri(jnp.asarray(x), cell)


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
