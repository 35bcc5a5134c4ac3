"""PUSCH decode path: SC-FDMA demod -> DMRS chest -> MMSE equalize -> DFT
despread -> demap -> descramble -> de-interleave -> turbo decode.

Capability parity with `PUSCH_Decoder::decode/decode_run`
(`src/src/UL_Sniffer_PUSCH.cc:250-583`): per-grant UL chest with TA
estimation, SNR gating for statistics, valid-PRB filtering; the 16/64/256QAM
table cascade lives in the caller (core UL mode + MCSTracking).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import pdsch as pdsch_mod, ra, turbo as turbo_mod
from ltesniffer_tpu.phy import ul_dmrs
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.kernels import cplx, demapper, scfdma
from .pdsch_rx import _decode_tb_from_llrs, PdschResult


@functools.lru_cache(maxsize=16)
def make_ul_frontend(cell: CellConfig):
    """Batched UL demod: samples -> (B, RX, 14, n_sc, 2) float-pair grid."""
    @jax.jit
    def run_ri(samples_ri):
        return scfdma.demodulate_ul_ri(samples_ri, cell)

    def run(samples):
        x = np.asarray(samples)
        if np.iscomplexobj(x):
            x = cplx.to_ri(x)
        return run_ri(jnp.asarray(x))

    run.jitted_ri = run_ri
    return run


@dataclasses.dataclass
class PuschResult:
    rnti: int
    tbs: int
    crc_ok: bool
    tb_bits: Optional[np.ndarray]
    snr_db: float
    ta_us: float
    n_prb: int


@functools.lru_cache(maxsize=64)
def _eq_fn(cell: CellConfig, n_prb: int, qm: int):
    """Jitted per-grant UL equalize+despread+demap.

    (grid (RX,14,n_sc), dmrs (2, m_sc), k0, c_init) ->
      (llr (12*m_sc*qm,), snr_db (), ta_us ())
    """
    m_sc = 12 * n_prb
    data_syms = np.asarray(scfdma.DATA_SYMS)
    dmrs_syms = np.asarray(scfdma.DMRS_SYM)
    # time interpolation weights from the 2 pilot symbols to the 12 data syms
    wt = np.zeros((12, 2), dtype=np.float32)
    t0, t1 = scfdma.DMRS_SYM
    for i, l in enumerate(scfdma.DATA_SYMS):
        t = np.clip((l - t0) / (t1 - t0), 0.0, 1.0)
        wt[i] = (1.0 - t, t)
    subcarrier_spacing = 15e3

    @jax.jit
    def run(grid, dmrs_ri, k0, c_init):
        block = jax.lax.dynamic_slice_in_dim(grid, k0, m_sc, axis=-2)
        pil = block[:, dmrs_syms, :, :]                 # (RX, 2, m_sc, 2)
        h_ls = cplx.cmul_conj(pil, dmrs_ri[None])       # (RX, 2, m_sc, 2)
        # 3-tap freq smoothing
        pad = jnp.concatenate([h_ls[..., :1, :], h_ls, h_ls[..., -1:, :]],
                              axis=-2)
        h_sm = (0.25 * pad[..., :-2, :] + 0.5 * pad[..., 1:-1, :]
                + 0.25 * pad[..., 2:, :])
        resid = h_ls - h_sm
        noise = jnp.mean(cplx.cabs2(resid)) / 0.375
        sig = jnp.mean(cplx.cabs2(h_sm))
        snr_db = 10.0 * jnp.log10(jnp.maximum(sig, 1e-12)
                                  / jnp.maximum(noise, 1e-12))
        # TA: mean phase slope across subcarriers
        prod = cplx.cmul_conj(h_sm[..., 1:, :], h_sm[..., :-1, :])
        psum = jnp.sum(prod.reshape(-1, 2), axis=0)
        slope = jnp.arctan2(psum[1], psum[0])
        ta_us = -slope / (2.0 * np.pi * subcarrier_spacing) * 1e6
        # interpolate over symbols
        h_data = jnp.einsum("rpsc,lp->rlsc", h_sm, jnp.asarray(wt))
        y = block[:, data_syms, :, :]                    # (RX, 12, m_sc, 2)
        num = jnp.sum(cplx.cmul_conj(y, h_data), axis=0)
        den = jnp.sum(cplx.cabs2(h_data), axis=0) + noise
        x_eq = cplx.cdiv_real(num, den)                  # (12, m_sc, 2)
        d = scfdma.dft_deprecode_ri(x_eq, m_sc)          # (12, m_sc, 2)
        llr = demapper.llr(d.reshape(-1, 2), qm)         # (12*m_sc*qm,)
        # descramble FIRST (TX order: interleave -> scramble -> modulate)
        from ltesniffer_tpu.phy import sequences as seq_mod
        scr = seq_mod.gold_sequence_jax(c_init, 12 * m_sc * qm)
        llr = llr * (1.0 - 2.0 * scr.astype(jnp.float32))
        # channel de-interleaver: out[r*12+c] groups <- in[c*R'+r]
        grp = llr.reshape(12, m_sc, qm)                  # col-major layout
        de = jnp.transpose(grp, (1, 0, 2)).reshape(-1)
        return de, snr_db, ta_us

    return run


def decode_grant_ul(ul_grid_b, cell: CellConfig, sf_idx: int, rnti: int,
                    prb_start: int, n_prb: int, qm: int, tbs: int,
                    rv: int = 0, cyclic_shift_cfg: int = 0,
                    dmrs_field: int = 0,
                    soft_buffers: Optional[Dict] = None,
                    harq_key: Optional[Tuple] = None,
                    n_ri_syms: int = 0, n_ack_syms: int = 0,
                    n_iter: int = 8) -> PuschResult:
    """Decode one PUSCH grant from an UL subframe grid (RX, 14, n_sc).

    n_ri_syms/n_ack_syms: UCI symbol groups (from the UE config DB + the
    DL ACK matching, reference `UL_Sniffer_PUSCH.cc:429-450`): RI cells are
    removed from the data mapping, ACK cells are zero-LLR punctures."""
    if tbs <= 0 or not ra.valid_dft_prb(n_prb):
        return PuschResult(rnti, tbs, False, None, -99.0, 0.0, n_prb)
    m_sc = 12 * n_prb
    dmrs = np.stack([
        ul_dmrs.pusch_dmrs(n_prb, 2 * sf_idx + s, cell.n_id_cell,
                           cyclic_shift_cfg, dmrs_field)
        for s in range(2)])
    c_init = pdsch_mod.scrambling_cinit(rnti, 0, sf_idx, cell.n_id_cell)
    fn = _eq_fn(cell, n_prb, qm)
    llr, snr_db, ta_us = fn(jnp.asarray(ul_grid_b),
                            jnp.asarray(cplx.to_ri(dmrs)),
                            np.int32(12 * prb_start),
                            jnp.asarray(np.uint32(c_init)))
    llr = np.asarray(llr)
    if n_ri_syms or n_ack_syms:
        from ltesniffer_tpu.phy import uci
        cells_llr = llr.reshape(m_sc * 12, qm).copy()
        _, ack_cells = uci.uci_positions(m_sc, qm, n_ri_syms, n_ack_syms)
        cells_llr[ack_cells] = 0.0           # punctured by HARQ-ACK
        data_cells = uci.data_group_map(m_sc, n_ri_syms)
        llr = cells_llr[data_cells].reshape(-1)
        n_re_data = 12 * m_sc - n_ri_syms
    else:
        n_re_data = 12 * m_sc
    res = _decode_tb_from_llrs(llr, rnti, tbs, qm, rv, n_re_data,
                               soft_buffers, harq_key, n_iter)
    return PuschResult(rnti, tbs, res.crc_ok, res.tb_bits,
                       float(snr_db), float(ta_us), n_prb)
