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
from . import prof
from .pdsch_rx import _decode_tb_from_llrs, LazyRow, PdschResult


@functools.lru_cache(maxsize=16)
def make_ul_frontend(cell: CellConfig):
    """Batched UL demod: samples -> (B, RX, 14, n_sc, 2) float-pair grid.

    The DFT matrices ride as device-resident ARGUMENTS of the inner jits
    (see `ofdm.demodulate_ri`) so per-batch-shape program variants stay
    small and fast to compile."""
    dft = scfdma.ul_dft_mats_device(cell)

    @jax.jit
    def _run_ri_mats(samples_ri, mats):
        return scfdma.demodulate_ul_ri(samples_ri, cell, mats=mats)

    def run_ri(samples_ri):
        return _run_ri_mats(samples_ri, dft)

    @jax.jit
    def _run_i8c64_mats(chunk64, scales, mats):
        p = jax.lax.bitcast_convert_type(chunk64, jnp.int32)
        p = p.reshape(chunk64.shape[0], chunk64.shape[1], -1)
        bytes_ = [((p >> (8 * k)) & 0xFF) for k in range(4)]
        b = jnp.stack(bytes_, axis=-1)
        b = ((b ^ 0x80) - 0x80).astype(jnp.float32)
        x = b.reshape(p.shape[0], p.shape[1], -1, 2) * scales[:, None,
                                                             None, None]
        return scfdma.demodulate_ul_ri(x, cell, mats=mats)

    def run_i8c64(chunk64, scales):
        """Per-batch chunked int64-carried ingest (DL twin:
        `frontend.run_i8c64`)."""
        return _run_i8c64_mats(chunk64, scales, dft)

    def run(samples):
        x = np.asarray(samples)
        if np.iscomplexobj(x):
            x = cplx.to_ri(x)
        return run_ri(jnp.asarray(x))

    run.jitted_ri = run_ri
    run.jitted_i8c64 = run_i8c64
    return run


@functools.lru_cache(maxsize=16)
def make_power_map(cell: CellConfig):
    """(B, RX, 14, n_sc, 2) grid -> (B, n_prb) average PRB power in dB —
    the reference's per-PRB SubframePower map (`SubframePower.cc:18-74`,
    computed on `enb_ul.sf_symbols` each UL subframe, used for UL grant
    plausibility checks and the PowerDrawASCII rendering)."""
    @jax.jit
    def run(grids):
        p = jnp.sum(grids.astype(jnp.float32) ** 2, axis=-1)  # |x|^2
        p = jnp.mean(p, axis=(1, 2))               # avg over RX, symbols
        p = p.reshape(p.shape[0], cell.n_prb, 12).mean(axis=-1)
        return 10.0 * jnp.log10(jnp.maximum(p, 1e-12))

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
                    n_cqi_syms: int = 0,
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
    if n_ri_syms or n_ack_syms or n_cqi_syms:
        from ltesniffer_tpu.phy import uci
        cells_llr = llr.reshape(m_sc * 12, qm).copy()
        _, ack_cells = uci.uci_positions(m_sc, qm, n_ri_syms, n_ack_syms)
        cells_llr[ack_cells] = 0.0           # punctured by HARQ-ACK
        # CQI occupies the head of the multiplexed stream (36.212 5.2.2.8)
        data_cells = uci.data_group_map(m_sc, n_ri_syms)[n_cqi_syms:]
        llr = cells_llr[data_cells].reshape(-1)
        n_re_data = 12 * m_sc - n_ri_syms - n_cqi_syms
    else:
        n_re_data = 12 * m_sc
    res = _decode_tb_from_llrs(llr, rnti, tbs, qm, rv, n_re_data,
                               soft_buffers, harq_key, n_iter)
    return PuschResult(rnti, tbs, res.crc_ok, res.tb_bits,
                       float(snr_db), float(ta_us), n_prb)


# ---------------------------------------------------------------------------
# Batched multi-grant UL decoding (performance path)
#
# The reference decodes every grant of every UL subframe sequentially inside
# the worker (`UL_Sniffer_PUSCH.cc:389-583`); here all grants collected over
# a subframe batch — including the 16/64/256QAM trial variants for
# unknown-table RNTIs — dispatch as grouped device calls (one eq/demap call
# per (n_prb, qm) bucket, one derm+turbo call per code-block size), with the
# single fused result D2H started asynchronously, mirroring the DL path's
# dispatch/finish split (`pdsch_rx.dispatch_grants_batch`).
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class UlGrantJob:
    b: int                      # subframe index into the UL grid batch
    sf_idx: int
    rnti: int
    prb_start: int
    n_prb: int
    qm: int
    tbs: int
    rv: int = 0
    cyclic_shift_cfg: int = 0
    dmrs_field: int = 0
    n_ri_syms: int = 0
    n_ack_syms: int = 0
    n_cqi_syms: int = 0     # aperiodic CQI occupies the data stream's head
    tag: object = None


def _pow2(n: int, lo: int = 1) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


@functools.lru_cache(maxsize=64)
def _eq_batch_ul_fn(cell: CellConfig, n_prb: int, qm: int, n_rows: int):
    """Jitted batched UL equalize+despread+demap for one (n_prb, qm) group.

    (grids (B,RX,14,n_sc,2), bidx (n,), k0 (n,), dmrs (n,2,m_sc,2),
     c_init (n,)) -> (llr (n, 12*m_sc*qm), snr_db (n,), ta_us (n,))
    """
    m_sc = 12 * n_prb
    data_syms = np.asarray(scfdma.DATA_SYMS)
    dmrs_syms = np.asarray(scfdma.DMRS_SYM)
    wt = np.zeros((12, 2), dtype=np.float32)
    t0, t1 = scfdma.DMRS_SYM
    for i, l in enumerate(scfdma.DATA_SYMS):
        t = np.clip((l - t0) / (t1 - t0), 0.0, 1.0)
        wt[i] = (1.0 - t, t)
    subcarrier_spacing = 15e3

    def one(grid, k0, dmrs_ri, c_init):
        block = jax.lax.dynamic_slice_in_dim(grid, k0, m_sc, axis=-2)
        pil = block[:, dmrs_syms, :, :]
        h_ls = cplx.cmul_conj(pil, dmrs_ri[None])
        pad = jnp.concatenate([h_ls[..., :1, :], h_ls, h_ls[..., -1:, :]],
                              axis=-2)
        h_sm = (0.25 * pad[..., :-2, :] + 0.5 * pad[..., 1:-1, :]
                + 0.25 * pad[..., 2:, :])
        resid = h_ls - h_sm
        noise = jnp.mean(cplx.cabs2(resid)) / 0.375
        sig = jnp.mean(cplx.cabs2(h_sm))
        snr_db = 10.0 * jnp.log10(jnp.maximum(sig, 1e-12)
                                  / jnp.maximum(noise, 1e-12))
        prod = cplx.cmul_conj(h_sm[..., 1:, :], h_sm[..., :-1, :])
        psum = jnp.sum(prod.reshape(-1, 2), axis=0)
        slope = jnp.arctan2(psum[1], psum[0])
        ta_us = -slope / (2.0 * np.pi * subcarrier_spacing) * 1e6
        h_data = jnp.einsum("rpsc,lp->rlsc", h_sm, jnp.asarray(wt))
        y = block[:, data_syms, :, :]
        num = jnp.sum(cplx.cmul_conj(y, h_data), axis=0)
        den = jnp.sum(cplx.cabs2(h_data), axis=0) + noise
        x_eq = cplx.cdiv_real(num, den)
        d = scfdma.dft_deprecode_ri(x_eq, m_sc)
        llr = demapper.llr(d.reshape(-1, 2), qm)
        from ltesniffer_tpu.phy import sequences as seq_mod
        scr = seq_mod.gold_sequence_jax(c_init, 12 * m_sc * qm)
        llr = llr * (1.0 - 2.0 * scr.astype(jnp.float32))
        grp = llr.reshape(12, m_sc, qm)
        de = jnp.transpose(grp, (1, 0, 2)).reshape(-1)
        return de, snr_db, ta_us

    @jax.jit
    def run(grids, bidx, k0, dmrs_ri, c_init):
        return jax.vmap(lambda b, k, dm, ci: one(grids[b], k, dm, ci))(
            bidx, k0, dmrs_ri, c_init)

    return run


@dataclasses.dataclass
class PendingUlBatch:
    jobs: list
    results: list                      # pre-filled for degenerate jobs
    seg_of: Dict[int, object]
    group_rows: list                   # [(K, Wk, n_b, [(ji, ci)...])]
    fused_dev: object                  # flat u32 (per-group (n,1+Wk) blocks)
    scalars_dev: object                # (n_jobs, 2) f32 [snr_db, ta_us]
    scalar_row: Dict[int, int]
    # (ji, ci) -> LazyRow into the combined-LLR outputs: CRC failures
    # re-decode from these at a higher turbo iteration count in finish
    # (the DL path's iteration-escalation scheme)
    d_of: Dict[Tuple[int, int], object] = dataclasses.field(
        default_factory=dict)
    reader: object = None              # background D2H thread (see DL twin)
    host_fused: object = None
    host_scal: object = None


def dispatch_grants_ul_batch(ul_grids, cell: CellConfig,
                             jobs, n_iter: int = 8) -> PendingUlBatch:
    """Launch the grouped device decode of many UL grants; one async D2H."""
    from ltesniffer_tpu.phy import crc as _  # noqa: F401 (kept warm)
    from ltesniffer_tpu.phy import uci as uci_mod
    from .pdsch_rx import _derm_laps, _derm_turbo_static_fn, _stack_rows
    results = [None] * len(jobs)
    groups: Dict[Tuple[int, int], list] = {}
    for ji, j in enumerate(jobs):
        if j.tbs <= 0 or not ra.valid_dft_prb(j.n_prb):
            results[ji] = PuschResult(j.rnti, j.tbs, False, None, -99.0,
                                      0.0, j.n_prb)
            continue
        groups.setdefault((j.n_prb, j.qm), []).append(ji)
    eq_outs = []
    scalar_parts = []
    scalar_row: Dict[int, int] = {}
    row_of: Dict[int, int] = {}
    row_acc = 0
    n_scal = 0
    for (n_prb, qm), jis in sorted(groups.items()):
        m_sc = 12 * n_prb
        n_pad = _pow2(len(jis), 64)
        bidx = np.zeros(n_pad, np.int32)
        k0 = np.zeros(n_pad, np.int32)
        cinit = np.zeros(n_pad, np.uint32)
        dmrs = np.zeros((n_pad, 2, m_sc), np.complex64)
        for row, ji in enumerate(jis):
            j = jobs[ji]
            bidx[row] = j.b
            k0[row] = 12 * j.prb_start
            cinit[row] = pdsch_mod.scrambling_cinit(j.rnti, 0, j.sf_idx,
                                                    cell.n_id_cell)
            dmrs[row] = np.stack([
                ul_dmrs.pusch_dmrs(n_prb, 2 * j.sf_idx + s, cell.n_id_cell,
                                   j.cyclic_shift_cfg, j.dmrs_field)
                for s in range(2)])
            row_of[ji] = row_acc + row
            scalar_row[ji] = n_scal + row
        fn = _eq_batch_ul_fn(cell, n_prb, qm, n_pad)
        with prof.span("pu_eqdemap_call"):
            llr, snr_db, ta_us = fn(ul_grids, jnp.asarray(bidx),
                                    jnp.asarray(k0),
                                    jnp.asarray(cplx.to_ri(dmrs)),
                                    jnp.asarray(cinit))
        eq_outs.append(llr)      # already (n_pad, 12*m_sc*qm)
        scalar_parts.append(jnp.stack([snr_db, ta_us], axis=-1))
        row_acc += n_pad
        n_scal += n_pad
    if not eq_outs:
        return PendingUlBatch(jobs, results, {}, [], None, None, scalar_row)
    scalars = (jnp.concatenate(scalar_parts) if len(scalar_parts) > 1
               else scalar_parts[0])
    Wm = _pow2(max(int(o.shape[1]) for o in eq_outs), 1 << 12)
    rows_mat = _stack_rows(eq_outs, Wm)

    # --- collect code blocks grouped by K -------------------------------
    seg_of: Dict[int, object] = {}
    by_k: Dict[int, list] = {}
    for (n_prb, qm), jis in sorted(groups.items()):
        m_sc = 12 * n_prb
        for ji in jis:
            j = jobs[ji]
            uci = (j.n_ri_syms, j.n_ack_syms, j.n_cqi_syms)
            n_re_data = (12 * m_sc - j.n_ri_syms - j.n_cqi_syms
                         if any(uci) else 12 * m_sc)
            Gbits = n_re_data * qm
            seg = turbo_mod.segment_sizes(j.tbs)
            seg_of[ji] = seg
            es = pdsch_mod.cb_rate_match_sizes(Gbits, seg.C, qm)
            off = 0
            for ci_, (K, E) in enumerate(zip(seg.K, es)):
                F = seg.F if ci_ == 0 else 0
                if any(uci):
                    # UCI data-cell maps are inherently static (rare UL
                    # shapes); the common contiguous case traces the
                    # offset so one program serves every code block
                    src_key = ("uci", m_sc, qm, j.n_ri_syms, j.n_ack_syms,
                               j.n_cqi_syms, off)
                else:
                    src_key = ("lin",)
                by_k.setdefault(K, []).append(
                    (ji, ci_, F, E, j.rv, src_key, off))
                off += E

    group_rows = []
    fused_parts = []           # flat 1-D full-row blocks per sub-group
    d_of: Dict[Tuple[int, int], LazyRow] = {}
    for K, rows in sorted(by_k.items()):
        Wk = (K + 31) // 32
        # sub-group by (F, laps, rv, src, off): calls batch rows sharing
        # these; the compiled program is keyed without the lin offset
        subs: Dict[tuple, list] = {}
        for r in rows:
            subs.setdefault((r[2], _derm_laps(K, r[2], r[3]), r[4], r[5],
                             r[6]), []).append(r)
        for (F, laps, rv, src_key, off), sub in sorted(subs.items()):
            n_b = _pow2(len(sub), 128)
            rows_idx = np.zeros(n_b, np.int32)
            e_true = np.zeros(n_b, np.int32)
            for r_i, (ji, ci_, _F, E, _rv, _sk, _o) in enumerate(sub):
                rows_idx[r_i] = row_of[ji]
                e_true[r_i] = E
            fn = _derm_turbo_static_fn(Wm, K, F, laps, rv, n_b, False,
                                       n_iter, src_key)
            with prof.span("pu_turbo_call"):
                fused, d = fn(rows_mat, jnp.asarray(rows_idx),
                              jnp.asarray(e_true), np.int32(off))
            for r_i, (ji, ci_, _F, _E, _rv, _sk, _o) in enumerate(sub):
                d_of[(ji, ci_)] = LazyRow(d, r_i)
            fused_parts.append(fused)
            group_rows.append((K, Wk, n_b, [(r[0], r[1]) for r in sub]))
    fused_dev = (jnp.concatenate(fused_parts) if len(fused_parts) > 1
                 else fused_parts[0]) if fused_parts else None
    pb = PendingUlBatch(jobs, results, seg_of, group_rows, fused_dev,
                        scalars, scalar_row, d_of=d_of)
    if fused_dev is not None:
        import threading

        def _read(pb=pb):
            try:
                pb.host_fused = np.asarray(pb.fused_dev)
                pb.host_scal = np.asarray(pb.scalars_dev)
            except Exception:
                pb.host_fused = pb.host_scal = None
        pb.reader = threading.Thread(target=_read, daemon=True)
        pb.reader.start()
    return pb


def finish_grants_ul_batch(pb: PendingUlBatch, n_iter_esc: int = 0):
    """Read the fused result + scalar matrices; assemble PuschResults.

    n_iter_esc > 0: CRC failures whose grant has no passing table variant
    re-decode straight from the stored combined LLRs at this (higher)
    turbo iteration count — the DL path's escalation scheme (srsRAN-style
    per-CB early stop, batched; reference cap `SubframeWorker.cc:365`)."""
    from ltesniffer_tpu.phy import crc as crc_mod
    from .pdsch_rx import _gather_lazy_rows, _turbo_only_fn
    jobs, results = pb.jobs, pb.results
    if pb.fused_dev is None:
        return results
    with prof.span("pu_d2h"):
        if pb.reader is not None:
            pb.reader.join()
        host, scal = pb.host_fused, pb.host_scal
        if host is None:
            host = np.asarray(pb.fused_dev)
            scal = np.asarray(pb.scalars_dev)
    bits_of: Dict[Tuple[int, int], np.ndarray] = {}
    rem_of: Dict[Tuple[int, int], int] = {}
    shifts = np.arange(32, dtype=np.uint32)
    r0 = 0
    for K, Wk, n_b, rows in pb.group_rows:
        n = len(rows)
        w = 1 + Wk
        sub = host[r0:r0 + n_b * w].reshape(n_b, w)[:n]
        r0 += n_b * w
        packed = sub[:, 1:1 + Wk]
        bits = ((packed[:, :, None] >> shifts) & 1).astype(np.uint8)
        bits = bits.reshape(n, Wk * 32)[:, :K]
        for r_i, (ji, ci_) in enumerate(rows):
            bits_of[(ji, ci_)] = bits[r_i]
            rem_of[(ji, ci_)] = int(sub[r_i, 0])

    def assemble(ji):
        j = jobs[ji]
        seg = pb.seg_of[ji]
        cb_ok, parts = [], []
        for ci_, K in enumerate(seg.K):
            blk = bits_of[(ji, ci_)]
            F = seg.F if ci_ == 0 else 0
            if seg.C > 1:
                ok = rem_of[(ji, ci_)] == 0
                data = blk[F:K - turbo_mod.SEG_CRC]
            else:
                ok = True
                data = blk[F:]
            cb_ok.append(bool(ok))
            parts.append(data)
        tb_with_crc = np.concatenate(parts)[:seg.B]
        tb_ok = (all(cb_ok)
                 and crc_mod.crc_bits(tb_with_crc,
                                      crc_mod.CRC24A).sum() == 0)
        sr = pb.scalar_row[ji]
        return PuschResult(
            j.rnti, j.tbs, bool(tb_ok),
            tb_with_crc[:j.tbs] if tb_ok else None,
            float(scal[sr, 0]), float(scal[sr, 1]), j.n_prb)

    todo = [ji for ji in range(len(jobs))
            if results[ji] is None and ji in pb.seg_of]
    for ji in todo:
        results[ji] = assemble(ji)
    if n_iter_esc > 0:
        # escalate only grants where NO table variant passed (a sibling
        # variant's CRC pass means the failure is a wrong-table trial)
        gi_ok = {jobs[ji].tag["gi"] for ji in todo
                 if results[ji].crc_ok and isinstance(jobs[ji].tag, dict)
                 and "gi" in jobs[ji].tag}
        esc = [ji for ji in todo if not results[ji].crc_ok
               and not (isinstance(jobs[ji].tag, dict)
                        and jobs[ji].tag.get("gi") in gi_ok)]
        by_k: Dict[int, list] = {}
        for ji in esc:
            for ci_, K in enumerate(pb.seg_of[ji].K):
                ref = pb.d_of.get((ji, ci_))
                if ref is not None:
                    by_k.setdefault(K, []).append((ji, ci_, ref))
        if by_k:
            with prof.span("pu_escalate"):
                for K, rows in sorted(by_k.items()):
                    n_b = _pow2(len(rows), 32)
                    d = _gather_lazy_rows([r[2] for r in rows])
                    if n_b > d.shape[0]:
                        d = jnp.pad(d, ((0, n_b - d.shape[0]),
                                        (0, 0), (0, 0)))
                    fused = np.asarray(_turbo_only_fn(K, n_b,
                                                      n_iter_esc)(d))
                    Wk = (K + 31) // 32
                    packed = fused[:len(rows), 1:1 + Wk]
                    bits = ((packed[:, :, None] >> shifts) & 1
                            ).astype(np.uint8)
                    bits = bits.reshape(len(rows), Wk * 32)[:, :K]
                    for r_i, (ji, ci_, _ref) in enumerate(rows):
                        bits_of[(ji, ci_)] = bits[r_i]
                        rem_of[(ji, ci_)] = int(fused[r_i, 0])
            for ji in esc:
                r2 = assemble(ji)
                if r2.crc_ok:
                    results[ji] = r2
    return results
