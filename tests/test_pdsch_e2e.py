"""End-to-end PDSCH tests: encoder TX -> pipeline grids/chest -> grant decode."""
import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra, tables
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import pdcch_rx, pdsch_rx

CELL = CellConfig(n_id_cell=77, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _tx_subframe(sf_idx, rnti, prb_mask, qm, tb_bits, rng, noise=0.03, rv=0,
                 cell=CELL):
    g = encoder.build_control_subframe(cell, sf_idx, CFI, [])
    G = encoder.add_pdsch(g, cell, sf_idx, CFI, rnti, prb_mask, qm, tb_bits,
                          rv=rv)
    h = encoder.flat_channel(cell, cell.nof_rx_ant, rng)
    rxg = encoder.apply_channel(g, h, noise_std=noise, rng=rng)
    return encoder.subframe_iq(cell, rxg), G


def _run_phase_a(iqs, sfs, cell=CELL):
    run, st = pdcch_rx.make_pipeline(cell, CFI)
    out = run(jnp.asarray(np.stack(iqs).astype(np.complex64)),
              jnp.asarray(np.asarray(sfs, np.int32)))
    return out, st


def test_pdsch_qpsk_roundtrip():
    rng = np.random.default_rng(0)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[10:20] = True
    i_tbs = 9
    tbs = tables.tbs_lookup(i_tbs, 10)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    iq, G = _tx_subframe(3, 0x1234, prb_mask, 2, tb, rng)
    out, st = _run_phase_a([iq], [3])
    res = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, CELL, 3, CFI,
        rnti=0x1234, prb_mask=prb_mask, qm=2, tbs=tbs)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, tb)


def test_pdsch_16qam_and_64qam():
    rng = np.random.default_rng(1)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[0:24] = True
    for qm, i_tbs in ((4, 14), (6, 22)):
        tbs = tables.tbs_lookup(i_tbs, 24)
        tb = rng.integers(0, 2, tbs).astype(np.uint8)
        iq, G = _tx_subframe(4, 0x2222, prb_mask, qm, tb, rng, noise=0.02)
        out, st = _run_phase_a([iq], [4])
        res = pdsch_rx.decode_grant(
            out["grids"], out["h"], out["noise_var"], 0, CELL, 4, CFI,
            rnti=0x2222, prb_mask=prb_mask, qm=qm, tbs=tbs)
        assert res.crc_ok, f"qm={qm}"
        np.testing.assert_array_equal(res.tb_bits, tb)


def test_pdsch_multi_codeblock():
    """TBS > 6120 forces segmentation into multiple code blocks."""
    rng = np.random.default_rng(2)
    prb_mask = np.ones(50, dtype=bool)
    i_tbs = 26
    tbs = tables.tbs_lookup(i_tbs, 50)
    assert tbs > 6120
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    # published TBS(26,50)=36696 is effective rate ~0.93 over cfi-2 REs —
    # the spec's extreme operating point, so keep the test SNR high
    iq, G = _tx_subframe(1, 0x3333, prb_mask, 6, tb, rng, noise=0.02)
    out, st = _run_phase_a([iq], [1])
    res = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, CELL, 1, CFI,
        rnti=0x3333, prb_mask=prb_mask, qm=6, tbs=tbs)
    assert len(res.cb_crc_ok) > 1 and all(res.cb_crc_ok)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, tb)


def test_pdsch_wrong_rnti_fails_crc():
    rng = np.random.default_rng(3)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[5:15] = True
    tbs = tables.tbs_lookup(9, 10)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    iq, G = _tx_subframe(2, 0x1234, prb_mask, 2, tb, rng)
    out, st = _run_phase_a([iq], [2])
    res = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, CELL, 2, CFI,
        rnti=0x4321, prb_mask=prb_mask, qm=2, tbs=tbs)  # wrong rnti
    assert not res.crc_ok


def test_pdsch_harq_retransmission_combining():
    """rv0 tx too noisy alone; rv2 retx combines in the soft buffer."""
    rng = np.random.default_rng(4)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[0:8] = True
    i_tbs = 15                      # high rate so single tx fails at low SNR
    tbs = tables.tbs_lookup(i_tbs, 8)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    # scan a few noise levels: combining must turn a failed rv0 into a
    # successful rv0+rv2 decode at some operating point
    seen = []
    for noise in (0.35, 0.45, 0.55, 0.65):
        bufs = {}
        key = (0x7777, 0, 0)
        oks = []
        for rv in (0, 2):
            iq, G = _tx_subframe(6, 0x7777, prb_mask, 4, tb, rng, noise=noise,
                                 rv=rv)
            out, st = _run_phase_a([iq], [6])
            res = pdsch_rx.decode_grant(
                out["grids"], out["h"], out["noise_var"], 0, CELL, 6, CFI,
                rnti=0x7777, prb_mask=prb_mask, qm=4, tbs=tbs, rv=rv,
                soft_buffers=bufs, harq_key=key)
            oks.append(res.crc_ok)
        if oks == [False, True]:
            assert not bufs  # buffer cleared after success
        seen.append(tuple(oks))
    assert (False, True) in seen, seen


def test_pdsch_via_blind_dci():
    """Full chain: DCI in PDCCH + PDSCH payload; decode via the accepted DCI."""
    from ltesniffer_tpu.sniffer import dci_search, rnti_manager
    rng = np.random.default_rng(5)
    s, l_alloc = 12, 8
    riv = ra.start_len_to_riv(s, l_alloc, 50)
    i_mcs = 9   # QPSK, i_tbs 9
    d = dci_mod.Dci(fmt="1A", rnti=0xFFFF, fields=dict(
        flag0_1a=1, vrb_flag=0, riv=riv, mcs=i_mcs, harq_pid=0, ndi=0,
        rv=0, tpc=0))
    tbs = tables.tbs_lookup(9, l_alloc)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    g = encoder.build_control_subframe(CELL, 0, CFI,
                                       [encoder.TxDci(dci=d, L=3, ncce=0)])
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[s:s + l_alloc] = True
    encoder.add_pdsch(g, CELL, 0, CFI, 0xFFFF, prb_mask, 2, tb)
    h = encoder.flat_channel(CELL, 1, rng)
    iq = encoder.subframe_iq(CELL, encoder.apply_channel(g, h, 0.03, rng))

    out, st = _run_phase_a([iq], [0])
    rm = rnti_manager.default_manager()
    search = dci_search.DciBlindSearch(CELL, rm)
    onp = {k: np.asarray(v) for k, v in out.items()
           if not k.startswith(("grids", "h"))}
    accepted = search.resolve_subframe(onp, 0, st["locs"], st["nof_cce"], 0)
    assert len(accepted) == 1
    a = accepted[0]
    if isinstance(a.payload, dci_search.PayloadRef):
        w = onp["cand_pay"][a.payload.b, a.payload.loc_idx, a.payload.size_idx]
        a.payload = pdcch_rx.unpack_payload(w, a.payload.nbits)
    dci_back = dci_mod.unpack(a.payload, a.fmt, CELL, rnti=a.rnti)
    grant = dci_mod.dl_grant_from_dci(dci_back, CELL)
    qm, i_tbs = tables.dl_mcs_to_qm_itbs(grant.mcs)
    got_tbs = tables.tbs_lookup(i_tbs, grant.n_prb_alloc)
    assert got_tbs == tbs
    res = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, CELL, 0, CFI,
        rnti=a.rnti, prb_mask=grant.prb_mask, qm=qm, tbs=got_tbs,
        rv=grant.rv)
    assert res.crc_ok
    np.testing.assert_array_equal(res.tb_bits, tb)
