"""Batched UL decode path: grouped dispatch, trial rate limiting, PRACH
wiring in the core loop.

Covers the round-3 UL engineering: grants collected over a subframe batch
dispatch as grouped device calls (`pusch_rx.dispatch_grants_ul_batch`),
unknown-table cascade trials are rate-limited per RNTI
(`MCSTracking.UL_TRIAL_LIMIT`; reference tracks attempts,
`MCSTracking.cc:758-827`), and PRACH detection runs on SIB2-allowed UL
subframes (`work_prach`, `UL_Sniffer_PUSCH.cc:672-713`).
"""
import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra, tables, search_space
from ltesniffer_tpu.sniffer import core, prach_rx, pusch_rx, trackers
from ltesniffer_tpu.testing import encoder

CELL = CellConfig(n_id_cell=147, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _nof_cce():
    from ltesniffer_tpu.phy import grid as grid_mod
    return grid_mod.control_region(CELL, CFI)["nof_pdcch_regs"] // 9


def _dual_stream(rng, ul_specs, n_sf=14):
    """DL stream with one DCI0 per spec; UL stream with the PUSCH 4 sf
    later.  ul_specs: list of dicts(rnti, sf, mcs, prb_start, n_prb,
    tb_bits|None)."""
    h_dl = encoder.flat_channel(CELL, 1, rng)
    by_dl = {}
    by_ul = {}
    for s in ul_specs:
        by_dl.setdefault(s["sf"], []).append(s)
        by_ul.setdefault(s["sf"] + 4, []).append(s)
    dl_frames, ul_frames = [], []
    for j in range(n_sf):
        txs = []
        used = set()
        for s in by_dl.get(j, []):
            cands = search_space.ue_candidates(s["rnti"], j % 10, _nof_cce())
            l, ncce = next(c for c in cands if c[0] == 2
                           and not set(range(c[1], c[1] + 4)) & used)
            used.update(range(ncce, ncce + 4))
            d = dci_mod.Dci(fmt="0", rnti=s["rnti"], fields=dict(
                flag0_1a=0, hopping=0,
                riv=ra.start_len_to_riv(s["prb_start"], s["n_prb"], 50),
                mcs=s["mcs"], ndi=1, tpc=0, dmrs_cs=0, cqi_request=0))
            txs.append(encoder.TxDci(dci=d, L=l, ncce=ncce))
        g = encoder.build_control_subframe(CELL, j % 10, CFI, txs)
        rxg = encoder.apply_channel(g, h_dl, 0.04, rng)
        dl_frames.append(encoder.subframe_iq(CELL, rxg)[0])
        jobs = []
        for s in by_ul.get(j, []):
            if s.get("tb_bits") is None:
                continue
            jobs.append(dict(rnti=s["rnti"], prb_start=s["prb_start"],
                             n_prb=s["n_prb"], qm=s["qm"],
                             tb_bits=s["tb_bits"], dmrs_field=0))
        ug = (encoder.build_ul_subframe(CELL, j % 10, jobs) if jobs
              else np.zeros((1, 14, CELL.n_sc), np.complex64))
        un = ug + 0.03 / np.sqrt(2) * (
            rng.standard_normal(ug.shape)
            + 1j * rng.standard_normal(ug.shape))
        ul_frames.append(encoder.ul_subframe_iq(
            CELL, un.astype(np.complex64))[0])
    return np.concatenate(dl_frames), np.concatenate(ul_frames)


def test_batched_multi_grant_subframe(tmp_path):
    """Several grants in ONE UL subframe decode via the grouped dispatch."""
    rng = np.random.default_rng(5)
    specs = []
    for k in range(3):
        mcs = 6
        qm, i_tbs = tables.ul_mcs_to_qm_itbs(mcs)
        n_prb = 8
        tbs = tables.tbs_lookup(i_tbs, n_prb)
        specs.append(dict(rnti=0x3000 + k, sf=2, mcs=mcs, qm=qm,
                          prb_start=2 + 9 * k, n_prb=n_prb,
                          tb_bits=rng.integers(0, 2, tbs).astype(np.uint8)))
    dl, ul = _dual_stream(rng, specs)
    c = core.LTESnifferCoreUL(core.SnifferConfig(cell=CELL, batch_size=14))
    from ltesniffer_tpu.sniffer import rnti_manager
    for s in specs:   # known-active RNTIs (established UEs)
        c.rm.activate_and_refresh(s["rnti"], rnti_manager.FORMAT_TO_INDEX["0"],
                                  rnti_manager.ActivationReason.OTHER)
    c.run_dual_samples(dl, ul)
    ok = [r for r in c.ul_results if r.crc_ok]
    assert len(ok) == 3
    assert {r.rnti for r in ok} == {0x3000, 0x3001, 0x3002}
    for r, s in zip(sorted(ok, key=lambda r: r.rnti), specs):
        got = np.unpackbits(np.frombuffer(r.payload, np.uint8))
        np.testing.assert_array_equal(got[:len(s["tb_bits"])], s["tb_bits"])


def test_ul_trial_rate_limiting():
    """An RNTI whose grants never decode stops burning cascade trials."""
    rng = np.random.default_rng(6)
    rnti = 0x3111
    # mcs 21: the three tables map to 3 distinct (qm, tbs) variants
    specs = [dict(rnti=rnti, sf=s, mcs=21, qm=4, prb_start=4, n_prb=8,
                  tb_bits=None)   # no PUSCH transmitted: CRC always fails
             for s in range(1, 9)]
    dl, ul = _dual_stream(rng, specs, n_sf=14)
    c = core.LTESnifferCoreUL(core.SnifferConfig(cell=CELL, batch_size=14))
    import ltesniffer_tpu.sniffer.pusch_rx as prx
    seen_jobs = []
    orig = prx.dispatch_grants_ul_batch

    def spy(grids, cell, jobs, **kw):
        seen_jobs.append(len(jobs))
        return orig(grids, cell, jobs, **kw)

    try:
        prx.dispatch_grants_ul_batch = spy
        c.run_dual_samples(dl, ul)
    finally:
        prx.dispatch_grants_ul_batch = orig
    # every decoded grant produced a result, none passed CRC
    n_phase1 = len(c.ul_results)
    assert n_phase1 >= c.mcs.UL_TRIAL_LIMIT
    assert not any(r.crc_ok for r in c.ul_results)
    # trial budget exhausted
    assert c.mcs.ul_trials[rnti] >= c.mcs.UL_TRIAL_LIMIT
    assert not c.mcs.ul_trial_budget_ok(rnti)
    # two more failing grants: each now dispatches a SINGLE variant
    specs2 = [dict(rnti=rnti, sf=s, mcs=21, qm=4, prb_start=4, n_prb=8,
                   tb_bits=None) for s in (1, 3)]
    dl2, ul2 = _dual_stream(rng, specs2, n_sf=10)
    n_before = len(seen_jobs)
    try:
        prx.dispatch_grants_ul_batch = spy
        c.run_dual_samples(dl2, ul2)
    finally:
        prx.dispatch_grants_ul_batch = orig
    n_phase2 = len(c.ul_results) - n_phase1
    assert n_phase2 >= 1
    # jobs dispatched == grants (exactly 1 variant per budget-limited grant)
    assert sum(seen_jobs[n_before:]) == n_phase2


def test_prach_wired_into_ul_loop():
    """A preamble transmitted on a SIB2-allowed subframe is detected by
    the core loop (config index 14: every subframe)."""
    rng = np.random.default_rng(7)
    dl, ul = _dual_stream(rng, [], n_sf=6)
    u, shift = 129, 26
    tx = prach_rx.prach_tx(CELL, u, shift, prach_freq_offset=4)
    # place the preamble at the start of UL subframe 3
    n = CELL.sf_len
    ul = ul.copy()
    ul[3 * n:3 * n + len(tx)] += 3.0 * tx
    c = core.LTESnifferCoreUL(core.SnifferConfig(cell=CELL, batch_size=6))
    # SIB2 carries the LOGICAL index: logical 0 -> physical u=129
    # (36.211 Table 5.7.2-4)
    c.ulsche.set_sib2(dict(prach_config_index=14, prach_root_seq_index=0,
                           prach_freq_offset=4, zero_correlation_zone=1))
    c.run_dual_samples(dl, ul)
    hits = [d for d in c.prach_detections if d["sf_idx"] == 3]
    assert hits, f"no PRACH detection at sf 3: {c.prach_detections}"
    d = max(hits, key=lambda d: d["peak"])
    assert d["root"] == u
    assert d["preamble"] == shift // 13
