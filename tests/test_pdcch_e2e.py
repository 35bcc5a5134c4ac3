"""End-to-end PDCCH blind-search tests: NumPy eNB encoder -> TPU-style
batched decode -> host acceptance resolver (FALCON semantics)."""
import numpy as np
import pytest

import jax

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra, search_space
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import dci_search, pdcch_rx, rnti_manager

CELL = CellConfig(n_id_cell=123, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _mk_dci_1a(rnti, riv_start=5, riv_len=10, mcs=7):
    return dci_mod.Dci(fmt="1A", rnti=rnti, fields=dict(
        flag0_1a=1, vrb_flag=0, riv=ra.start_len_to_riv(riv_start, riv_len, 50),
        mcs=mcs, harq_pid=2, ndi=1, rv=0, tpc=1))


def _subframe(tx_dcis, sf_idx, rng, noise=0.05, cell=CELL, cfi=CFI):
    g = encoder.build_control_subframe(cell, sf_idx, cfi, tx_dcis)
    h = encoder.flat_channel(cell, cell.nof_rx_ant, rng)
    rxg = encoder.apply_channel(g, h, noise_std=noise, rng=rng)
    return encoder.subframe_iq(cell, rxg)


def _search(iq_list, sf_list, threshold=5):
    run, st = pdcch_rx.make_pipeline(CELL, CFI)
    rm = rnti_manager.default_manager(threshold=threshold)
    search = dci_search.DciBlindSearch(CELL, rm)
    batch = np.stack(iq_list).astype(np.complex64)
    out = run(batch, np.asarray(sf_list, np.int32))
    out = {k: np.asarray(v) for k, v in out.items()}
    all_accepted = []
    for b in range(len(iq_list)):
        acc = search.resolve_subframe(out, b, st["locs"], st["nof_cce"],
                                      sf_idx=int(sf_list[b]))
        # materialize deferred payloads (the core does this in one batched
        # device fetch; here the host copy of cand_pay suffices)
        for a in acc:
            if isinstance(a.payload, dci_search.PayloadRef):
                w = out["cand_pay"][a.payload.b, a.payload.loc_idx,
                                    a.payload.size_idx]
                a.payload = pdcch_rx.unpack_payload(w, a.payload.nbits)
        all_accepted.append(acc)
    return all_accepted, search, st


def test_sirnti_evergreen_accepted_immediately():
    rng = np.random.default_rng(1)
    si = _mk_dci_1a(0xFFFF)
    # SI-RNTI lives in the common search space: L=8 or L=4, ncce 0..15
    iq = _subframe([encoder.TxDci(dci=si, L=3, ncce=0)], sf_idx=5, rng=rng)
    accepted, search, st = _search([iq], [5])
    assert len(accepted[0]) == 1
    a = accepted[0][0]
    assert a.rnti == 0xFFFF and a.fmt == "1A" and (a.l, a.ncce) == (3, 0)


def test_crnti_shortcut_accepts_aggregated_dci_immediately():
    """FALCON shortcut: an unknown C-RNTI at L>1 whose child location decodes
    to the same RNTI is accepted in the very first subframe
    (`DCISearch.cc:200-211`)."""
    rng = np.random.default_rng(2)
    rnti = 0x1234
    cands = [c for c in search_space.ue_candidates(rnti, 0, st_nof_cce())
             if c[0] == 2]
    l, ncce = cands[0]
    d = _mk_dci_1a(rnti)
    iq = _subframe([encoder.TxDci(dci=d, L=l, ncce=ncce)], 0, rng)
    accepted, search, _ = _search([iq], [0])
    assert len(accepted[0]) == 1 and accepted[0][0].rnti == rnti
    assert (search.rm.get_activation_reason(rnti)
            == rnti_manager.ActivationReason.SHORTCUT)


def test_crnti_1cce_needs_histogram_then_accepted():
    """At L=1 (single CCE) there is no child, so a new C-RNTI must earn
    acceptance through the 200 ms histogram (threshold 5)."""
    rng = np.random.default_rng(2)
    rnti = 0x2345
    iqs, sfs = [], []
    for sf in range(10):
        cands = [c for c in search_space.ue_candidates(rnti, sf, st_nof_cce())
                 if c[0] == 0]
        l, ncce = cands[0]
        d = _mk_dci_1a(rnti)
        iqs.append(_subframe([encoder.TxDci(dci=d, L=l, ncce=ncce)], sf, rng))
        sfs.append(sf)
    accepted, search, st = _search(iqs, sfs)
    counts = [len(a) for a in accepted]
    # unknown RNTI at 1 CCE: histogram feeding only, no acceptance early on
    assert counts[0] == 0
    # each subframe adds ~1 histogram hit; after >5 hits acceptance starts
    assert any(c >= 1 for c in counts[6:])
    assert all(a.rnti == rnti for sub in accepted for a in sub)


def st_nof_cce():
    _, st = pdcch_rx.make_pipeline(CELL, CFI)
    return st["nof_cce"]


def test_two_dcis_same_subframe_no_overlap():
    rng = np.random.default_rng(3)
    si = _mk_dci_1a(0xFFFF)
    pg = _mk_dci_1a(0xFFFE)   # P-RNTI, also evergreen on 1A
    iq = _subframe([encoder.TxDci(dci=si, L=3, ncce=0),
                    encoder.TxDci(dci=pg, L=2, ncce=8)], sf_idx=0, rng=rng)
    accepted, _, _ = _search([iq], [0])
    got = {(a.rnti, a.l, a.ncce) for a in accepted[0]}
    assert (0xFFFF, 3, 0) in got
    assert (0xFFFE, 2, 8) in got
    assert len(got) == 2


def test_empty_subframe_no_false_positives():
    rng = np.random.default_rng(4)
    iqs = [_subframe([], sf, rng) for sf in range(5)]
    accepted, search, _ = _search(iqs, list(range(5)))
    assert all(len(a) == 0 for a in accepted)


def test_low_snr_subframe_gated():
    rng = np.random.default_rng(5)
    si = _mk_dci_1a(0xFFFF)
    iq = _subframe([encoder.TxDci(dci=si, L=3, ncce=0)], 0, rng, noise=2.0)
    accepted, search, _ = _search([iq], [0])
    # high noise -> SNR gate (<6 dB) suppresses the whole search
    assert len(accepted[0]) == 0


def test_payload_bits_roundtrip():
    rng = np.random.default_rng(6)
    d = _mk_dci_1a(0xFFFF, riv_start=7, riv_len=3, mcs=21)
    iq = _subframe([encoder.TxDci(dci=d, L=3, ncce=8)], 1, rng)
    accepted, _, _ = _search([iq], [1])
    assert len(accepted[0]) == 1
    back = dci_mod.unpack(accepted[0][0].payload, "1A", CELL, rnti=0xFFFF)
    g = dci_mod.dl_grant_from_dci(back, CELL)
    assert g.prb_mask[7:10].all() and g.n_prb_alloc == 3
    assert back["mcs"] == 21
