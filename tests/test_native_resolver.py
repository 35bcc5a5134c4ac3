"""Native C++ resolver equivalence vs the Python golden model."""
import numpy as np
import pytest

from ltesniffer_tpu import native
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra, search_space
from ltesniffer_tpu.sniffer import dci_search, pdcch_rx, rnti_manager
from ltesniffer_tpu.testing import encoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")

CELL = CellConfig(n_id_cell=123, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _scenario_outputs(n_sf=20, seed=7):
    """A mixed scenario: SI, paging, two UEs (L=2 and L=0), empty subframes."""
    rng = np.random.default_rng(seed)
    run, st = pdcch_rx.make_pipeline(CELL, CFI)
    iqs, sfs = [], []
    ues = [0x1111, 0x2222]
    for j in range(n_sf):
        sf = j % 10
        txs = []
        if sf == 5:
            txs.append(encoder.TxDci(dci=dci_mod.Dci(
                fmt="1A", rnti=0xFFFF, fields=dict(
                    flag0_1a=1, riv=ra.start_len_to_riv(0, 4, 50), mcs=4)),
                L=3, ncce=0))
        for k, u in enumerate(ues):
            want_l = 2 if k == 0 else 0
            cands = [c for c in search_space.ue_candidates(u, sf, st["nof_cce"])
                     if c[0] == want_l]
            if cands:
                l, ncce = cands[0]
                txs.append(encoder.TxDci(dci=dci_mod.Dci(
                    fmt="1A", rnti=u, fields=dict(
                        flag0_1a=1, riv=ra.start_len_to_riv(10, 4, 50),
                        mcs=9)), L=l, ncce=ncce))
        g = encoder.build_control_subframe(CELL, sf, CFI, txs)
        h = encoder.flat_channel(CELL, 1, rng)
        iqs.append(encoder.subframe_iq(
            CELL, encoder.apply_channel(g, h, 0.05, rng))[0])
        sfs.append(sf)
    import jax.numpy as jnp
    out = run(jnp.asarray(np.stack(iqs)[:, None, :].astype(np.complex64)),
              jnp.asarray(np.asarray(sfs, np.int32)))
    return {k: np.asarray(v) for k, v in out.items()}, st, sfs


def test_native_matches_python_golden():
    out, st, sfs = _scenario_outputs()

    py_rm = rnti_manager.default_manager()
    py = dci_search.DciBlindSearch(CELL, py_rm)
    nat_rm = native.default_native_manager()
    nat = native.NativeDciBlindSearch(CELL, nat_rm)

    for b in range(len(sfs)):
        a_py = py.resolve_subframe(out, b, st["locs"], st["nof_cce"], sfs[b])
        a_nat = nat.resolve_subframe(out, b, st["locs"], st["nof_cce"], sfs[b])
        key = lambda a: (a.rnti, a.fmt, a.l, a.ncce, a.histval)
        assert [key(x) for x in a_py] == [key(x) for x in a_nat], f"sf {b}"
        for x, y in zip(a_py, a_nat):
            np.testing.assert_array_equal(x.payload, y.payload)

    # stats agreement
    assert py.stats.nof_decoded_locations == nat.stats.nof_decoded_locations
    assert py.stats.nof_missed_cce == nat.stats.nof_missed_cce
    # active sets agree
    py_set = {(r, why.name) for r, why, _ in py_rm.active_set()}
    nat_set = {(r, why.name) for r, why, _ in nat_rm.active_set()}
    assert py_set == nat_set


def test_native_rar_activation_side_list():
    out, st, sfs = _scenario_outputs(n_sf=6, seed=9)
    nat_rm = native.default_native_manager()
    nat = native.NativeDciBlindSearch(CELL, nat_rm)
    # pre-activate a T-CRNTI as if a RAR was seen
    nat_rm.activate_and_refresh(0x1111, 0,
                                rnti_manager.ActivationReason.RAR)
    assert (nat_rm.get_activation_reason(0x1111)
            == rnti_manager.ActivationReason.RAR)
    for b in range(6):
        nat.resolve_subframe(out, b, st["locs"], st["nof_cce"], sfs[b])
    assert nat_rm.is_active(0x1111)


def test_native_resolver_speed():
    """Native resolve should be fast (the Python path is the bottleneck)."""
    import time
    out, st, sfs = _scenario_outputs(n_sf=10)
    nat = native.NativeDciBlindSearch(CELL, native.default_native_manager())
    py = dci_search.DciBlindSearch(CELL, rnti_manager.default_manager())
    t0 = time.perf_counter()
    for b in range(10):
        nat.resolve_subframe(out, b, st["locs"], st["nof_cce"], sfs[b])
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for b in range(10):
        py.resolve_subframe(out, b, st["locs"], st["nof_cce"], sfs[b])
    t_py = time.perf_counter() - t0
    print(f"native {t_nat*100:.2f} ms/sf vs python {t_py*100:.2f} ms/sf")
    assert t_nat < t_py
