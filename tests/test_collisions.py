"""RB-map collision detection (`DCICollection.cc:214-292`,
`DCISearch.cc:512-519`): per-subframe merged RB maps, one counter
increment per direction per colliding subframe."""
import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra
from ltesniffer_tpu.sniffer import core, dci_search

CELL = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)


def _mk_core(tmp_path):
    cfg = core.SnifferConfig(cell=CELL, pcap_path=str(tmp_path / "o.pcap"),
                             batch_size=8)
    return core.LTESnifferCore(cfg)


def _dl_1a(rnti, prb_start, n_prb):
    riv = ra.start_len_to_riv(prb_start, n_prb, CELL.n_prb)
    d = dci_mod.Dci(fmt="1A", rnti=rnti, fields=dict(
        flag0_1a=1, vrb_flag=0, riv=riv, mcs=5, harq_pid=0, ndi=0,
        rv=0, tpc=0))
    return dci_search.AcceptedDci(
        rnti=rnti, fmt="1A", l=0, ncce=0,
        payload=dci_mod.pack(d, CELL), histval=5)


def _ul_0(rnti, prb_start, n_prb):
    riv = ra.start_len_to_riv(prb_start, n_prb, CELL.n_prb)
    d = dci_mod.Dci(fmt="0", rnti=rnti, fields=dict(
        flag0_1a=0, hopping=0, riv=riv, mcs=5, ndi=0, tpc=0,
        dmrs_cs=0, cqi_req=0))
    return dci_search.AcceptedDci(
        rnti=rnti, fmt="0", l=0, ncce=0,
        payload=dci_mod.pack(d, CELL), histval=5)


def test_dl_overlap_counts_once_per_subframe(tmp_path):
    c = _mk_core(tmp_path)
    # three grants, two overlapping -> exactly one DL collision
    c._count_rb_collisions([_dl_1a(0x100, 0, 10),
                            _dl_1a(0x200, 5, 10),
                            _dl_1a(0x300, 30, 5)])
    st = c.search.stats
    assert st.nof_subframe_collisions_dl == 1
    assert st.nof_subframe_collisions_ul == 0


def test_disjoint_grants_no_collision(tmp_path):
    c = _mk_core(tmp_path)
    c._count_rb_collisions([_dl_1a(0x100, 0, 10),
                            _dl_1a(0x200, 10, 10),
                            _ul_0(0x100, 0, 8),
                            _ul_0(0x200, 8, 8)])
    st = c.search.stats
    assert st.nof_subframe_collisions_dl == 0
    assert st.nof_subframe_collisions_ul == 0


def test_ul_overlap_independent_of_dl(tmp_path):
    c = _mk_core(tmp_path)
    c._count_rb_collisions([_ul_0(0x100, 4, 8), _ul_0(0x200, 12, 8)])
    c._count_rb_collisions([_ul_0(0x100, 4, 8), _ul_0(0x200, 6, 8)])
    st = c.search.stats
    assert st.nof_subframe_collisions_dl == 0
    assert st.nof_subframe_collisions_ul == 1
