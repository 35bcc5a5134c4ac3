"""Golden replay regression: a pinned scenario must keep producing the same
pcap, byte for byte (the framework's analog of the reference's
`pcap_file_example/` goldens, SURVEY.md §4.2).

The golden file is (re)generated with --regen via
    python -m tests.test_golden_replay
Regenerate ONLY when an intentional behavior change is made, and say why in
the commit message.
"""
import hashlib
import os
import sys

import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.io import pcap
from ltesniffer_tpu.mac_rrc import mac, rrc
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_PCAP = os.path.join(GOLDEN_DIR, "dl_mode.pcap")

CELL = CellConfig(n_id_cell=199, n_prb=50, nof_ports=2, nof_rx_ant=1)


def _build_stream():
    sb = scenario.ScenarioBuilder(CELL, seed=20260817, noise=0.04)
    sib2 = rrc.encode_sib2(rrc.Sib2UlConfig(cyclic_shift=2))
    ue_pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"golden-ue-data")])
    pg = rrc.encode_paging([rrc.PagingRecord(s_tmsi=0x1122334455)])
    for j in range(20):
        sf = j % 10
        txs = []
        if sf == 5:
            txs.append(scenario.DlTx(rnti=0xFFFF, mac_pdu=sib2, n_prb=6))
        if sf == 0:
            txs.append(scenario.DlTx(rnti=0xFFFE, mac_pdu=pg, n_prb=6,
                                     prb_start=40))
        if j >= 2:
            txs.append(scenario.DlTx(rnti=0x4D2, mac_pdu=ue_pdu, n_prb=10,
                                     prb_start=12, ndi=j % 2, harq_pid=j % 8))
        sb.add_subframe(sf, txs)
    return sb.stream()


def _run(tmp_pcap: str):
    cfg = core.SnifferConfig(cell=CELL, batch_size=8, pcap_path=tmp_pcap,
                             api_mode=0)
    c = core.LTESnifferCore(cfg)
    c.run_samples(_build_stream())
    c.close()
    return c


def test_golden_pcap_replay(tmp_path):
    assert os.path.exists(GOLDEN_PCAP), \
        "golden missing; run python -m tests.test_golden_replay"
    out = str(tmp_path / "dl.pcap")
    c = _run(out)
    got = open(out, "rb").read()
    want = open(GOLDEN_PCAP, "rb").read()
    assert hashlib.sha256(got).hexdigest() == \
        hashlib.sha256(want).hexdigest(), \
        f"pcap drifted: {len(got)} vs {len(want)} bytes"
    # structural sanity on the golden itself
    recs = pcap.read_pcap(GOLDEN_PCAP)
    rntis = {r.get("rnti") for r in recs}
    assert 0x4D2 in rntis and 0xFFFF in rntis and 0xFFFE in rntis


# ---------------------------------------------------------------------------
# UL-mode golden: dual-carrier scenario -> pinned UL pcap
# ---------------------------------------------------------------------------
GOLDEN_UL_PCAP = os.path.join(GOLDEN_DIR, "ul_mode.pcap")


def _build_dual():
    from ltesniffer_tpu.phy import tables
    sb = scenario.DualScenarioBuilder(CELL, cfi=2, seed=20260821)
    rng = np.random.default_rng(99)
    qm, itbs = tables.ul_mcs_to_qm_itbs(6)
    tbs = tables.tbs_lookup(itbs, 8)
    for j in range(30):
        txs = [scenario.UlTx(rnti=0x600 + (j % 4), prb_start=4, n_prb=8,
                             mcs=6,
                             tb_bits=rng.integers(0, 2, tbs)
                             .astype(np.uint8))]
        sb.add_subframe(j % 10, txs, strict=False)
    return sb.streams()


def _run_ul(tmp_pcap: str):
    cfg = core.SnifferConfig(cell=CELL, batch_size=8, pcap_path=tmp_pcap,
                             acquire_sfn=False)
    c = core.LTESnifferCoreUL(cfg)
    dl, ul = _build_dual()
    c.run_dual_samples(dl, ul)
    c.close()
    return c


def test_golden_ul_pcap_replay(tmp_path):
    assert os.path.exists(GOLDEN_UL_PCAP), \
        "golden missing; run python -m tests.test_golden_replay"
    out = str(tmp_path / "ul.pcap")
    c = _run_ul(out)
    got = open(out, "rb").read()
    want = open(GOLDEN_UL_PCAP, "rb").read()
    assert hashlib.sha256(got).hexdigest() == \
        hashlib.sha256(want).hexdigest(), \
        f"ul pcap drifted: {len(got)} vs {len(want)} bytes"
    recs = pcap.read_pcap(GOLDEN_UL_PCAP)
    ul_recs = [r for r in recs if r.get("direction") == 0]
    assert len(ul_recs) >= 15
    assert {r["rnti"] for r in ul_recs} >= {0x600, 0x601}


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    import jax
    jax.config.update("jax_platforms", "cpu")
    c = _run(GOLDEN_PCAP)
    print(f"golden regenerated: {GOLDEN_PCAP}")
    print("summary:", c.summary())
    cu = _run_ul(GOLDEN_UL_PCAP)
    n_ok = sum(1 for r in cu.ul_results if r.crc_ok)
    print(f"ul golden regenerated: {GOLDEN_UL_PCAP} ({n_ok} PUSCH ok)")
    sys.exit(0)
