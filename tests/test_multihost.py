"""Multi-host time-block scaling: N-host run == 1-host run.

BASELINE config 5 / SURVEY.md §4 "Multi-host testing: shard the same trace
across N hosts and assert output-set equality with 1-host run."  Each host
runs a fresh LTESnifferCore over its time block with the preceding overlap
replayed through its trackers (`parallel.multihost`); the merge drops the
replay duplicates and orders by TTI.
"""
import numpy as np
import pytest

from ltesniffer_tpu.io import pcap
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.parallel import multihost
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario

CELL = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)
N_SF = 60


def _build_trace():
    """Traffic of one long-lived RNTI plus one RNTI that first appears just
    before the 2-host boundary (subframe 30) — exercising histogram
    validation straddling the block edge."""
    sb = scenario.ScenarioBuilder(CELL, seed=21)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"mh-traffic")])
    pdu2 = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"boundary-ue")])
    for j in range(N_SF):
        sf = j % 10
        txs = []
        if j >= 2:
            txs.append(scenario.DlTx(rnti=0x4100, mac_pdu=pdu, n_prb=10,
                                     prb_start=0, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        if j >= 25:   # activates ~5 sf before the boundary at 30
            txs.append(scenario.DlTx(rnti=0x4B0B, mac_pdu=pdu2, n_prb=8,
                                     prb_start=20, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        sb.add_subframe(sf, txs)
    return sb.stream()


def _run_single(tmp_path, stream):
    cfg = core.SnifferConfig(cell=CELL, batch_size=8,
                             pcap_path=str(tmp_path / "single.pcap"))
    c = core.LTESnifferCore(cfg)
    c.run_samples(stream)
    c.close()
    return c, pcap.read_pcap(cfg.pcap_path)


def _run_hosts(tmp_path, stream, n_hosts, overlap_sf):
    blocks = multihost.split_blocks(stream, n_hosts, CELL,
                                    overlap_sf=overlap_sf)
    cores = []
    for blk in blocks:
        def factory(b):
            cfg = core.SnifferConfig(
                cell=CELL, batch_size=8,
                pcap_path=str(tmp_path / f"host{b.host}.pcap"))
            return core.LTESnifferCore(cfg)
        c = multihost.run_block(factory, blk)
        c.close()
        cores.append(c)
    return blocks, cores


def _result_key(r):
    return (r.dci.sfn, r.dci.sf_idx, r.dci.rnti, r.dci.fmt, r.dci.ncce,
            r.crc_ok, r.payload)


def _pcap_key(r):
    return (r["sfn"], r["sf_idx"], r["rnti"], bytes(r["payload"]))


@pytest.mark.parametrize("n_hosts", [2, 3])
def test_multihost_equals_single_host(tmp_path, n_hosts):
    stream = _build_trace()
    single, single_recs = _run_single(tmp_path, stream)
    blocks, cores = _run_hosts(tmp_path, stream, n_hosts,
                               overlap_sf=20)
    merged = multihost.merge_accepted([c.results for c in cores], blocks)
    # accepted-DCI / decode-result set equality, in TTI order
    assert [_result_key(r) for r in merged] == \
        [_result_key(r) for r in single.results]
    # pcap record set equality
    per_host = [pcap.read_pcap(str(tmp_path / f"host{h}.pcap"))
                for h in range(n_hosts)]
    merged_recs = multihost.merge_pcap_records(per_host, blocks)
    assert [_pcap_key(r) for r in merged_recs] == \
        [_pcap_key(r) for r in single_recs]
    # the boundary-straddling RNTI decoded on both sides
    rntis = {r["rnti"] for r in merged_recs}
    assert 0x4B0B in rntis and 0x4100 in rntis


def test_ownership_filter_drops_replay_duplicates(tmp_path):
    stream = _build_trace()
    blocks, cores = _run_hosts(tmp_path, stream, 2, overlap_sf=20)
    # host 1 processed 20 replay subframes: raw outputs overlap host 0's
    h1_all = cores[1].results
    h1_owned = [r for r in h1_all
                if multihost.owned(blocks[1], r.dci.sfn, r.dci.sf_idx)]
    assert len(h1_owned) < len(h1_all)
    merged = multihost.merge_accepted([c.results for c in cores], blocks)
    keys = [(r.dci.sfn, r.dci.sf_idx, r.dci.rnti) for r in merged]
    assert len(keys) == len(set(keys)), "replay duplicates leaked"


def test_multihost_runner_processes(tmp_path):
    """scripts/run_multihost.py: real OS-process-per-host run merges to the
    single-host pcap record set."""
    import os
    import subprocess
    import sys
    from ltesniffer_tpu.io import iq as iq_mod
    stream = _build_trace()
    iq_path = tmp_path / "trace.iq"
    iq_mod.write_iq(str(iq_path), stream)
    single, single_recs = _run_single(tmp_path, stream)
    merged_pcap = tmp_path / "merged.pcap"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "run_multihost.py"),
         "-i", str(iq_path), "-c", str(CELL.n_id_cell), "-p", "50",
         "-P", "2", "-n", "2", "-B", "8", "--overlap", "20",
         "-o", str(merged_pcap), "--workdir", str(tmp_path / "wd")],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    merged = pcap.read_pcap(str(merged_pcap))
    assert [_pcap_key(x) for x in merged] == \
        [_pcap_key(x) for x in single_recs]


def _build_rar_silence_trace(n_sf, rar_sf, resume_sf, t_crnti):
    """RAR-activated T-CRNTI silent from `rar_sf` until `resume_sf`."""
    sb = scenario.ScenarioBuilder(CELL, seed=33)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"late-ue")])
    keep = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"steady")])
    rar = mac.build_rar_pdu([mac.Rar(rapid=3, ta=10,
                                     grant=(0 << 19) | (77 << 9) | (5 << 5),
                                     t_crnti=t_crnti)])
    for j in range(n_sf):
        sf = j % 10
        txs = []
        if j == rar_sf:
            txs.append(scenario.DlTx(rnti=0x0005, mac_pdu=rar, n_prb=6))
        if j >= 2:      # steady background UE keeps the cell busy
            txs.append(scenario.DlTx(rnti=0x4100, mac_pdu=keep, n_prb=10,
                                     prb_start=24, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        if j >= resume_sf:
            txs.append(scenario.DlTx(rnti=t_crnti, mac_pdu=pdu, n_prb=8,
                                     prb_start=4, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        sb.add_subframe(sf, txs)
    return sb.stream()


def test_multihost_rar_silence_past_overlap_divergence_bound():
    """VERDICT round-3 weak #6: an RNTI activated by RAR, silent LONGER
    than overlap_sf, resuming just after the block boundary.

    With the silence exceeding the replay horizon, host 1 cannot see the
    RAR activation; the resumed RNTI re-validates via the histogram.  The
    divergence is bounded and one-sided: the merged result may MISS at
    most histogram_threshold of the earliest resumed-RNTI records, and
    must contain no extras; every other record matches 1-host exactly.
    With overlap covering the RAR, parity is exact."""
    import tempfile, pathlib
    t_crnti = 0x4D0D
    n_sf, rar_sf, boundary, resume_sf = 120, 4, 60, 62
    stream = _build_rar_silence_trace(n_sf, rar_sf, resume_sf, t_crnti)
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        single, _ = _run_single(tmp, stream)
        single_keys = [_result_key(r) for r in single.results]
        # single host accepts the resumed RNTI immediately (RAR-active)
        assert any(r.dci.rnti == t_crnti for r in single.results)

        # (a) overlap 40 < silence (resume 62 - rar 4 = 58): divergence,
        # but bounded and one-sided
        blocks, cores = _run_hosts(tmp, stream, 2, overlap_sf=40)
        merged = multihost.merge_accepted([c.results for c in cores],
                                          blocks)
        merged_keys = [_result_key(r) for r in merged]
        missing = [k for k in single_keys if k not in merged_keys]
        extra = [k for k in merged_keys if k not in single_keys]
        assert not extra, "divergence must never add records"
        assert all(k[2] == t_crnti for k in missing), \
            "only the silent RAR RNTI may diverge"
        thresh = core.SnifferConfig(cell=CELL).histogram_threshold
        assert len(missing) <= thresh, (len(missing), thresh)
        # the missing records are the EARLIEST resumed occurrences: once
        # re-validated, everything matches
        t_single = [k for k in single_keys if k[2] == t_crnti]
        assert missing == t_single[:len(missing)]

        # (b) overlap covering the RAR: exact parity
        blocks2, cores2 = _run_hosts(tmp, stream, 2,
                                     overlap_sf=boundary - rar_sf + 1)
        merged2 = multihost.merge_accepted([c.results for c in cores2],
                                           blocks2)
        # RAR records are emitted synchronously (phase-3), so the single
        # core's emission order is not TTI order — compare as sorted sets
        assert sorted(_result_key(r) for r in merged2) == \
            sorted(single_keys)
