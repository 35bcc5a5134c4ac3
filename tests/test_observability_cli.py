"""Observability wiring + CLI flags + SIGINT graceful stop.

Covers the reference's output layer and signal gate (SURVEY.md §5):
* the `-D` DCI trace file actually receives lines (`DCIToFile`,
  `SubframeInfoConsumer.cc:66-138`)
* `mcs_statistic.csv` written on close() (`MCSTracking.cc:1414`)
* CLI `--heartbeat/--tables/--dci-trace/--csv` plumb through to the core
* SIGINT maps to `request_stop` and still produces a valid pcap
  (`SignalManager.cc`, `LTESniffer_Core.cc:540-556`)
* CLI `--sync` routes through the continuous tracker (`run_stream`)
"""
import os
import signal
import sys

import numpy as np
import pytest

from ltesniffer_tpu import cli
from ltesniffer_tpu.io import iq as iq_mod, pcap
from ltesniffer_tpu.mac_rrc import mac
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import core
from ltesniffer_tpu.testing import scenario

CELL = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)


def _traffic_stream(n_sf=14, rnti=0x4141):
    sb = scenario.ScenarioBuilder(CELL, seed=9)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"obs-test")])
    ndi = 0
    for j in range(n_sf):
        txs = []
        if j >= 2:
            ndi ^= 1
            txs.append(scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=10,
                                     prb_start=12, harq_pid=j % 8, ndi=ndi))
        sb.add_subframe(j % 10, txs)
    return sb.stream()


def test_dci_trace_and_csv_written(tmp_path):
    trace = tmp_path / "dci.trace"
    csvp = tmp_path / "mcs.csv"
    cfg = core.SnifferConfig(cell=CELL, batch_size=8,
                             dci_trace_path=str(trace),
                             mcs_csv_path=str(csvp))
    c = core.LTESnifferCore(cfg)
    c.run_samples(_traffic_stream())
    c.close()
    assert c.dci_trace is None   # handle released
    lines = trace.read_text().strip().splitlines()
    # one line per accepted DCI (>= decoded grants: HARQ skips drop some)
    assert len(lines) >= len(c.results) >= 8
    # line format: ts, sfn, sf, rnti, fmt, ncce, L, histval
    cols = lines[0].split("\t")
    assert len(cols) == 8
    assert int(cols[3]) == 0x4141
    rows = csvp.read_text().strip().splitlines()
    assert rows[0].startswith("direction,rnti,table")
    assert any("0x4141" in r and r.startswith("dl") for r in rows[1:])


def test_heartbeat_counts():
    import io
    from ltesniffer_tpu.sniffer import observability
    cfg = core.SnifferConfig(cell=CELL, batch_size=8, heartbeat=True)
    c = core.LTESnifferCore(cfg)
    buf = io.StringIO()
    c.heartbeat = observability.Heartbeat(out=buf, every=8)
    c.run_samples(_traffic_stream(n_sf=10))
    assert "[heartbeat] Processed 8/8 subframes" in buf.getvalue()
    assert c.heartbeat.processed == 10


def test_cli_flags_plumb_through(tmp_path, capsys):
    stream = _traffic_stream()
    iq_path = tmp_path / "trace.iq"
    iq_mod.write_iq(str(iq_path), stream)
    out_pcap = tmp_path / "out.pcap"
    trace = tmp_path / "dci.trace"
    csvp = tmp_path / "mcs.csv"
    rc = cli.main(["-i", str(iq_path), "-c", str(CELL.n_id_cell),
                   "-p", "50", "-P", "2", "-o", str(out_pcap),
                   "--heartbeat", "--dci-trace", str(trace),
                   "--csv", str(csvp), "-B", "8"])
    assert rc == 0
    assert trace.exists() and len(trace.read_text().splitlines()) >= 8
    assert csvp.exists() and "0x4141" in csvp.read_text()
    assert len(pcap.read_pcap(str(out_pcap))) >= 8


def test_cli_sync_routes_through_stream_tracker(tmp_path):
    """--sync (stream mode) must use the continuous tracker: a trace with
    a leading sample offset still decodes via PSS-tracked framing."""
    sb = scenario.ScenarioBuilder(CELL, seed=9)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"obs-test")])
    rnti = 0x4141
    for j in range(40):
        sf = j % 10
        txs = []
        if j >= 2 and sf not in (0, 5):
            txs.append(scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=10,
                                     prb_start=12, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        sb.add_subframe(sf, txs,
                        with_pbch_sfn=j // 10 if sf == 0 else None)
    stream = sb.stream()
    # prepend a fractional-subframe junk offset: the tracker must align
    rng = np.random.default_rng(3)
    n_lead = CELL.sf_len // 3
    lead = (0.01 * (rng.standard_normal(n_lead)
                    + 1j * rng.standard_normal(n_lead))).astype(np.complex64)
    iq_path = tmp_path / "trace.iq"
    iq_mod.write_iq(str(iq_path), np.concatenate([lead, stream]))
    out_pcap = tmp_path / "out.pcap"
    rc = cli.main(["-i", str(iq_path), "-c", str(CELL.n_id_cell),
                   "-p", "50", "-P", "2", "-o", str(out_pcap),
                   "--sync", "-B", "8"])
    assert rc == 0
    recs = [r for r in pcap.read_pcap(str(out_pcap))
            if r.get("rnti") == rnti]
    assert len(recs) >= 15


@pytest.mark.skipif(sys.platform == "win32", reason="POSIX signals")
def test_cli_sigint_graceful_stop(tmp_path):
    """SIGINT mid-run drains in-flight work and still writes a valid pcap."""
    stream = _traffic_stream(n_sf=14)
    iq_path = tmp_path / "trace.iq"
    iq_mod.write_iq(str(iq_path), stream)
    out_pcap = tmp_path / "out.pcap"

    fired = {"n": 0}
    orig_init = core.LTESnifferCore._phase3

    def patched(self, ctx):
        orig_init(self, ctx)
        fired["n"] += 1
        if fired["n"] == 1:   # after the first batch resolves, interrupt
            os.kill(os.getpid(), signal.SIGINT)

    core.LTESnifferCore._phase3 = patched
    try:
        rc = cli.main(["-i", str(iq_path), "-c", str(CELL.n_id_cell),
                       "-p", "50", "-P", "2", "-o", str(out_pcap),
                       "-B", "4"])
    finally:
        core.LTESnifferCore._phase3 = orig_init
    assert rc == 0   # graceful: no KeyboardInterrupt escape
    # pcap header + the first batch's records are intact
    recs = pcap.read_pcap(str(out_pcap))
    assert isinstance(recs, list)
    # handler restored afterwards
    assert signal.getsignal(signal.SIGINT) not in (None,)


def test_live_mode_overload_drops_and_counts():
    """Live-mode overload shedding: when processing lags the radio's 1 ms
    cadence beyond the buffer ring, subframes are dropped and counted
    (`LTESniffer_Core.cc:443-451,557-562`)."""
    import io as _io
    import time as _time
    from ltesniffer_tpu.sniffer import observability as obs_mod

    sb = scenario.ScenarioBuilder(CELL, seed=5)
    for j in range(30):
        sb.add_subframe(j % 10, [])
    stream = sb.stream()
    cfg = core.SnifferConfig(cell=CELL, batch_size=4, heartbeat=True,
                             live_mode=True, live_buffer_sf=5)
    c = core.LTESnifferCore(cfg)
    c.heartbeat = obs_mod.Heartbeat(out=_io.StringIO(), every=10)
    # make per-subframe processing slower than real time
    c.on_subframe = lambda ctx: _time.sleep(0.004)
    c.run_stream(stream, chunk_subframes=4)
    s = c.summary()
    assert s["sf_skipped"] > 0
    assert s["subframes"] + s["sf_skipped"] <= 30
    assert c.heartbeat.skipped == s["sf_skipped"]


def test_run_source_chunked_blocks_equals_run_stream(tmp_path):
    """run_source over an SDR-style block source (odd block sizes forcing
    tail carry across reads) decodes the same records as the one-shot
    array path."""
    from ltesniffer_tpu.io import sdr as sdr_mod

    sb = scenario.ScenarioBuilder(CELL, seed=13)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"src-test")])
    rnti = 0x4242
    for j in range(30):
        sf = j % 10
        txs = []
        if j >= 2 and sf not in (0, 5):
            txs.append(scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=10,
                                     prb_start=12, harq_pid=j % 8,
                                     ndi=(j // 8) % 2))
        sb.add_subframe(sf, txs,
                        with_pbch_sfn=j // 10 if sf == 0 else None)
    stream = sb.stream()

    def run(source_blocks):
        cfg = core.SnifferConfig(cell=CELL, batch_size=8)
        c = core.LTESnifferCore(cfg)
        if source_blocks:
            src = sdr_mod.ArraySource(stream, CELL.srate,
                                      chunk_limit=CELL.sf_len * 3 + 777)
            c.run_source(src, chunk_subframes=8)
        else:
            c.run_stream(stream, chunk_subframes=8)
        return [(r.dci.rnti, r.dci.sfn, r.dci.sf_idx, r.crc_ok)
                for r in c.results]

    a = run(False)
    b = run(True)
    assert a == b
    assert sum(1 for r in a if r[0] == rnti and r[3]) >= 5


def test_file_source_reads_iq(tmp_path):
    from ltesniffer_tpu.io import iq as iq_mod, sdr as sdr_mod
    path = str(tmp_path / "s.iq")
    data = (np.arange(1000) + 1j * np.arange(1000)).astype(np.complex64)
    iq_mod.write_iq(path, data)
    src = sdr_mod.FileSource(path, 1.0)
    got = []
    while True:
        blk = src.read(333)
        if blk is None:
            break
        got.append(blk)
    src.close()
    np.testing.assert_array_equal(np.concatenate(got), data)


def test_soapy_source_gated():
    from ltesniffer_tpu.io import sdr as sdr_mod
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="SoapySDR"):
        sdr_mod.SoapySource("driver=uhd", 23.04e6, 2.14e9)
