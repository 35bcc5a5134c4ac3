import numpy as np

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import sync


def _stream(cell, sf_range, rng, noise=0.05, lead=777):
    """Concatenated subframes with `lead` junk samples in front."""
    chunks = [0.01 * (rng.standard_normal(lead) + 1j * rng.standard_normal(lead))]
    h = encoder.flat_channel(cell, 1, rng, selective=False)
    for sf in sf_range:
        g = encoder.build_control_subframe(cell, sf % 10, 1, [])
        rxg = encoder.apply_channel(g, h, noise, rng)
        chunks.append(encoder.subframe_iq(cell, rxg)[0])
    return np.concatenate(chunks).astype(np.complex64)


def test_find_cell_from_stream():
    cell = CellConfig(n_id_cell=123, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(0)
    stream = _stream(cell, range(0, 10), rng)
    res = sync.find_cell(stream[:cell.sf_len * 2], cell.n_fft)
    assert res is not None
    assert res.n_id_cell == 123
    assert not res.is_subframe5
    assert abs(res.subframe_offset - 777) <= 2
    assert abs(res.cfo) < 0.05


def test_find_cell_sf5_phase():
    cell = CellConfig(n_id_cell=45, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(1)
    stream = _stream(cell, range(5, 15), rng)   # starts at subframe 5
    res = sync.find_cell(stream[:cell.sf_len * 2], cell.n_fft)
    assert res is not None and res.n_id_cell == 45
    assert res.is_subframe5


def test_cfo_estimation_and_correction():
    cell = CellConfig(n_id_cell=9, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(2)
    stream = _stream(cell, range(0, 3), rng, noise=0.02)
    eps = 0.21   # fractional CFO in subcarrier units
    n = np.arange(len(stream))
    shifted = (stream * np.exp(2j * np.pi * eps * n / cell.n_fft)).astype(np.complex64)
    res = sync.find_cell(shifted[:cell.sf_len * 2], cell.n_fft)
    assert res is not None
    assert abs(res.cfo - eps) < 0.03
    fixed = sync.correct_cfo(shifted, res.cfo, cell.n_fft)
    res2 = sync.find_cell(fixed[:cell.sf_len * 2], cell.n_fft)
    assert abs(res2.cfo) < 0.03


def test_no_cell_in_noise():
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal(40000) + 1j * rng.standard_normal(40000)
             ).astype(np.complex64)
    assert sync.find_cell(noise, 512) is None


def test_subframe_tracker_frames():
    cell = CellConfig(n_id_cell=123, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(4)
    stream = _stream(cell, range(0, 6), rng)
    res = sync.find_cell(stream[:cell.sf_len * 2], cell.n_fft)
    tr = sync.SubframeTracker(cell, res.subframe_offset,
                              5 if res.is_subframe5 else 0, res.cfo)
    frames = list(tr.frames(stream))
    assert len(frames) == 6
    assert [s for s, _ in frames] == [0, 1, 2, 3, 4, 5]
    assert all(len(x) == cell.sf_len for _, x in frames)


def test_chest_cfo_estimate_and_core_feedback():
    """Fine CFO visible to chest; the core's feedback loop corrects it."""
    import jax.numpy as jnp
    from ltesniffer_tpu.sniffer import frontend, core
    from ltesniffer_tpu.phy import dci as dci_mod, ra
    cell = CellConfig(n_id_cell=77, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(7)
    eps = 0.02   # small residual CFO in subcarrier units
    d = dci_mod.Dci(fmt="1A", rnti=0xFFFF, fields=dict(
        flag0_1a=1, riv=ra.start_len_to_riv(0, 4, 25), mcs=2))
    h = encoder.flat_channel(cell, 1, rng, selective=False)
    frames = []
    for j in range(24):
        g = encoder.build_control_subframe(cell, j % 10, 2, [
            encoder.TxDci(dci=d, L=2, ncce=0)] if j % 10 == 5 else [])
        iq = encoder.subframe_iq(cell, encoder.apply_channel(g, h, 0.03, rng))[0]
        n0 = j * cell.sf_len
        rot = np.exp(2j * np.pi * eps * (n0 + np.arange(cell.sf_len))
                     / cell.n_fft)
        frames.append((iq * rot).astype(np.complex64))
    stream = np.concatenate(frames)

    # chest-level estimate on the first subframe
    fe = frontend.make_frontend(cell)
    out = fe(stream[:cell.sf_len][None, None, :], np.asarray([0], np.int32))
    assert abs(float(out["cfo"][0]) - eps) < 0.01

    # core-level: feedback loop keeps SNR/decoding healthy across batches
    cfg = core.SnifferConfig(cell=cell, batch_size=8, decode_pdsch=False)
    c = core.LTESnifferCore(cfg)
    c.run_samples(stream)
    assert abs(c.est_cfo - eps) < 0.015


# ---------------------------------------------------------------- tracking
def test_tracker_corrects_timing_drift():
    """Samples dropped mid-stream (integer drift): the PSS re-correlation
    at the next sf0/5 re-aligns framing within the tracking window."""
    cell = CellConfig(n_id_cell=123, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(7)
    stream = _stream(cell, range(0, 30), rng, lead=0)
    # drop 9 samples inside subframe 12 (not PSS-bearing)
    cut = cell.sf_len * 12 + 1000
    stream = np.concatenate([stream[:cut], stream[cut + 9:]])
    tr = sync.SubframeTracker(cell, 0, 0)
    frames = list(tr.frames(stream))
    assert tr.drift_corrections >= 1
    assert tr.resyncs == 0
    # the last PSS-bearing frame must be cleanly aligned
    sf_idx, f = [x for x in frames if x[0] in (0, 5)][-1]
    from ltesniffer_tpu.kernels import ofdm
    off = ofdm.symbol_starts(cell.n_fft)[6]
    rep = sync.pss_time_replicas(cell.n_fft)[cell.n_id_cell % 3]
    seg = f[off:off + cell.n_fft]
    m = abs(np.vdot(rep, seg)) / (np.linalg.norm(seg) + 1e-12)
    assert m > 0.8, m


def test_tracker_reacquires_after_gap():
    """A gap far larger than the tracking window forces 5 PSS misses and a
    full re-acquisition (reference 5-loss -> DECODE_MIB analog)."""
    cell = CellConfig(n_id_cell=123, n_prb=25, nof_ports=2)
    rng = np.random.default_rng(8)
    stream = _stream(cell, range(0, 60), rng, lead=0)
    cut = cell.sf_len * 14 + 321
    gap = int(cell.sf_len * 2.5)
    stream = np.concatenate([stream[:cut], stream[cut + gap:]])
    tr = sync.SubframeTracker(cell, 0, 0)
    frames = list(tr.frames(stream))
    assert tr.resyncs >= 1
    # after re-acquisition the sf_idx labels follow the transmitted pattern
    tail = [x for x in frames if x[0] in (0, 5)][-1]
    sf_idx, f = tail
    from ltesniffer_tpu.kernels import ofdm
    off = ofdm.symbol_starts(cell.n_fft)[6]
    rep = sync.pss_time_replicas(cell.n_fft)[cell.n_id_cell % 3]
    seg = f[off:off + cell.n_fft]
    m = abs(np.vdot(rep, seg)) / (np.linalg.norm(seg) + 1e-12)
    assert m > 0.8, m
