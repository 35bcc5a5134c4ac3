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
