import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.testing import encoder
from ltesniffer_tpu.sniffer import frontend, pbch_rx


def _roundtrip(cell, sfn, noise, rng):
    g = encoder.build_control_subframe(cell, 0, 1, [])
    encoder.add_pbch(g, cell, sfn)
    h = encoder.flat_channel(cell, cell.nof_rx_ant, rng)
    iq = encoder.subframe_iq(cell, encoder.apply_channel(g, h, noise, rng))
    fe = frontend.make_frontend(cell)
    out = fe(jnp.asarray(iq[None].astype(np.complex64)),
             jnp.asarray([0], np.int32))
    return pbch_rx.decode_mib(np.asarray(out["grids"][0]),
                              np.asarray(out["h"][0]),
                              np.asarray(out["noise_var"][0]), cell)


def test_mib_roundtrip_2ports():
    cell = CellConfig(n_id_cell=211, n_prb=50, nof_ports=2)
    rng = np.random.default_rng(0)
    for sfn in (0, 1, 2, 3, 400, 1021):
        r = _roundtrip(cell, sfn, 0.05, rng)
        assert r.ok, sfn
        assert r.nof_ports == 2
        assert r.sfn == sfn
        assert r.n_prb == 50


def test_mib_roundtrip_1port():
    cell = CellConfig(n_id_cell=33, n_prb=100, nof_ports=1)
    rng = np.random.default_rng(1)
    r = _roundtrip(cell, 8, 0.05, rng)
    assert r.ok and r.nof_ports == 1 and r.sfn == 8 and r.n_prb == 100


def test_mib_phich_config_carried():
    cell = CellConfig(n_id_cell=7, n_prb=25, nof_ports=2, phich_resources=2.0)
    rng = np.random.default_rng(2)
    r = _roundtrip(cell, 40, 0.03, rng)
    assert r.ok and r.phich_ng == 2.0


def test_mib_no_false_positive_on_noise():
    cell = CellConfig(n_id_cell=211, n_prb=50, nof_ports=2)
    rng = np.random.default_rng(3)
    iq = (0.7 * (rng.standard_normal((1, cell.sf_len))
                 + 1j * rng.standard_normal((1, cell.sf_len)))).astype(np.complex64)
    fe = frontend.make_frontend(cell)
    out = fe(jnp.asarray(iq[None]), jnp.asarray([0], np.int32))
    r = pbch_rx.decode_mib(np.asarray(out["grids"][0]), np.asarray(out["h"][0]),
                           np.asarray(out["noise_var"][0]), cell)
    assert not r.ok
