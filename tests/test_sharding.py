"""Multi-device sharding: output equality vs single-device, 8-way CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import dci as dci_mod, ra
from ltesniffer_tpu.parallel import sharding
from ltesniffer_tpu.sniffer import pdcch_rx
from ltesniffer_tpu.testing import encoder

CELL = CellConfig(n_id_cell=210, n_prb=25, nof_ports=2, nof_rx_ant=1)
CFI = 2


def _batch(B, rng):
    iqs, sfs = [], []
    for j in range(B):
        txs = []
        if j % 2 == 0:
            d = dci_mod.Dci(fmt="1A", rnti=0xFFFF, fields=dict(
                flag0_1a=1, riv=ra.start_len_to_riv(0, 4, 25), mcs=3))
            txs.append(encoder.TxDci(dci=d, L=3, ncce=0))
        g = encoder.build_control_subframe(CELL, j % 10, CFI, txs)
        h = encoder.flat_channel(CELL, 1, rng)
        iqs.append(encoder.subframe_iq(
            CELL, encoder.apply_channel(g, h, 0.05, rng))[0])
        sfs.append(j % 10)
    return (np.stack(iqs)[:, None, :].astype(np.complex64),
            np.asarray(sfs, np.int32))


def test_sharded_pipeline_matches_single_device():
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    samples, sfs = _batch(8, rng)

    # single device reference
    run, st = pdcch_rx.make_pipeline(CELL, CFI)
    ref = run(jnp.asarray(samples), jnp.asarray(sfs))
    ref = {k: np.asarray(v) for k, v in ref.items()}

    mesh = sharding.make_mesh(jax.devices()[:8])
    fe = sharding.make_sharded_frontend(CELL, mesh)
    search, st2 = sharding.make_sharded_search(CELL, CFI, mesh)
    s_d, sf_d = sharding.shard_subframes(mesh, samples, sfs)
    out_fe = fe(s_d, sf_d)
    out = search(out_fe["grids"], out_fe["h"], out_fe["noise_var"],
                 out_fe["snr_db"], sf_d)
    D = st["sizes"]["1A"] + 16
    np.testing.assert_array_equal(np.asarray(out[f"rnti_{D}"]),
                                  ref[f"rnti_{D}"])
    np.testing.assert_allclose(np.asarray(out["cce_power"]),
                               ref["cce_power"], rtol=1e-4, atol=1e-5)
    # verify it actually ran sharded
    assert len(out[f"rnti_{D}"].sharding.device_set) == 8


def test_merge_accepted_orders_by_time():
    from ltesniffer_tpu.sniffer.dci_search import AcceptedDci
    a = AcceptedDci(rnti=1, fmt="1A", l=0, ncce=0, payload=np.zeros(1),
                    histval=0, sf_idx=5, sfn=0)
    b = AcceptedDci(rnti=2, fmt="1A", l=0, ncce=0, payload=np.zeros(1),
                    histval=0, sf_idx=0, sfn=0)
    merged = sharding.merge_accepted([[a], [b]], [0, 1000])
    assert [x.rnti for x in merged] == [1, 2]
