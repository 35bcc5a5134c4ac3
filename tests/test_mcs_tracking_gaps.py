"""MCSTracking parity gaps closed in round 3.

* wrong-MIMO counting + eviction of only-wrong-MIMO RNTIs
  (`MCSTracking.cc:98-110`)
* UE-config learned from RRC ConnectionSetup regardless of api mode
  (`DL_Sniffer_PDSCH.cc:1041-1070`)
* p_a applied in the PDSCH decode (`MCSTracking.cc:1446-1529`)
* UCI Q' sized from the TB's initial grant (36.212 5.2.2.6)
"""
import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.mac_rrc import mac, rrc
from ltesniffer_tpu.phy import tables
from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import core, frontend, pdsch_rx, trackers
from ltesniffer_tpu.testing import encoder, scenario

CELL = CellConfig(n_id_cell=55, n_prb=50, nof_ports=2, nof_rx_ant=1)


def test_wrong_mimo_counted_and_evicted():
    mcs = trackers.MCSTracking()
    rnti = 0x4242
    mcs.learn_dl_table(rnti, trackers.McsTable.QAM64)
    for k in range(trackers.MCSTracking.WRONG_MIMO_LIMIT - 1):
        assert not mcs.note_wrong_mimo(rnti)
    assert mcs.stats_dl[rnti].wrong_mimo == 7
    # the eviction threshold: only-wrong-MIMO RNTIs get pruned
    assert mcs.note_wrong_mimo(rnti)
    assert rnti not in mcs.stats_dl and rnti not in mcs.dl_table
    # an RNTI with successes is never evicted
    mcs2 = trackers.MCSTracking()
    mcs2.stat_dl(rnti).success = 3
    for k in range(20):
        assert not mcs2.note_wrong_mimo(rnti)


def test_wrong_mimo_from_core_2tb_on_1rx(tmp_path):
    """A 2-codeword format-2A grant on a 1-RX-antenna receiver is counted
    as W_MIMO, not half-decoded."""
    sb = scenario.ScenarioBuilder(CELL, seed=41)
    rnti = 0x4747
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=3, payload=b"warmup")])
    for j in range(8):   # warm up the RNTI through format 1A traffic
        txs = ([scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=8, prb_start=0,
                              harq_pid=j % 8, ndi=(j // 8) % 2)]
               if j >= 1 else [])
        sb.add_subframe(j % 10, txs)
    c = core.LTESnifferCore(core.SnifferConfig(cell=CELL, batch_size=8))
    c.run_samples(sb.stream())
    before = c.mcs.stats_dl[rnti].wrong_mimo
    # hand-craft a 2-TB grant arriving at the handler
    from ltesniffer_tpu.phy import dci as dci_mod
    mask = np.zeros(50, bool)
    mask[:8] = True
    grant = dci_mod.DlGrant(
        rnti=rnti, fmt="2A", prb_mask=mask, prb_mask_slot1=mask.copy(),
        mcs=5, mcs2=5, rv=0, rv2=0, ndi=0, ndi2=0, harq_pid=0, nof_tb=2)
    a = type("A", (), dict(rnti=rnti, fmt="2A", payload=None, l=2, ncce=0,
                           histval=9, sf_idx=0, sfn=0))()
    a._grant = grant
    c._handle_dl_dci(None, 0, 2, a, 0, 0)
    assert c.mcs.stats_dl[rnti].wrong_mimo == before + 1


def test_ue_config_learned_without_api_mode(tmp_path):
    """RRC ConnectionSetup in a DL CCCH SDU configures the UE DB even with
    api_mode off (the reference learns unconditionally)."""
    setup = rrc.RrcConnectionSetup(p_a_db=-3.0, cqi_offset=8, ack_offset=9,
                                   ri_offset=7, tm=4)
    sdu = rrc.encode_connection_setup(setup)
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=mac.LCID_CCCH, payload=sdu)])
    sb = scenario.ScenarioBuilder(CELL, seed=42)
    rnti = 0x4D4D
    for j in range(8):
        txs = ([scenario.DlTx(rnti=rnti, mac_pdu=pdu, n_prb=8, prb_start=4,
                              harq_pid=j % 8, ndi=(j // 8) % 2)]
               if j >= 1 else [])
        sb.add_subframe(j % 10, txs)
    cfg = core.SnifferConfig(cell=CELL, batch_size=8)   # api_mode = -1
    c = core.LTESnifferCore(cfg)
    c.run_samples(sb.stream())
    assert c.api is None
    assert rnti in c.mcs.ue_config
    uc = c.mcs.ue_config[rnti]
    assert uc.p_a == -3.0 and uc.tm == 4
    assert uc.uci_offset_ack == 9 and uc.uci_offset_ri == 7
    # p_a now feeds the decode scale
    assert abs(c._pa_of(rnti) - 10 ** (-3.0 / 20)) < 1e-6
    assert c._pa_of(0x1234) == 1.0


def test_pa_scaling_decodes_derated_pdsch():
    """PDSCH transmitted 6 dB below CRS decodes when p_a=-6 is applied
    (and the 64QAM decode fails without the scale at low margin)."""
    rng = np.random.default_rng(43)
    cell = CELL
    prb_mask = np.zeros(50, bool)
    prb_mask[0:16] = True
    qm = 6
    _, i_tbs = tables.dl_mcs_to_qm_itbs(20)
    tbs = tables.tbs_lookup(i_tbs, 16)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    g = encoder.build_control_subframe(cell, 1, 2, [])
    encoder.add_pdsch(g, cell, 1, 2, 0x5050, prb_mask, qm, tb,
                      amplitude=10 ** (-6.0 / 20.0))
    h = encoder.flat_channel(cell, 1, rng, selective=False)
    iq = encoder.subframe_iq(cell, encoder.apply_channel(g, h, 0.015, rng))
    fe = frontend.make_frontend(cell)
    out = fe(jnp.asarray(iq[None].astype(np.complex64)),
             jnp.asarray([1], np.int32))
    ok = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, cell, 1, 2,
        rnti=0x5050, prb_mask=prb_mask, qm=qm, tbs=tbs,
        pa=10 ** (-6.0 / 20.0))
    assert ok.crc_ok
    np.testing.assert_array_equal(ok.tb_bits, tb)
    bad = pdsch_rx.decode_grant(
        out["grids"], out["h"], out["noise_var"], 0, cell, 1, 2,
        rnti=0x5050, prb_mask=prb_mask, qm=qm, tbs=tbs, pa=1.0)
    assert not bad.crc_ok


def test_uci_qprime_uses_initial_grant():
    hist = trackers.UlGrantHistory()
    # new TX: 10 PRB
    assert hist.initial_dims(0x3333, ndi=1, n_prb=10, mcs=6) == (10, 6)
    # adaptive retransmission (same NDI, different allocation): initial dims
    assert hist.initial_dims(0x3333, ndi=1, n_prb=4, mcs=8) == (10, 6)
    # NDI toggles -> new TB, new dims
    assert hist.initial_dims(0x3333, ndi=0, n_prb=4, mcs=8) == (4, 8)
    # independent RNTIs
    assert hist.initial_dims(0x4444, ndi=0, n_prb=20, mcs=10) == (20, 10)


def test_ue_config_learned_from_reconfiguration():
    """A Reconfiguration-carried radioResourceConfigDedicated updates the
    UE config DB like a ConnectionSetup does (`MCSTracking.cc:1446-1529`)."""
    from ltesniffer_tpu.phy.params import CellConfig
    from ltesniffer_tpu.sniffer import core
    setup = rrc.RrcConnectionSetup(p_a_db=-3.0, ack_offset=9, ri_offset=7,
                                   cqi_offset=8, tm=3)
    # build a reconfiguration carrying the full ConnectionSetup-grade phys
    # config by splicing the setup encoder's RRCD into a reconfig wrapper
    from ltesniffer_tpu.mac_rrc.uper import BitWriter
    w = BitWriter()
    w.write(0, 1)            # c1
    w.write(4, 4)            # rrcConnectionReconfiguration
    w.write(0, 2)            # transaction id
    w.write(0, 1)            # criticalExtensions c1
    w.write(0, 3)            # r8
    w.write(0, 1)            # measConfig absent
    w.write(0, 1)            # mobilityControlInfo absent
    w.write(0, 1)            # dedicatedInfoNASList absent
    w.write(1, 1)            # radioResourceConfigDedicated present
    w.write(0, 1)            # securityConfigHO absent
    w.write(0, 1)            # nonCriticalExtension absent
    # RRCD body identical to encode_connection_setup's (skip its 10-bit
    # header: c1(1)+choice(2)+tid(2)+crit(1)+c1(3)+noncrit(1))
    full = rrc.encode_connection_setup(setup)
    r = __import__("ltesniffer_tpu.mac_rrc.uper", fromlist=["BitReader"]
                   ).BitReader(full)
    r.read(10)
    while r.bits_left() >= 1:
        w.write(r.read(1), 1)
    sdu = w.to_bytes()
    out = rrc.decode_dl_dcch(sdu)
    assert out[0] == "reconfiguration" and out[1].setup is not None
    assert out[1].setup.p_a_db == -3.0 and out[1].setup.tm == 3

    cell = CellConfig(n_id_cell=7, n_prb=15, nof_ports=2)
    c = core.LTESnifferCore(core.SnifferConfig(cell=cell))
    pdu = mac.build_mac_pdu([mac.MacSubPdu(lcid=1, payload=sdu)])
    c._learn_ue_config(0x4777, pdu)
    cfg = c.mcs.ue_config[0x4777]
    assert cfg.p_a == -3.0
    assert (cfg.uci_offset_ack, cfg.uci_offset_ri,
            cfg.uci_offset_cqi, cfg.tm) == (9, 7, 8, 3)
