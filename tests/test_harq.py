"""HARQ entity rules + soft-buffer pool + in-batch retransmission chains.

Mirrors the reference's classification semantics (`src/src/HARQ.cc:60-130`):
8 ms TTI recurrence (`comparetti`), NDI/TBS change -> new TX, DECODED skip,
150-RNTI DB bound, and the softbuffer pooling of `HARQ::init_HARQ`.
"""
import numpy as np
import jax.numpy as jnp

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.phy import tables
from ltesniffer_tpu.sniffer import pdcch_rx, pdsch_rx, trackers
from ltesniffer_tpu.testing import encoder

CELL = CellConfig(n_id_cell=77, n_prb=50, nof_ports=2, nof_rx_ant=1)
CFI = 2


# ---------------------------------------------------------------- entity
def test_harq_tti_distance_rule():
    """Same NDI but TTI distance != 8 ms -> new TX (`HARQ.cc:60-68`)."""
    h = trackers.HarqEntity()
    d0 = h.classify(0x100, 2, 0, ndi=1, tbs=1000, tti=100)
    assert not d0.is_retx
    # 8 ms later, same NDI -> re-TX
    d1 = h.classify(0x100, 2, 0, ndi=1, tbs=1000, tti=108)
    assert d1.is_retx
    # 16 ms after that (skipped one recurrence) -> new TX in the reference
    d2 = h.classify(0x100, 2, 0, ndi=1, tbs=1000, tti=124)
    assert not d2.is_retx
    # wraparound at TTI_MAX: last=10236, cur=4 -> distance 8 -> re-TX
    h.classify(0x200, 0, 0, ndi=0, tbs=500, tti=10236)
    dw = h.classify(0x200, 0, 0, ndi=0, tbs=500, tti=4)
    assert dw.is_retx


def test_harq_ndi_and_tbs_change():
    h = trackers.HarqEntity()
    h.classify(0x100, 1, 0, ndi=0, tbs=1000, tti=0)
    assert not h.classify(0x100, 1, 0, ndi=1, tbs=1000, tti=8).is_retx
    h2 = trackers.HarqEntity()
    h2.classify(0x100, 1, 0, ndi=0, tbs=1000, tti=0)
    # TBS changed at 8 ms, same NDI -> new TX (`HARQ.cc:110-113`)
    assert not h2.classify(0x100, 1, 0, ndi=0, tbs=2000, tti=8).is_retx


def test_harq_stored_tbs_for_mcs29_31():
    """Re-TX with unknown TBS (mcs 29-31 -> tbs<=0) uses the stored TBS."""
    h = trackers.HarqEntity()
    h.classify(0x321, 5, 0, ndi=1, tbs=4392, tti=20)
    d = h.classify(0x321, 5, 0, ndi=1, tbs=0, tti=28)
    assert d.is_retx and d.tbs == 4392


def test_harq_decoded_skip():
    """Re-TX of an already-decoded TB is flagged DECODED
    (`HARQ.cc:121-127`, `last_decoded`)."""
    h = trackers.HarqEntity()
    h.classify(0x100, 0, 0, ndi=0, tbs=1000, tti=0)
    h.report_crc(0x100, 0, 0, True)
    d = h.classify(0x100, 0, 0, ndi=0, tbs=1000, tti=8)
    assert d.is_retx and d.decoded
    # new TX clears the flag
    d2 = h.classify(0x100, 0, 0, ndi=1, tbs=1000, tti=16)
    assert not d2.is_retx
    d3 = h.classify(0x100, 0, 0, ndi=1, tbs=1000, tti=24)
    assert d3.is_retx and not d3.decoded


def test_harq_db_bound_and_prune():
    h = trackers.HarqEntity()
    for r in range(trackers.HarqEntity.MAX_RNTIS):
        h.classify(100 + r, 0, 0, ndi=0, tbs=100, tti=0)
    # DB full: RNTI 151 gets FULL_BUFFER treatment (new TX, untracked)
    d = h.classify(9999, 0, 0, ndi=0, tbs=100, tti=0)
    assert not d.is_retx and 9999 not in h._rntis
    # after pruning idle entries there is room again
    h.prune(now_tti=6000)
    assert len(h._rntis) == 0
    h.classify(9999, 0, 0, ndi=0, tbs=100, tti=6000)
    assert 9999 in h._rntis


# ---------------------------------------------------------------- pool
def test_soft_buffer_pool_bound_and_clear():
    pool = trackers.SoftBufferPool(max_buffers=4)
    for i in range(6):
        pool[((0x100, i, 0), 0)] = np.zeros(3)
    assert len(pool) == 4
    # oldest two were evicted
    assert ((0x100, 0, 0), 0) not in pool and ((0x100, 1, 0), 0) not in pool
    # clear_harq drops all code blocks of one process
    pool[((0x200, 0, 0), 0)] = np.ones(3)
    pool[((0x200, 0, 0), 1)] = np.ones(3)
    pool.clear_harq((0x200, 0, 0))
    assert not any(k[0] == (0x200, 0, 0) for k in pool)
    # pop keeps the index consistent
    k = ((0x100, 4, 0), 0)
    pool.pop(k, None)
    assert k not in pool and pool.pop(k, "dflt") == "dflt"
    pool[k] = np.zeros(1)
    assert k in pool


# ------------------------------------------------- in-batch combining
def _tx(sf_idx, rnti, prb_mask, qm, tb, rng, noise, rv):
    g = encoder.build_control_subframe(CELL, sf_idx, CFI, [])
    encoder.add_pdsch(g, CELL, sf_idx, CFI, rnti, prb_mask, qm, tb, rv=rv)
    h = encoder.flat_channel(CELL, 1, rng)
    return encoder.subframe_iq(CELL, encoder.apply_channel(g, h, noise, rng))


def test_in_batch_harq_chain_combines():
    """Two transmissions of the same TB (same HARQ key) inside ONE
    dispatch_grants_batch call must soft-combine: the rv0 row's LLRs feed
    the rv2 row's prior (occurrence-round chaining), not overwrite it."""
    rng = np.random.default_rng(4)
    prb_mask = np.zeros(50, dtype=bool)
    prb_mask[0:8] = True
    tbs = tables.tbs_lookup(15, 8)
    tb = rng.integers(0, 2, tbs).astype(np.uint8)
    run, st = pdcch_rx.make_pipeline(CELL, CFI)
    key = (0x7777, 0, 0)
    seen = []
    for noise in (0.35, 0.45, 0.55, 0.65):
        iq0 = _tx(6, 0x7777, prb_mask, 4, tb, rng, noise, rv=0)
        iq1 = _tx(6, 0x7777, prb_mask, 4, tb, rng, noise, rv=2)
        out = run(jnp.asarray(np.stack([iq0, iq1]).astype(np.complex64)),
                  jnp.asarray(np.asarray([6, 6], np.int32)))
        bufs = trackers.SoftBufferPool()
        # the second occurrence carries is_retx (as the core's sequential
        # HARQ classify would set it): only genuine retransmissions chain —
        # a same-key NEW transmission overwrites the buffer instead
        jobs = [pdsch_rx.GrantJob(b=b, sf_idx=6, cfi=CFI, rnti=0x7777,
                                  prb_mask=prb_mask, qm=4, tbs=tbs, rv=rv,
                                  harq_key=key, is_retx=(b == 1))
                for b, rv in ((0, 0), (1, 2))]
        res = pdsch_rx.decode_grants_batch(
            out["grids"], out["h"], out["noise_var"], CELL, jobs,
            soft_buffers=bufs)
        oks = [r.crc_ok for r in res]
        if oks == [False, True]:
            np.testing.assert_array_equal(res[1].tb_bits, tb)
            assert not bufs   # cleared after the TB decoded
        seen.append(tuple(oks))
    # at some noise point single-tx fails but the in-batch combination wins
    assert (False, True) in seen, seen
