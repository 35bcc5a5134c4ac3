import numpy as np
import pytest

from ltesniffer_tpu.phy import dci, ra, search_space, tables
from ltesniffer_tpu.phy.params import CellConfig


CELL50 = CellConfig(n_id_cell=1, n_prb=50, nof_ports=2)
CELL100 = CellConfig(n_id_cell=1, n_prb=100, nof_ports=2)


def test_format_sizes_50prb_2ports():
    s = dci.format_sizes(CELL50)
    # 10 MHz reference sizes (well-known FALCON/OWL values)
    assert s["0"] == 27 and s["1A"] == 27
    assert s["1"] == 31
    assert s["1C"] == 13
    assert s["2"] == 43
    assert s["2A"] == 41   # raw 40 is ambiguous -> 41
    assert s["1B"] == 28 and s["1D"] == 28
    assert s["2B"] == 41


def test_format_sizes_100prb_2ports():
    s = dci.format_sizes(CELL100)
    riv = ra.riv_nbits(100)   # ceil(log2(5050)) = 13
    assert riv == 13
    assert s["1A"] == 28 and s["0"] == 28
    assert s["1"] == 1 + 25 + 5 + 3 + 1 + 2 + 2   # = 39


def test_riv_roundtrip():
    for n in (6, 15, 25, 50, 100):
        for start, length in ((0, 1), (0, n), (3, 5), (n - 1, 1), (n // 2, n // 2)):
            if start + length > n:
                continue
            riv = ra.start_len_to_riv(start, length, n)
            s, l = ra.riv_to_start_len(riv, n)
            assert (s, l) == (start, length), (n, start, length, riv)


def test_type0_bitmap_roundtrip():
    n = 50
    mask = np.zeros(n, dtype=bool)
    mask[0:3] = True     # RBG 0 (P=3)
    mask[48:50] = True   # last (short) RBG
    bm = ra.mask_to_type0_bitmap(mask)
    np.testing.assert_array_equal(ra.type0_bitmap_to_mask(bm, n), mask)


def test_dci_pack_unpack_roundtrip():
    d = dci.Dci(fmt="1A", rnti=0x1234, fields=dict(
        flag0_1a=1, vrb_flag=0, riv=ra.start_len_to_riv(5, 10, 50),
        mcs=17, harq_pid=3, ndi=1, rv=2, tpc=1))
    bits = dci.pack(d, CELL50)
    assert len(bits) == 27
    back = dci.unpack(bits, "1A", CELL50, rnti=0x1234)
    for k, v in d.fields.items():
        assert back[k] == v, k


def test_format0_1a_resolution():
    d0 = dci.Dci(fmt="0", rnti=1, fields=dict(flag0_1a=0, riv=1, mcs=3))
    d1a = dci.Dci(fmt="1A", rnti=1, fields=dict(flag0_1a=1, riv=1, mcs=3))
    assert dci.resolve_format(dci.pack(d0, CELL50), "0") == "0"
    assert dci.resolve_format(dci.pack(d1a, CELL50), "1A") == "1A"


def test_dl_grant_from_format1_type0():
    bm = ra.mask_to_type0_bitmap(np.arange(50) < 6)
    d = dci.Dci(fmt="1", rnti=70, fields=dict(
        ra_header=0, bitmap=bm, mcs=9, harq_pid=1, ndi=0, rv=0, tpc=0))
    g = dci.dl_grant_from_dci(d, CELL50)
    assert g.n_prb_alloc == 6
    assert g.nof_tb == 1 and g.mcs == 9


def test_dl_grant_from_format1a_localized():
    d = dci.Dci(fmt="1A", rnti=70, fields=dict(
        flag0_1a=1, vrb_flag=0, riv=ra.start_len_to_riv(10, 4, 50), mcs=5))
    g = dci.dl_grant_from_dci(d, CELL50)
    assert g.prb_mask[10:14].all() and g.n_prb_alloc == 4


def test_ul_grant_from_format0():
    d = dci.Dci(fmt="0", rnti=70, fields=dict(
        flag0_1a=0, hopping=0, riv=ra.start_len_to_riv(8, 25, 50),
        mcs=20, ndi=1, dmrs_cs=2, cqi_request=0))
    g = dci.ul_grant_from_dci(d, CELL50)
    assert (g.prb_start, g.n_prb) == (8, 25)
    assert ra.valid_dft_prb(g.n_prb)
    assert not ra.valid_dft_prb(7)


def test_format1c_prbs_within_band():
    for n in (25, 50, 100):
        prb0, prb1, length = ra.format1c_prbs(0, n)
        assert length >= 2
        assert prb0.max() < n and prb1.max() < n
        assert len(set(prb0.tolist())) == len(prb0)


def test_tbs_table_anchors():
    t = tables.tbs_table()
    # exact 1-PRB column
    np.testing.assert_array_equal(t[:27, 0], tables.TBS_1PRB)
    # monotone along both axes (ordered rows 0..33; 32A/33A sit off-ladder)
    assert (np.diff(t[:34], axis=0) >= 0).all()
    assert (np.diff(t, axis=1) >= 0).all()
    # all entries are zero-filler-compatible sizes
    allowed = set(tables.allowed_tbs_set().tolist())
    assert set(np.unique(t).tolist()) <= allowed
    # 32A between rows 32 and 33; 33A above 33
    assert (t[32] <= t[tables.ITBS_32A]).all()
    assert (t[tables.ITBS_32A] <= t[33]).all()
    assert (t[33] <= t[tables.ITBS_33A]).all()


# Published 36.213 Table 7.1.7.2.1-1 columns (fixtures): the 50-PRB and
# 100-PRB columns for every row 0..26, as reproduced across LTE throughput
# references.  These two columns pin the per-row slope the tail quantization
# is anchored to (see tables_data.py provenance notes).
TBS_COL_50 = [1384, 1800, 2216, 2856, 3624, 4392, 5160, 6200, 6968, 7992,
              8760, 9912, 11448, 12960, 14112, 15264, 16416, 18336, 19848,
              21384, 22920, 25456, 27376, 29296, 30576, 31704, 36696]
TBS_COL_100 = [2792, 3624, 4584, 5736, 7224, 8760, 10296, 12216, 14112,
               15840, 17568, 19848, 22920, 25456, 28336, 30576, 32856,
               36696, 39232, 43816, 46888, 51024, 55056, 57336, 61664,
               63776, 75376]


def test_tbs_published_columns():
    t = tables.tbs_table()
    np.testing.assert_array_equal(t[:27, 49], TBS_COL_50)
    np.testing.assert_array_equal(t[:27, 99], TBS_COL_100)
    # every main-table entry is on the spec TBS ladder (the distinct values
    # the published table uses — much sparser than the zero-filler set)
    ladder = set(tables.spec_tbs_ladder().tolist())
    assert set(np.unique(t[:34]).tolist()) <= ladder


def test_tbs_published_spot_values():
    """Published 36.213 Table 7.1.7.2.1-1 values."""
    # LTE Cat-4 per-codeword peak (MCS 28, 100 PRB)
    assert tables.tbs_lookup(26, 100) == 75376
    assert tables.tbs_lookup(26, 110) == 75376
    # LTE Cat-1 peak (10.3 Mbps)
    assert tables.tbs_lookup(6, 100) == 10296
    # the round-2 audit point: published value, not 16416
    assert tables.tbs_lookup(9, 100) == 15840
    # 256QAM per-codeword peak
    assert tables.tbs_lookup(33, 100) == 97896
    # row 32A is the published v15 row (reference ul_sniffer_pusch.c:7-17)
    assert tables.tbs_lookup(tables.ITBS_32A, 1) == 904
    assert tables.tbs_lookup(tables.ITBS_32A, 50) == 46888
    assert tables.tbs_lookup(tables.ITBS_32A, 100) == 93800
    assert tables.tbs_lookup(tables.ITBS_32A, 110) == 101840
    # classic small anchors
    assert tables.tbs_lookup(0, 1) == 16
    assert tables.tbs_lookup(9, 10) == 1544
    assert tables.tbs_lookup(15, 50) == 15264
    # Format 1C table
    assert tables.tbs_format1c(0) == 40
    assert tables.tbs_format1c(31) == 1736


def test_tbs_2layer_translation():
    # published large-baseline pairs (7.1.7.2.2-1)
    assert tables.tbs_2layer(75376) == 149776   # Cat-5 per-codeword peak
    assert tables.tbs_2layer(48936) == 97896
    assert tables.tbs_2layer(42368) == 84760
    assert tables.tbs_2layer(52752) == 105528
    # the generation rule must reproduce every transcribed published pair
    from ltesniffer_tpu.phy.tables import _TBS_2LAYER_LARGE, spec_tbs_ladder
    import numpy as _np
    ladder2 = _np.array(sorted(set(spec_tbs_ladder().tolist())
                               | set(_TBS_2LAYER_LARGE.values()) | {195816}))
    for b, want in _TBS_2LAYER_LARGE.items():
        j = int(_np.searchsorted(ladder2, 2 * b + 24))
        lo, hi = int(ladder2[max(j - 1, 0)]), int(ladder2[min(j, len(ladder2) - 1)])
        got = lo if (2 * b + 24) - lo <= hi - (2 * b + 24) else hi
        assert got == want, (b, got, want)
    # published small/mid pairs
    assert tables.tbs_2layer(1544) == 3112
    assert tables.tbs_2layer(18336) == 36696
    assert tables.tbs_2layer(36696) == 73712
    # monotone: a larger baseline never translates smaller
    vals = sorted(set(_np.unique(tables.tbs_table()).tolist()))
    trans = [tables.tbs_2layer(v) for v in vals if v > 0]
    assert all(b <= a for a, b in zip(trans[1:], trans))


def test_qpp_permutations_valid():
    coeffs = tables.qpp_coefficients()
    ks = tables.turbo_k_sizes()
    assert len(ks) == 188 and len(coeffs) == 188
    # published anchors (36.212 Table 5.1.3-3)
    assert coeffs[40] == (3, 10) and coeffs[6144] == (263, 480)
    assert coeffs[512] == (31, 64) and coeffs[1024] == (31, 64)
    assert coeffs[2048] == (31, 64) and coeffs[128] == (15, 32)
    for k in ks.tolist():
        pi = tables.qpp_interleave_indices(k)
        assert len(np.unique(pi)) == k


def test_ul_256qam_mcs_mapping():
    """36.213 Table 8.6.1-3 incl. the 32A/33A special rows
    (reference ul_fill_ra_mcs_256, ul_sniffer_pusch.c:91-135)."""
    assert tables.ul_mcs_to_qm_itbs(5, "256qam") == (2, 10)
    assert tables.ul_mcs_to_qm_itbs(9, "256qam") == (4, 14)
    assert tables.ul_mcs_to_qm_itbs(10, "256qam") == (4, 16)
    assert tables.ul_mcs_to_qm_itbs(18, "256qam") == (6, 24)
    assert tables.ul_mcs_to_qm_itbs(19, "256qam") == (6, 26)
    assert tables.ul_mcs_to_qm_itbs(25, "256qam") == (8, 32)
    assert tables.ul_mcs_to_qm_itbs(26, "256qam") == (8, tables.ITBS_32A)
    assert tables.ul_mcs_to_qm_itbs(27, "256qam") == (8, 33)
    assert tables.ul_mcs_to_qm_itbs(28, "256qam") == (8, tables.ITBS_33A)


def test_search_space_yk_and_validation():
    nof_cce = 42  # 50 PRB cfi 2 ballpark
    rnti, sf = 0x3D_5, 3
    cands = search_space.ue_candidates(rnti, sf, nof_cce)
    assert all(ncce % (1 << l) == 0 for l, ncce in cands)
    assert all(ncce + (1 << l) <= nof_cce for l, ncce in cands)
    # every UE candidate validates at its own (l, ncce)
    for l, ncce in cands:
        assert search_space.validate_location(nof_cce, ncce, l, sf, rnti) >= 1
    # SI-RNTI lives in the common space only
    assert search_space.validate_location(nof_cce, 0, 3, sf, 0xFFFF) >= 1
    assert search_space.validate_location(nof_cce, 20, 3, sf, 0xFFFF) == 0


def test_all_locations_cap_and_order():
    locs = search_space.all_locations(84)
    assert len(locs) <= 160
    assert locs[0][0] == 3  # L=8 first
    ls = [l for l, _ in locs]
    assert ls == sorted(ls, reverse=True)


def test_ul_grant_hopping_field_extraction():
    # hopping flag: top RA bit(s) become hopping info, rest is the RIV
    nbits = ra.riv_nbits(50)
    base_riv = ra.start_len_to_riv(4, 8, 50)
    d = dci.Dci(fmt="0", rnti=9, fields=dict(
        flag0_1a=0, hopping=1, riv=base_riv, mcs=5, ndi=0, dmrs_cs=0,
        cqi_request=0))
    g = dci.ul_grant_from_dci(d, CELL50)
    # 50 PRB -> 2 hopping bits (Table 8.4-1); this riv's top bits are 00
    assert g.hopping == 1 and g.hop_bits == 0
    # 25 PRB cell: single hopping bit maps to {N/2, type2}
    cell25 = CellConfig(n_id_cell=1, n_prb=25, nof_ports=2)
    d25 = dci.Dci(fmt="0", rnti=9, fields=dict(
        flag0_1a=0, hopping=1, riv=ra.start_len_to_riv(2, 4, 25), mcs=5,
        ndi=0, dmrs_cs=0, cqi_request=0))
    g25 = dci.ul_grant_from_dci(d25, cell25)
    assert g25.hop_bits in (2, 3)
    # no hopping: grant decodes the full RIV
    d2 = dci.Dci(fmt="0", rnti=9, fields=dict(
        flag0_1a=0, hopping=0, riv=base_riv, mcs=5, ndi=0, dmrs_cs=0,
        cqi_request=0))
    g2 = dci.ul_grant_from_dci(d2, CELL50)
    assert (g2.prb_start, g2.n_prb) == (4, 8) and g2.hop_bits == -1


def test_ul_hopping_offset_math():
    # type-1 N/2 offset with no hopping region reduction
    s = ra.ul_hopping_prbs(4, 8, 50, hopping_bits=2, n_sb=1,
                           hopping_offset=0)
    assert s == (4 + 50 // 2) % 50
    s2 = ra.ul_hopping_prbs(4, 8, 48, hopping_bits=0, n_sb=2,
                            hopping_offset=0)
    assert s2 == (48 // 4 + 4) % 48
