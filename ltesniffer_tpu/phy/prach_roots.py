"""PRACH logical -> physical root sequence mapping (36.211 Table 5.7.2-4,
preamble formats 0-3) and N_cs (Table 5.7.2-2, unrestricted set).

The spec table is a flat enumeration of all 838 physical roots in logical
order.  This module embeds the transcribed prefix of that table (logical
0..179) together with structural self-checks the full table satisfies
(every adjacent pair is (u, 839-u); no duplicates; all in 1..838).  The
transcription is validated in tests against the spec's published anchor
rows.  `logical_to_physical` raises beyond the embedded range rather than
silently returning a wrong root — callers fall back to physical-root
interpretation with an explicit flag (the pre-round-4 behavior, but now
visible instead of silent: `core._work_prach`).

The reference gets this table from srsRAN's prach module
(`src/src/UL_Sniffer_PUSCH.cc:657-713` set_rach_config).
"""
from __future__ import annotations

# Table 5.7.2-4 prefix, logical indices 0..179 (pairs (u, 839-u)).
_TABLE_PREFIX = [
    129, 710, 140, 699, 120, 719, 210, 629, 168, 671, 84, 755, 105, 734,
    93, 746, 70, 769, 60, 779, 2, 837, 1, 838,
    56, 783, 112, 727, 148, 691, 80, 759, 42, 797, 40, 799, 35, 804,
    73, 766, 146, 693, 31, 808, 28, 811, 30, 809, 27, 812, 29, 810,
    24, 815, 48, 791, 68, 771, 74, 765, 178, 661, 136, 703, 86, 753,
    78, 761, 43, 796, 39, 800, 20, 819, 21, 818, 95, 744, 202, 637,
    190, 649, 181, 658, 137, 702, 125, 714, 151, 688, 217, 622, 128, 711,
    142, 697, 122, 717, 203, 636, 118, 721, 110, 729, 89, 750, 103, 736,
    61, 778, 55, 784, 15, 824, 14, 825, 12, 827, 23, 816, 34, 805,
    37, 802, 46, 793, 207, 632, 179, 660, 145, 694, 130, 709, 223, 616,
    228, 611, 227, 612, 132, 707, 133, 706, 143, 696, 135, 704, 161, 678,
    201, 638, 173, 666, 106, 733, 83, 756, 91, 748, 66, 773, 53, 786,
    10, 829, 9, 830, 7, 832, 8, 831, 5, 834, 6, 833, 3, 836, 4, 835,
]

# structural self-check: pairs (u, 839-u), all distinct, in range
assert len(_TABLE_PREFIX) % 2 == 0
for _i in range(0, len(_TABLE_PREFIX), 2):
    assert _TABLE_PREFIX[_i] + _TABLE_PREFIX[_i + 1] == 839, _i
assert len(set(_TABLE_PREFIX)) == len(_TABLE_PREFIX)
assert all(1 <= _u <= 838 for _u in _TABLE_PREFIX)

MAX_KNOWN_LOGICAL = len(_TABLE_PREFIX) - 1

# Table 5.7.2-2: N_cs for preamble formats 0-3, unrestricted set, by
# zeroCorrelationZoneConfig
NCS_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119,
                    167, 279, 419)


def logical_to_physical(logical: int) -> int:
    """Physical ZC root u for one logical index; raises KeyError beyond
    the embedded table prefix."""
    if not 0 <= logical <= MAX_KNOWN_LOGICAL:
        raise KeyError(f"logical root {logical} beyond embedded "
                       f"Table 5.7.2-4 prefix (0..{MAX_KNOWN_LOGICAL})")
    return _TABLE_PREFIX[logical]


def cell_roots(root_seq_index: int, zero_correlation_zone: int,
               n_preambles: int = 64):
    """The physical roots a cell's 64 preambles use (36.211 5.7.2): from
    `rootSequenceIndex` (logical), consecutive logical indices supply
    additional roots until n_preambles cyclic shifts are available.

    Returns (roots list, n_cs, mapped: bool).  mapped=False means the
    logical index lies beyond the embedded table and root_seq_index is
    returned as-is for *physical* interpretation (flagged, not silent).
    """
    n_cs = NCS_UNRESTRICTED[zero_correlation_zone]
    shifts_per_root = (839 // n_cs) if n_cs > 0 else n_preambles
    n_roots = max(1, -(-n_preambles // shifts_per_root))
    try:
        roots = [logical_to_physical((root_seq_index + k) % 838)
                 for k in range(n_roots)]
        return roots, n_cs, True
    except KeyError:
        return [root_seq_index], n_cs, False


def preamble_of(roots, n_cs: int, root_idx: int, shift_idx: int) -> int:
    """Preamble number for (root position, cyclic-shift position)."""
    shifts_per_root = (839 // n_cs) if n_cs > 0 else 64
    return root_idx * shifts_per_root + shift_idx


__all__ = ["logical_to_physical", "cell_roots", "preamble_of",
           "MAX_KNOWN_LOGICAL", "NCS_UNRESTRICTED"]
