"""Resource-allocation math (36.213 7.1.6 / 8.1, 36.211 6.2.3.2).

Pure formula code (EXACT, no table reconstruction): RIV <-> (start, len),
type-0 RBG bitmaps, type-1 subsets, distributed-VRB mapping for format 1C,
and UL RIV with type-1/2 PUSCH frequency hopping.

Parity surface: srsRAN ra_dl/ra_ul usage plus the reference's own UL hopping
math (`lib/src/phy/falcon_phch/ul_sniffer_pusch.c:20-87`).
"""
from __future__ import annotations

import math

import numpy as np

from . import tables


def riv_nbits(n_prb: int) -> int:
    return math.ceil(math.log2(n_prb * (n_prb + 1) / 2))


def riv_to_start_len(riv: int, n_prb: int):
    """Type-2 localized RIV decode."""
    L = riv // n_prb + 1
    S = riv % n_prb
    if L + S > n_prb:
        L = n_prb - L + 2
        S = n_prb - 1 - S
    return S, L


def start_len_to_riv(start: int, length: int, n_prb: int) -> int:
    if (length - 1) <= n_prb // 2:
        return n_prb * (length - 1) + start
    return n_prb * (n_prb - length + 1) + (n_prb - 1 - start)


def type0_bitmap_to_mask(bitmap: int, n_prb: int) -> np.ndarray:
    """RBG bitmap (MSB = RBG 0) -> bool PRB mask."""
    P = tables.rbg_size(n_prb)
    n_rbg = -(-n_prb // P)
    mask = np.zeros(n_prb, dtype=bool)
    for g in range(n_rbg):
        if (bitmap >> (n_rbg - 1 - g)) & 1:
            mask[g * P:min((g + 1) * P, n_prb)] = True
    return mask


def mask_to_type0_bitmap(mask: np.ndarray) -> int:
    n_prb = len(mask)
    P = tables.rbg_size(n_prb)
    n_rbg = -(-n_prb // P)
    bm = 0
    for g in range(n_rbg):
        if mask[g * P:min((g + 1) * P, n_prb)].any():
            bm |= 1 << (n_rbg - 1 - g)
    return bm


def type1_to_mask(subset: int, shift: int, bitmap: int, n_prb: int) -> np.ndarray:
    """Type-1 allocation (36.213 7.1.6.2) -> bool PRB mask."""
    P = tables.rbg_size(n_prb)
    n_rbg = -(-n_prb // P)
    nbits = n_rbg - math.ceil(math.log2(P)) - 1  # bitmap width
    mask = np.zeros(n_prb, dtype=bool)
    # PRBs of subset p: prb = (g*P^2 + p*P + r) pattern per spec
    prbs = []
    for g in range(n_rbg):
        for r in range(P):
            prb = g * P * P + subset * P + r
            # offset for shift
            if prb < n_prb:
                prbs.append(prb)
    n_subset = len(prbs)
    if shift:
        offset = n_subset - nbits
    else:
        offset = 0
    for b in range(nbits):
        if (bitmap >> (nbits - 1 - b)) & 1:
            idx = b + offset
            if 0 <= idx < n_subset:
                mask[prbs[idx]] = True
    return mask


def dvrb_gap1_interleaved_pos(n_prb: int) -> np.ndarray:
    """Distributed VRB block-interleaver positions, gap 1 (36.211 6.2.3.2.2).

    Returns pos[vrb] = interleaved index n'_PRB in [0, N_vrb) for even slots.
    Construction: VRB numbers written row-wise into an N_row x 4 matrix whose
    last N_null/2 rows of columns 1 and 3 are <NULL>; read column-wise
    skipping nulls.
    """
    P = tables.rbg_size(n_prb)
    ngap = tables.n_gap1(n_prb)
    n_vrb = 2 * min(ngap, n_prb - ngap)
    n_row = -(-n_vrb // (4 * P)) * P
    n_null = 4 * n_row - n_vrb
    mat = np.full((n_row, 4), -1, dtype=np.int64)
    v = 0
    for r in range(n_row):
        for c in range(4):
            is_null = n_null != 0 and c in (1, 3) and r >= n_row - n_null // 2
            if not is_null:
                mat[r, c] = v
                v += 1
    pos = np.zeros(n_vrb, dtype=np.int64)
    k = 0
    for c in range(4):
        for r in range(n_row):
            if mat[r, c] >= 0:
                pos[mat[r, c]] = k
                k += 1
    return pos


def dvrb_pos_to_prb(pos: np.ndarray, n_prb: int) -> np.ndarray:
    """Interleaved position -> physical PRB (split across the gap)."""
    ngap = tables.n_gap1(n_prb)
    n_vrb = 2 * min(ngap, n_prb - ngap)
    half = n_vrb // 2
    return np.where(pos < half, pos, pos - half + ngap)


def format1c_prbs(riv: int, n_prb: int):
    """Format 1C allocation -> (prb_set_slot0, prb_set_slot1, n_vrb_alloc)."""
    step = 2 if n_prb < 50 else 4
    ngap = tables.n_gap1(n_prb)
    n_vrb = 2 * min(ngap, n_prb - ngap)
    n_vrb_p = n_vrb // step
    s_p, l_p = riv_to_start_len(riv, n_vrb_p)
    start, length = s_p * step, l_p * step
    vrbs = np.arange(start, start + length) % n_vrb
    pos = dvrb_gap1_interleaved_pos(n_prb)
    half = n_vrb // 2
    p0 = pos[vrbs]
    p1 = (pos[vrbs] + half) % n_vrb   # slot hop across halves
    prb0 = dvrb_pos_to_prb(p0, n_prb)
    prb1 = dvrb_pos_to_prb(p1, n_prb)
    return np.sort(prb0), np.sort(prb1), length


def ul_hopping_prbs(start: int, length: int, n_prb: int, hopping_bits: int,
                    n_sb: int, hopping_offset: int, current_tx_nb: int = 0):
    """UL type-1/2 PUSCH hopping (36.213 8.4) — simplified type-1 support.

    Returns the PRB start for the hopped allocation (type 1 predefined
    patterns; type 2 inter-subband hopping reduced to the n_sb==1 mirror
    case, which is what LTESniffer handles, `ul_sniffer_pusch.c:20-87`).
    """
    n_rb_ho = hopping_offset
    if n_sb == 1:
        n_rb_pusch = n_prb - n_rb_ho - (n_rb_ho % 2)
    else:
        n_rb_pusch = n_prb - n_rb_ho
    if hopping_bits in (0, 1, 2):
        # type 1: explicit offset patterns
        if hopping_bits == 0:
            new_start = (n_rb_pusch // 4 + start) % n_rb_pusch
        elif hopping_bits == 1:
            new_start = (-(n_rb_pusch // 4) + start) % n_rb_pusch
        else:
            new_start = (n_rb_pusch // 2 + start) % n_rb_pusch
        return new_start + n_rb_ho // 2 + (n_rb_ho % 2)
    # hopping_bits == 3: type 2 (predefined pattern); n_sb==1 -> mirrored
    return start


def valid_dft_prb(l_prb: int) -> bool:
    """PUSCH PRB counts must factor into 2,3,5 (SC-FDMA DFT sizes).

    Matches the reference's valid_prb table (`UL_Sniffer_PUSCH.cc:3-10`).
    """
    if l_prb <= 0:
        return False
    n = l_prb
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1
