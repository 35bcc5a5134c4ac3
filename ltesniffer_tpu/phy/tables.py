"""3GPP 36.212/36.213 table data: MCS, TBS, turbo interleaver sizes.

DATA PROVENANCE — read before trusting:

* EXACT: modulation/I_TBS maps (36.213 Tables 7.1.7.1-1, 8.6.1-1), the
  1-PRB TBS column, the turbo code-block size ladder K (36.212 5.1.3-3 sizes),
  RBG sizes, and similar structural constants are written out from the spec.
* RECONSTRUCTED: the full TBS matrix (7.1.7.2.1-1) beyond the 1-PRB column,
  the 2-layer TBS translation (7.1.7.2.2-1), and the QPP interleaver
  coefficients (f1, f2) are *generated* here by documented, deterministic
  procedures that honor the spec's structural constraints (allowed-TBS
  quantization with zero-filler segmentation, QPP permutation validity).
  They are self-consistent across this framework's encoder and decoder, but
  individual entries may differ from the published tables; the module is a
  single drop-in data point for exact parity against real eNodeBs.

Reference parity surface: srsRAN `ra_dl/ra_ul` + `srsran_dl_fill_ra_mcs`
usage in `lib/src/phy/falcon_phch/dl_sniffer_pdsch.c:14-92` and
`ul_sniffer_pusch.c:91-135` (SURVEY.md §2.1).
"""
from __future__ import annotations

import functools

import numpy as np

# ---------------------------------------------------------------------------
# Modulation and TBS index tables (EXACT)
# ---------------------------------------------------------------------------

def dl_mcs_to_qm_itbs(i_mcs: int, use_256qam: bool = False):
    """36.213 Table 7.1.7.1-1 (and -1A for 256QAM). Returns (Q_m, I_TBS).

    I_TBS == -1 means reserved (mcs 29-31 retransmission-only entries).
    """
    if not use_256qam:
        if i_mcs <= 9:
            return 2, i_mcs
        if i_mcs <= 16:
            return 4, i_mcs - 1
        if i_mcs <= 28:
            return 6, i_mcs - 2
        return (2, 4, 6)[i_mcs - 29], -1
    # 256QAM alternative table
    alt = [(2, 0), (2, 2), (2, 4), (2, 6), (2, 8),
           (4, 10), (4, 11), (4, 12), (4, 13), (4, 14), (4, 15), (4, 16),
           (6, 17), (6, 18), (6, 19), (6, 20), (6, 21), (6, 22), (6, 23), (6, 24),
           (8, 25), (8, 27), (8, 28), (8, 29), (8, 30), (8, 31), (8, 32), (8, 33),
           (2, -1), (4, -1), (6, -1), (8, -1)]
    return alt[i_mcs]


def ul_mcs_to_qm_itbs(i_mcs: int, table: str = "64qam"):
    """36.213 Table 8.6.1-1 (+16QAM cap, +256QAM variant). Returns (Q_m, I_TBS)."""
    if table == "256qam":
        alt = [(2, 0), (2, 2), (2, 4), (2, 6), (2, 8),
               (4, 10), (4, 11), (4, 12), (4, 13), (4, 14), (4, 15), (4, 16),
               (6, 17), (6, 18), (6, 19), (6, 20), (6, 21), (6, 22), (6, 23), (6, 24),
               (8, 25), (8, 27), (8, 28), (8, 29), (8, 30), (8, 31), (8, 32), (8, 33),
               (2, -1), (4, -1), (6, -1), (8, -1)]
        return alt[i_mcs]
    if i_mcs <= 10:
        qm, itbs = 2, i_mcs
    elif i_mcs <= 20:
        qm, itbs = 4, i_mcs - 1
    elif i_mcs <= 28:
        qm, itbs = 6, i_mcs - 2
    else:
        return 2, -1  # 29-31: retransmission, rv = mcs-28
    if table == "16qam":
        qm = min(qm, 4)
    return qm, itbs


# 1-PRB TBS column, I_TBS 0..26 (EXACT, 36.213 Table 7.1.7.2.1-1 col N_PRB=1)
TBS_1PRB = np.array([
    16, 24, 32, 40, 56, 72, 88, 104, 120, 136, 144, 176, 208, 224, 256, 280,
    328, 336, 376, 408, 440, 488, 520, 552, 584, 616, 712], dtype=np.int64)

# Extended I_TBS rows 27..33 used by the 256QAM table (RECONSTRUCTED 1-PRB
# anchors, linear SE extrapolation of the 64QAM ladder up to ~7.4 bps/Hz).
TBS_1PRB_EXT = np.array([776, 840, 904, 968, 1032, 1096, 1160], dtype=np.int64)

N_PRB_MAX = 110
N_ITBS = 34  # 0..26 standard + 27..33 extended (256QAM)


@functools.lru_cache(maxsize=1)
def turbo_k_sizes() -> np.ndarray:
    """The 188 turbo code-block sizes K (36.212 Table 5.1.3-3, EXACT ladder)."""
    ks = list(range(40, 513, 8)) + list(range(528, 1025, 16)) + \
        list(range(1056, 2049, 32)) + list(range(2112, 6145, 64))
    return np.array(ks, dtype=np.int64)


@functools.lru_cache(maxsize=1)
def allowed_tbs_set() -> np.ndarray:
    """TBS values admitting zero-filler code-block segmentation.

    Single code block: TBS + 24 == K for some turbo size K <= 6144.
    C >= 2 blocks:     TBS + 24 + 24*C == C*K with ceil((TBS+24)/6120) == C.
    """
    ks = turbo_k_sizes()
    out = set((ks - 24).tolist())
    for c in range(2, 14):  # up to ~79000 bits
        for k in ks:
            b = c * k          # B' = B + 24*C
            tbs = b - 24 * c - 24
            if tbs <= 0:
                continue
            if -(-(tbs + 24) // 6120) == c:   # segmentation really yields C blocks
                out.add(tbs)
    return np.array(sorted(v for v in out if v <= 100000), dtype=np.int64)


@functools.lru_cache(maxsize=1)
def tbs_table() -> np.ndarray:
    """TBS matrix (N_ITBS, 110).  Column 0 EXACT; others RECONSTRUCTED as the
    allowed TBS closest to N_PRB * TBS(i, 1), made monotone along both axes."""
    allowed = allowed_tbs_set()
    col1 = np.concatenate([TBS_1PRB, TBS_1PRB_EXT])
    tab = np.zeros((N_ITBS, N_PRB_MAX), dtype=np.int64)
    tab[:, 0] = col1
    for i in range(N_ITBS):
        for n in range(2, N_PRB_MAX + 1):
            target = col1[i] * n
            j = np.searchsorted(allowed, target)
            if j == 0:
                val = allowed[0]
            elif j >= len(allowed):
                val = allowed[-1]
            else:
                lo, hi = allowed[j - 1], allowed[j]
                val = lo if target - lo <= hi - target else hi
            tab[i, n - 1] = val
    # enforce monotonicity: nondecreasing in n and in i
    for i in range(N_ITBS):
        np.maximum.accumulate(tab[i], out=tab[i])
    for n in range(N_PRB_MAX):
        np.maximum.accumulate(tab[:, n], out=tab[:, n])
    return tab


def tbs_lookup(i_tbs: int, n_prb: int) -> int:
    if i_tbs < 0 or n_prb < 1:
        return 0
    return int(tbs_table()[i_tbs, n_prb - 1])


@functools.lru_cache(maxsize=1)
def _tbs_2layer_map() -> dict:
    """7.1.7.2.2-1 translation (RECONSTRUCTED): TBS_1 -> closest allowed to 2x."""
    allowed = allowed_tbs_set()
    out = {}
    for v in np.unique(tbs_table()):
        t = 2 * int(v)
        j = np.searchsorted(allowed, t)
        if j == 0:
            out[int(v)] = int(allowed[0])
        elif j >= len(allowed):
            out[int(v)] = int(allowed[-1])
        else:
            lo, hi = int(allowed[j - 1]), int(allowed[j])
            out[int(v)] = lo if t - lo <= hi - t else hi
    return out


def tbs_2layer(tbs_1layer: int) -> int:
    if tbs_1layer <= 0:
        return 0
    return _tbs_2layer_map().get(int(tbs_1layer), 2 * int(tbs_1layer))


def rbg_size(n_prb: int) -> int:
    """Type-0 resource block group size P (36.213 Table 7.1.6.1-1, EXACT)."""
    if n_prb <= 10:
        return 1
    if n_prb <= 26:
        return 2
    if n_prb <= 63:
        return 3
    return 4


def n_gap1(n_prb: int) -> int:
    """36.211 Table 6.2.3.2-1 gap-1 values (EXACT)."""
    if n_prb <= 10:
        return -(-n_prb // 2)
    if n_prb == 11:
        return 4
    if n_prb <= 19:
        return 8
    if n_prb <= 26:
        return 12
    if n_prb <= 44:
        return 18
    if n_prb <= 49:
        return 27
    if n_prb <= 63:
        return 27
    if n_prb <= 79:
        return 32
    return 48


# ---------------------------------------------------------------------------
# Turbo QPP interleaver coefficients (RECONSTRUCTED, deterministic)
# ---------------------------------------------------------------------------

def _is_qpp_permutation(k: int, f1: int, f2: int) -> bool:
    x = np.arange(k, dtype=np.int64)
    pi = (f1 * x + f2 * x * x) % k
    return len(np.unique(pi)) == k


@functools.lru_cache(maxsize=1)
def qpp_coefficients() -> dict:
    """(f1, f2) per K.  Spec-known anchors where certain; otherwise the
    smallest valid pair with f1 odd & coprime to K and f2 sharing K's prime
    factors (guarantees pi(x) = f1 x + f2 x^2 mod K is a permutation)."""
    anchors = {40: (3, 10), 6144: (263, 480)}

    def radical(n: int) -> int:
        r, d, m = 1, 2, n
        while d * d <= m:
            if m % d == 0:
                r *= d
                while m % d == 0:
                    m //= d
            d += 1
        return r * (m if m > 1 else 1)

    out = {}
    for k in turbo_k_sizes().tolist():
        if k in anchors:
            out[k] = anchors[k]
            continue
        f2 = radical(k)
        found = None
        while found is None:
            for f1 in range(3, 100, 2):
                if np.gcd(f1, k) != 1:
                    continue
                if _is_qpp_permutation(k, f1, f2):
                    found = (f1, f2)
                    break
            if found is None:
                f2 *= 2
                assert f2 < k, k
        out[k] = found
    return out


def qpp_interleave_indices(k: int) -> np.ndarray:
    f1, f2 = qpp_coefficients()[k]
    x = np.arange(k, dtype=np.int64)
    return (f1 * x + f2 * x * x) % k
