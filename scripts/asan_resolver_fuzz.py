"""Randomized long-run equivalence fuzz of the native resolver vs the
Python golden, intended to run under AddressSanitizer.

Run directly:
    LTESNIFFER_NATIVE_ASAN=1 ASAN_OPTIONS=detect_leaks=0 \
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
    python scripts/asan_resolver_fuzz.py [n_subframes]

Feeds synthetic candidate tables (no device compute): random RNTIs with
repetition bias (drives histogram validation + activation), cce powers
straddling PWR_THR, random formats/SNR — >=1e5 candidate decisions.
Asserts accepted-DCI equality per subframe.  Exercised in CI by
tests/test_native_asan.py (reference ships ASAN as a build option,
`CMakeLists.txt:339-351`).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ltesniffer_tpu import native                               # noqa: E402
from ltesniffer_tpu.phy.params import CellConfig                # noqa: E402
from ltesniffer_tpu.phy import dci as dci_mod, search_space     # noqa: E402
from ltesniffer_tpu.sniffer import dci_search, rnti_manager     # noqa: E402


def main(n_sf: int = 400) -> int:
    assert os.environ.get("LTESNIFFER_NATIVE_ASAN") == "1", \
        "run with LTESNIFFER_NATIVE_ASAN=1"
    cell = CellConfig(n_id_cell=123, n_prb=50, nof_ports=2, nof_rx_ant=1)
    nof_cce = cell.nof_cce(2)
    locs = search_space.all_locations(nof_cce)
    sizes = dci_mod.format_sizes(cell)
    fmts = dci_search.FORMAT_ORDER
    size_order = tuple(sorted({sizes[f] + 16 for f in fmts}))
    S = len(size_order)
    n_loc = len(locs)

    py_rm = rnti_manager.default_manager()
    py = dci_search.DciBlindSearch(cell, py_rm)
    nat_rm = native.default_native_manager()
    assert nat_rm is not None, "native library failed to load"
    nat = native.NativeDciBlindSearch(cell, nat_rm)

    rng = np.random.default_rng(2024)
    pool = rng.integers(0x100, 0xFFF0, 40)   # recurring RNTIs
    n_cand = 0
    n_accept = 0
    for t in range(n_sf):
        sf = t % 10
        meta = np.zeros((n_loc, S), np.int64)
        recur = rng.random((n_loc, S)) < 0.3
        rnti = np.where(recur, rng.choice(pool, (n_loc, S)),
                        rng.integers(0, 0x10000, (n_loc, S)))
        bit0 = rng.integers(0, 2, (n_loc, S))
        meta = rnti | (bit0 << 16)
        cce_power = rng.uniform(0.3, 1.2, nof_cce).astype(np.float32)
        snr = np.float32(rng.uniform(-2.0, 30.0))
        out = {"cand_meta": meta[None], "cce_power": cce_power[None],
               "snr_db": np.array([snr], np.float32)}
        a_py = py.resolve_subframe(out, 0, locs, nof_cce, sf, sfn=t // 10)
        a_nat = nat.resolve_subframe(out, 0, locs, nof_cce, sf, sfn=t // 10)
        key = lambda a: (a.rnti, a.fmt, a.l, a.ncce, a.histval)  # noqa: E731
        if [key(a) for a in a_py] != [key(a) for a in a_nat]:
            print(f"MISMATCH at sf {t}:")
            print(" py :", [key(a) for a in a_py])
            print(" nat:", [key(a) for a in a_nat])
            return 1
        n_cand += n_loc * S
        n_accept += len(a_py)
    print(f"ok: {n_sf} subframes, {n_cand} candidate decisions, "
          f"{n_accept} accepted, native == python golden")
    assert n_cand >= 100_000, n_cand
    return 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 400))
