"""Host-side blind-search acceptance resolver.

Replays the reference's sequential CCE-tree pruning semantics
(`src/src/DCISearch.cc:102-528`: recursive inspection, shortcut discovery,
search-space validation, histogram voting, disambiguation, RAR-DCI0 dual
list) over the *precomputed* batched decode results from
`pdcch_rx.make_pipeline`.  The expensive work (FFT/chest/Viterbi/CRC for
every location × format) already happened on the TPU; this pass is pure
bookkeeping over ≤160 locations and updates the RNTIManager state exactly
in reference order, so acceptance decisions match the sequential
implementation.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ltesniffer_tpu.phy import dci as dci_mod, search_space
from ltesniffer_tpu.phy.params import (CellConfig, RARNTI_START, RARNTI_END,
                                       PRNTI)
from .rnti_manager import RNTIManager, ActivationReason, FORMAT_ORDER, FORMAT_TO_INDEX

PWR_THR = 0.7                  # `falcon_dci.h:45`
SNR_GATE_DB = 6.0              # `DCISearch.cc:569`
ILLEGAL_RNTI = -1
MAX_RECURSION_DEPTH = 99


@dataclasses.dataclass
class PayloadRef:
    """Deferred payload: candidate payloads live on-device (cand_pay) until
    the accepted set is known; the core then fetches them in ONE transfer
    (tunnel D2H costs ~25 ms flat, so per-candidate readback is ruinous)."""
    b: int                     # batch index within the cfi group
    size_idx: int              # column into cand_pay's size axis
    loc_idx: int
    nbits: int                 # payload length (without CRC)

    def copy(self):
        return self


@dataclasses.dataclass
class AcceptedDci:
    rnti: int
    fmt: str                   # resolved format name
    l: int                     # aggregation exponent (L = 2^l CCEs)
    ncce: int
    payload: np.ndarray        # payload bits (without CRC) or PayloadRef
    histval: int               # histogram frequency at acceptance
    sf_idx: int = 0
    sfn: int = 0


class _LazyPayload:
    """payload_of[f]-compatible view yielding PayloadRefs."""

    def __init__(self, b: int, size_idx: int, nbits: int):
        self.b, self.size_idx, self.nbits = b, size_idx, nbits

    def __getitem__(self, li: int) -> PayloadRef:
        return PayloadRef(self.b, self.size_idx, int(li), self.nbits)


class _Loc:
    __slots__ = ("l", "ncce", "used", "occupied", "checked", "sufficient_power")

    def __init__(self, l, ncce):
        self.l, self.ncce = l, ncce
        self.used = self.occupied = self.checked = False
        self.sufficient_power = True


@dataclasses.dataclass
class SearchStats:
    nof_subframes: int = 0
    nof_locations: int = 0
    nof_decoded_locations: int = 0
    nof_missed_cce: int = 0
    nof_subframe_collisions_dl: int = 0
    nof_subframe_collisions_ul: int = 0
    # accepted DCIs whose grant could not be derived (invalid RIV etc.)
    # and therefore dropped out of the collision RB map
    nof_malformed_grants: int = 0


class DciBlindSearch:
    """Per-cell blind-search resolver; owns the RNTIManager."""

    def __init__(self, cell: CellConfig, rnti_manager: RNTIManager,
                 formats=FORMAT_ORDER, enable_shortcut: bool = True):
        self.cell = cell
        self.rm = rnti_manager
        self.formats = list(formats)
        self.enable_shortcut = enable_shortcut
        self.stats = SearchStats()
        self.sizes = dci_mod.format_sizes(cell)
        self.size_order = tuple(sorted({self.sizes[f] + 16
                                        for f in self.formats}))
        self._size_idx = {f: self.size_order.index(self.sizes[f] + 16)
                          for f in self.formats}

    # -----------------------------------------------------------------
    def resolve_subframe(self, out: Dict[str, np.ndarray], b: int,
                         locs, nof_cce: int, sf_idx: int,
                         sfn: int = 0) -> List[AcceptedDci]:
        """Resolve one subframe's decode results to accepted DCIs."""
        self.stats.nof_subframes += 1
        if float(out["snr_db"][b]) <= SNR_GATE_DB:
            return []
        self.stats.nof_locations += len(locs)

        # candidate tables: rnti/payload per (loc_idx, format_idx)
        cand_rnti = np.full((len(locs), len(self.formats)), ILLEGAL_RNTI, np.int64)
        cand_fmt: List[List[Optional[str]]] = [[None] * len(self.formats)
                                               for _ in locs]
        payload_of = {}
        if "cand_meta" in out:
            # compact path: rnti | bit0<<16 per (loc, size); payloads deferred
            meta = np.asarray(out["cand_meta"][b])         # (n_loc, S)
            for fi, f in enumerate(self.formats):
                si = self._size_idx[f]
                m = meta[:, si]
                rnti = m & 0xFFFF
                bit0 = (m >> 16) & 1
                cand_rnti[:, fi] = rnti
                payload_of[f] = _LazyPayload(b, si, self.sizes[f])
                if f in ("0", "1A"):
                    for li in range(len(locs)):
                        cand_fmt[li][fi] = "0" if bit0[li] == 0 else "1A"
                else:
                    for li in range(len(locs)):
                        cand_fmt[li][fi] = f
        else:
            for fi, f in enumerate(self.formats):
                D = self.sizes[f] + 16
                rntis = np.asarray(out[f"rnti_{D}"][b])
                bits = np.asarray(out[f"bits_{D}"][b])
                payload_of[f] = bits[:, :D - 16]
                cand_rnti[:, fi] = rntis
                for li in range(len(locs)):
                    resolved = dci_mod.resolve_format(bits[li], f)
                    cand_fmt[li][fi] = resolved

        # location objects + cce map
        loc_objs = [_Loc(l, ncce) for (l, ncce) in locs]
        loc_index = {(lo.l, lo.ncce): i for i, lo in enumerate(loc_objs)}
        cce_map: List[List[Optional[_Loc]]] = [[None] * 4 for _ in range(nof_cce)]
        for lo in loc_objs:
            for c in range(lo.ncce, min(lo.ncce + (1 << lo.l), nof_cce)):
                cce_map[c][lo.l] = lo

        cce_power = np.asarray(out["cce_power"][b])
        for c in range(nof_cce):
            if cce_power[c] < PWR_THR:
                for aggr in range(4):
                    if cce_map[c][aggr] is not None:
                        cce_map[c][aggr].sufficient_power = False

        accepted: List[AcceptedDci] = []
        temp_dci0: List[dict] = []
        ctx = dict(cand_rnti=cand_rnti, cand_fmt=cand_fmt,
                   payload_of=payload_of, loc_index=loc_index,
                   cce_map=cce_map, nof_cce=nof_cce, sf_idx=sf_idx, sfn=sfn,
                   accepted=accepted, temp_dci0=temp_dci0)

        for (l, ncce) in locs:
            self._inspect(ctx, ncce, l, MAX_RECURSION_DEPTH,
                          enable_discovery=True, parent=None)

        # missed-CCE accounting (`falcon_pdcch.c:561-593`)
        for c in range(nof_cce):
            if cce_power[c] >= PWR_THR:
                if not any(cce_map[c][a] is not None and cce_map[c][a].used
                           for a in range(4)):
                    self.stats.nof_missed_cce += 1

        self.rm.step_time()
        return accepted

    # -----------------------------------------------------------------
    def _candidates_at(self, ctx, l: int, ncce: int):
        """(rnti, resolved_fmt) per searched format at a location, or None."""
        li = ctx["loc_index"].get((l, ncce))
        if li is None:
            return None, None
        return ctx["cand_rnti"][li].copy(), list(ctx["cand_fmt"][li])

    def _inspect(self, ctx, ncce: int, l: int, max_depth: int,
                 enable_discovery: bool, parent) -> int:
        cce_map = ctx["cce_map"]
        # span check (not just start): with the unified cfi-dynamic search
        # the location list is the cfi=3 superset, so a location must fit
        # entirely inside this subframe's control region
        if ncce + (1 << l) > ctx["nof_cce"]:
            return 0
        loc = cce_map[ncce][l]
        if loc is None or loc.occupied or loc.checked or not loc.sufficient_power:
            return 0

        rntis, fmts = self._candidates_at(ctx, l, ncce)
        if rntis is None:
            return 0
        self.stats.nof_decoded_locations += len(self.formats)

        match_result = [0] * len(self.formats)
        nof_above = 0
        hist_max_idx = -1
        hist_max_val = 0
        for fi, fname in enumerate(self.formats):
            rnti = int(rntis[fi])
            resolved = fmts[fi]
            # RAR-activated RNTIs sending UL DCI0: collect on a side list
            # (`DCISearch.cc:139-158`)
            if (self.rm.get_activation_reason(rnti) == ActivationReason.RAR
                    and resolved == "0"):
                if not any(t["fmt"] == resolved and t["rnti"] == rnti
                           and t["ncce"] == ncce for t in ctx["temp_dci0"]):
                    ctx["temp_dci0"].append(dict(
                        rnti=rnti, fmt=resolved, l=l, ncce=ncce, fi=fi))
            # format 0/1A mismatch filter
            if resolved != fname:
                rntis[fi] = ILLEGAL_RNTI
                continue
            # format 1C RNTI range filter
            if fname == "1C" and RARNTI_END < rnti < PRNTI:
                rntis[fi] = ILLEGAL_RNTI
                continue
            # RA-RNTI only via 1A/1C
            if RARNTI_START < rnti < RARNTI_END and fname not in ("1A", "1C"):
                rntis[fi] = ILLEGAL_RNTI
                continue
            # shortcut discovery (`DCISearch.cc:200-211`)
            if (self.enable_shortcut and enable_discovery and parent is not None
                    and int(parent[fi]) == rnti
                    and not self.rm.is_forbidden(rnti, fi)):
                return -(fi + 1)
            # search-space validation
            match_result[fi] = search_space.validate_location(
                ctx["nof_cce"], ncce, l, ctx["sf_idx"], rnti)
            if match_result[fi] == 0:
                rntis[fi] = ILLEGAL_RNTI
                continue
            if self.rm.validate_and_refresh(rnti, fi):
                nof_above += 1
                hist_max_idx = fi
                hist_max_val = self.rm.get_frequency(rnti, fi)

        if nof_above > 1:
            hist_max_idx, hist_max = -1, 0
            for fi in range(len(self.formats)):
                if rntis[fi] != ILLEGAL_RNTI:
                    h = self.rm.get_frequency(int(rntis[fi]), fi)
                    if h > hist_max:
                        hist_max, hist_max_idx = h, fi
                        hist_max_val = h
            if hist_max_idx == -1:
                nof_above = 0

        loc.checked = True
        disamb = 0

        if nof_above > 0 and match_result[hist_max_idx] == 1:  # ambiguous
            if l > 0 and max_depth > 0:
                disamb = self._inspect(ctx, ncce + (1 << (l - 1)), l - 1,
                                       max_depth - 1, False, None)
        elif nof_above == 0:
            rec = 0
            if l > 0 and max_depth > 0:
                rec += self._inspect(ctx, ncce, l - 1, max_depth - 1,
                                     enable_discovery, rntis)
                if rec < 0:
                    # shortcut taken in left half
                    hist_max_idx = -rec - 1
                    hist_max_val = self.rm.get_frequency(
                        int(rntis[hist_max_idx]), hist_max_idx)
                    nof_above = 1
                    if match_result[hist_max_idx] == 1 and l > 0:
                        disamb = self._inspect(ctx, ncce + (1 << (l - 1)),
                                               l - 1, max_depth - 1, False, None)
                    self.rm.activate_and_refresh(
                        int(rntis[hist_max_idx]), hist_max_idx,
                        ActivationReason.SHORTCUT)
                else:
                    rec += self._inspect(ctx, ncce + (1 << (l - 1)), l - 1,
                                         max_depth - 1, enable_discovery, None)
            if rec == 0:
                if enable_discovery:
                    for fi in range(len(self.formats)):
                        if rntis[fi] != ILLEGAL_RNTI:
                            self.rm.add_candidate(int(rntis[fi]), fi)
                return 0
            if rec > 0:
                return rec
            # rec < 0 handled above (falls through to acceptance)

        if nof_above > 0:
            loc.used = True
            for c in range(ncce, min(ncce + (1 << l), ctx["nof_cce"])):
                for aggr in range(4):
                    if cce_map[c][aggr] is not None:
                        cce_map[c][aggr].occupied = True
                        cce_map[c][aggr].checked = True
            rnti = int(rntis[hist_max_idx])
            self.rm.add_candidate(rnti, hist_max_idx)
            l_disamb = l - 1 if disamb > 0 else l
            fname = self.formats[hist_max_idx]
            li = ctx["loc_index"][(l, ncce)]
            payload = ctx["payload_of"][fname][li]
            if rnti != 0:
                add = True
                if fname == "0":
                    add = not any(t["fmt"] == "0" and t["rnti"] == rnti
                                  and t["ncce"] == ncce
                                  for t in ctx["temp_dci0"])
                if add:
                    ctx["accepted"].append(AcceptedDci(
                        rnti=rnti, fmt=fname, l=l_disamb, ncce=ncce,
                        payload=payload.copy(), histval=hist_max_val,
                        sf_idx=ctx["sf_idx"], sfn=ctx["sfn"]))
                # flush the RAR DCI0 side list (`DCISearch.cc:404-421`)
                for t in ctx["temp_dci0"]:
                    tl = ctx["loc_index"].get((t["l"], t["ncce"]))
                    pay = ctx["payload_of"]["0"][tl]
                    ctx["accepted"].append(AcceptedDci(
                        rnti=t["rnti"], fmt="0", l=t["l"], ncce=t["ncce"],
                        payload=pay.copy(),
                        histval=self.rm.get_frequency(t["rnti"], t["fi"]),
                        sf_idx=ctx["sf_idx"], sfn=ctx["sfn"]))
                ctx["temp_dci0"].clear()
            return 1 + disamb
        return 0
