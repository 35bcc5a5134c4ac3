"""Multi-chip / multi-host scaling: shard the subframe-time axis over a mesh.

The reference's only parallelism is a 4-thread pool over a ring of 20
subframe buffers (SURVEY.md §2.2).  The TPU-native analog: the batched
pipeline is data-parallel over the subframe axis, so a `Mesh(devices, 'sf')`
with `NamedSharding(P('sf'))` on the batch dimension lets XLA partition every
stage (FFT, chest, Viterbi, CRC) across chips with zero cross-chip
collectives in the hot path — subframes are independent until the host-side
tracker resolve, which consumes the (tiny) decode outputs in TTI order.

Cross-host layout (config 5 of BASELINE.json): each host ingests a
contiguous time-block of subframes, runs this sharded pipeline over its
local chips, and the per-host accepted-DCI lists are merged in TTI order by
rank 0 (tracker state deltas ride that merge; see `merge_accepted`).
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ltesniffer_tpu.phy.params import CellConfig
from ltesniffer_tpu.sniffer import frontend as frontend_mod
from ltesniffer_tpu.sniffer import pdcch_rx


def make_mesh(devices=None, axis: str = "sf") -> Mesh:
    devs = devices if devices is not None else jax.devices()
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_subframes(mesh: Mesh, samples: np.ndarray, sf_idx: np.ndarray):
    """Place (B, RX, sf_len[, 2]) samples with B sharded over the mesh.

    Complex input is converted to the float-pair representation host-side
    (no complex64 on the device path)."""
    from ltesniffer_tpu.kernels import cplx
    x = np.asarray(samples)
    if np.iscomplexobj(x):
        x = cplx.to_ri(x)
    sh = NamedSharding(mesh, P("sf"))
    return (jax.device_put(x, sh), jax.device_put(np.asarray(sf_idx), sh))


@functools.lru_cache(maxsize=8)
def make_sharded_frontend(cell: CellConfig, mesh: Mesh):
    """Frontend with explicit batch sharding constraints."""
    base = frontend_mod.make_frontend(cell).jitted_ri
    sh = NamedSharding(mesh, P("sf"))

    @jax.jit
    def run(samples_ri, sf_idx):
        samples_ri = jax.lax.with_sharding_constraint(samples_ri, sh)
        return base(samples_ri, sf_idx)

    return run


@functools.lru_cache(maxsize=8)
def make_sharded_search(cell: CellConfig, cfi: int, mesh: Mesh):
    run, st = pdcch_rx.make_search_from_grids(cell, cfi)
    sh = NamedSharding(mesh, P("sf"))

    @jax.jit
    def wrapped(grids, h, noise_var, snr_db, sf_idx):
        grids = jax.lax.with_sharding_constraint(grids, sh)
        return run(grids, h, noise_var, snr_db, sf_idx)

    return wrapped, st


def merge_accepted(per_host_accepted: Sequence[List], host_offsets: Sequence[int]):
    """Order per-host accepted-DCI lists by global TTI.

    This is the plain time-order merge for hosts whose tracker state is
    already consistent (e.g. a shared-state single process driving several
    meshes).  For independent hosts over contiguous time blocks use
    `ltesniffer_tpu.parallel.multihost`: it implements the boundary
    tracker replay (each host re-processes the preceding overlap through
    its own trackers) and the ownership filter that drops the replay
    duplicates (tested in tests/test_multihost.py)."""
    tagged = []
    for accepted, off in zip(per_host_accepted, host_offsets):
        for a in accepted:
            tagged.append(((off + a.sfn * 10 + a.sf_idx
                            if hasattr(a, "sfn") else off), a))
    tagged.sort(key=lambda t: t[0])
    return [a for _, a in tagged]
