"""Pallas TPU kernel: parallel-window max-log BCJR for the turbo decoder.

The XLA `lax.scan` formulation in `kernels/turbo.py` is dominated by
per-step dispatch (the trellis forces ~2·W sequential steps per BCJR pass,
each touching only a few hundred KB).  This kernel runs the whole
forward + backward + LLR pass for every window *inside one Pallas program*:

* state metrics live as (8, LANES) f32 registers/VMEM rows — 8 RSC states on
  sublanes, (code-block × window) columns on lanes;
* the 8-state add-compare-select is fully unrolled from the trellis tables
  (static Python loop ⇒ no gathers, pure VPU `maximum`/`add`);
* branch metrics come from two shared terms (±(l_sys+l_par)/2,
  ±(l_sys−l_par)/2) — the four distinct RSC gamma values;
* the forward pass stores per-step alphas in a VMEM scratch slab
  ((W, 8, L) ≲ 4 MB), the backward pass fuses beta recursion with the LLR
  output;
* window-boundary metrics (alpha at window ends, beta at window starts) are
  kernel outputs, inherited across turbo iterations (next-iteration
  initialization) by the host-side driver in `turbo.py`.

Replaces the hot loop of srsRAN's SIMD turbo decoder used by the reference
for every PDSCH/PUSCH transport block (`src/src/SubframeWorker.cc:365-369`,
`lib/src/phy/falcon_phch/dl_sniffer_pdsch.c` path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ltesniffer_tpu.phy import turbo as turbo_host

LANE = 128


@functools.lru_cache(maxsize=1)
def _trellis_static():
    t = turbo_host.rsc_tables()
    ns = t["next_state"]            # (8, 2) int
    par = t["parity"]               # (8, 2) int
    prev = [[] for _ in range(8)]
    for s in range(8):
        for x in (0, 1):
            prev[int(ns[s, x])].append((s, x))
    return ns, par, prev


def _gamma_expr(a, b, par_bit: int, x: int):
    """gamma(s, x) built from the two shared half-sums.

    a = 0.5*l_in, b = 0.5*l_par; sign is + for bit 0 (LLR convention).
    """
    if x == 0 and par_bit == 0:
        return a + b
    if x == 0 and par_bit == 1:
        return a - b
    if x == 1 and par_bit == 0:
        return b - a
    return -(a + b)


def _bcjr_kernel(w: int):
    """BCJR pass with the extrinsic computation fused in.

    l_in = apr + l_sys is formed on the fly; the LLR output is returned
    directly as the *extrinsic* (llr − l_in), which is what the iteration
    loop actually exchanges — one less XLA round-trip per half-iteration.
    """
    ns, par, prev = _trellis_static()

    def kernel(apr_ref, lsys_ref, l_par_ref, a0_ref, bk_ref,
               ext_ref, a_end_ref, b_start_ref, alphas_scr):
        # ---- forward: alpha_k stored per step, carry alpha_{k+1}
        def fwd(k, alpha):
            alphas_scr[k] = alpha
            a = 0.5 * (apr_ref[k] + lsys_ref[k])
            b = 0.5 * l_par_ref[k]
            rows = []
            for n in range(8):
                (p0, x0), (p1, x1) = prev[n]
                c0 = alpha[p0] + _gamma_expr(a, b, int(par[p0, x0]), x0)
                c1 = alpha[p1] + _gamma_expr(a, b, int(par[p1, x1]), x1)
                rows.append(jnp.maximum(c0, c1))
            anew = jnp.stack(rows)
            return anew - anew[0]

        a_end = jax.lax.fori_loop(0, w, fwd, a0_ref[:])
        a_end_ref[:] = a_end

        # ---- backward fused with extrinsic-LLR output
        def bwd(i, beta):          # beta = beta_{k+1}
            k = w - 1 - i
            l_in = apr_ref[k] + lsys_ref[k]
            a = 0.5 * l_in
            b = 0.5 * l_par_ref[k]
            alpha_k = alphas_scr[k]
            m0 = None
            m1 = None
            rows = []
            for s in range(8):
                g0 = _gamma_expr(a, b, int(par[s, 0]), 0)
                g1 = _gamma_expr(a, b, int(par[s, 1]), 1)
                t0 = g0 + beta[int(ns[s, 0])]
                t1 = g1 + beta[int(ns[s, 1])]
                f0 = alpha_k[s] + t0
                f1 = alpha_k[s] + t1
                m0 = f0 if m0 is None else jnp.maximum(m0, f0)
                m1 = f1 if m1 is None else jnp.maximum(m1, f1)
                rows.append(jnp.maximum(t0, t1))
            ext_ref[k] = (m0 - m1) - l_in
            bnew = jnp.stack(rows)
            return bnew - bnew[0]

        b_start = jax.lax.fori_loop(0, w, bwd, bk_ref[:])
        b_start_ref[:] = b_start

    return kernel


@functools.lru_cache(maxsize=64)
def make_bcjr(w: int, lanes: int, block_lanes: int = 2048,
              interpret: bool | None = None):
    """Build the windowed BCJR pass.

    fn(apr (W, L), l_sys (W, L), l_par (W, L), alpha0 (8, L), betaK (8, L))
      -> (ext (W, L), alpha_end (8, L), beta_start (8, L))
    where ext = full LLR − (apr + l_sys), i.e. the extrinsic exchanged
    between the constituent decoders.
    L = lanes must be a multiple of 128 (pad columns with zeros).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    bl = min(block_lanes, lanes)
    assert lanes % LANE == 0 and lanes % bl == 0, (lanes, bl)
    grid = (lanes // bl,)
    kern = _bcjr_kernel(w)

    def spec_w(j):
        return (0, j)

    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bl), spec_w, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((w, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bl), spec_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bl), spec_w, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((w, 8, bl), jnp.float32)],
        interpret=interpret,
    )
    return f
