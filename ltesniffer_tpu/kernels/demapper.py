"""Max-log soft demappers QPSK..256QAM (batched JAX, float-pair inputs).

Symbols arrive as (..., M, 2) float re/im pairs (see kernels/cplx.py).
Closed-form piecewise-linear LLR expressions per Gray axis bit; positive LLR
⇒ bit 0 (matches the Viterbi/turbo kernels).  Scaling: QPSK returns
sqrt(2)*Re/Im of the unit-power-normalized symbol so per-CCE mean |LLR| sits
at ~1.0 for active PDCCH — the operating point of the reference's
PWR_THR=0.7 gate (`falcon_pdcch.c:595-620`).

Replaces srsRAN demod_soft (SURVEY.md §2.1 ue_dl row).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_S2 = np.float32(np.sqrt(2.0))
_S10 = np.float32(np.sqrt(10.0))
_S42 = np.float32(np.sqrt(42.0))
_S170 = np.float32(np.sqrt(170.0))


def _interleave(*bits):
    """Stack per-bit LLR planes (..., M) -> (..., M*Qm) symbol-major."""
    x = jnp.stack(bits, axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def qpsk_llr(x):
    """x: (..., M, 2) -> (..., 2M) LLRs, bit order (b0=I, b1=Q)."""
    return _interleave(x[..., 0] * _S2, x[..., 1] * _S2)


def qam16_llr(x):
    re = x[..., 0] * _S10
    im = x[..., 1] * _S10
    b2 = 2.0 - jnp.abs(re)
    b3 = 2.0 - jnp.abs(im)
    return _interleave(re, im, b2, b3) / _S10


def qam64_llr(x):
    re = x[..., 0] * _S42
    im = x[..., 1] * _S42
    b2 = 4.0 - jnp.abs(re)
    b3 = 4.0 - jnp.abs(im)
    b4 = 2.0 - jnp.abs(b2)
    b5 = 2.0 - jnp.abs(b3)
    return _interleave(re, im, b2, b3, b4, b5) / _S42


def qam256_llr(x):
    re = x[..., 0] * _S170
    im = x[..., 1] * _S170
    b2 = 8.0 - jnp.abs(re)
    b3 = 8.0 - jnp.abs(im)
    b4 = 4.0 - jnp.abs(b2)
    b5 = 4.0 - jnp.abs(b3)
    b6 = 2.0 - jnp.abs(b4)
    b7 = 2.0 - jnp.abs(b5)
    return _interleave(re, im, b2, b3, b4, b5, b6, b7) / _S170


def llr(x, qm: int):
    return {2: qpsk_llr, 4: qam16_llr, 6: qam64_llr, 8: qam256_llr}[qm](x)
