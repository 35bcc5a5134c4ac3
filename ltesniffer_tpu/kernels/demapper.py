"""Max-log soft demappers QPSK..256QAM (batched JAX).

Closed-form piecewise-linear LLR expressions per Gray axis bit; positive LLR
⇒ bit 0 (matches the Viterbi/turbo kernels).  Scaling: the QPSK demapper
returns sqrt(2)*Re/Im of the (unit-power-normalized) equalized symbol so the
per-CCE mean |LLR| sits at ~1.0 for active PDCCH — the same operating point
srsRAN's demod gives the reference's PWR_THR=0.7 gate
(`falcon_pdcch.c:595-620`).

Replaces srsRAN demod_soft (SURVEY.md §2.1 ue_dl row).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_S2 = np.float32(np.sqrt(2.0))
_S10 = np.float32(np.sqrt(10.0))
_S42 = np.float32(np.sqrt(42.0))
_S170 = np.float32(np.sqrt(170.0))


def qpsk_llr(x):
    """x: (..., M) complex -> (..., 2M) LLRs, bit order (b0=I, b1=Q)."""
    re = jnp.real(x) * _S2
    im = jnp.imag(x) * _S2
    return jnp.stack([re, im], axis=-1).reshape(*x.shape[:-1], -1)


def qam16_llr(x):
    """16QAM max-log LLRs, bits (b0,b1,b2,b3) = (I-sign, Q-sign, I-mag, Q-mag)."""
    re = jnp.real(x) * _S10
    im = jnp.imag(x) * _S10
    b0 = re
    b1 = im
    b2 = 2.0 - jnp.abs(re)
    b3 = 2.0 - jnp.abs(im)
    return jnp.stack([b0, b1, b2, b3], axis=-1).reshape(*x.shape[:-1], -1) / _S10


def qam64_llr(x):
    re = jnp.real(x) * _S42
    im = jnp.imag(x) * _S42
    b0 = re
    b1 = im
    b2 = 4.0 - jnp.abs(re)
    b3 = 4.0 - jnp.abs(im)
    b4 = 2.0 - jnp.abs(b2)
    b5 = 2.0 - jnp.abs(b3)
    return jnp.stack([b0, b1, b2, b3, b4, b5], axis=-1).reshape(*x.shape[:-1], -1) / _S42


def qam256_llr(x):
    re = jnp.real(x) * _S170
    im = jnp.imag(x) * _S170
    b0 = re
    b1 = im
    b2 = 8.0 - jnp.abs(re)
    b3 = 8.0 - jnp.abs(im)
    b4 = 4.0 - jnp.abs(b2)
    b5 = 4.0 - jnp.abs(b3)
    b6 = 2.0 - jnp.abs(b4)
    b7 = 2.0 - jnp.abs(b5)
    return jnp.stack([b0, b1, b2, b3, b4, b5, b6, b7],
                     axis=-1).reshape(*x.shape[:-1], -1) / _S170


def llr(x, qm: int):
    return {2: qpsk_llr, 4: qam16_llr, 6: qam64_llr, 8: qam256_llr}[qm](x)
