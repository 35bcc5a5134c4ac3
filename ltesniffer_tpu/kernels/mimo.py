"""MIMO precoding/equalization for TM3 (open-loop CDD) and TM4 (closed-loop
spatial multiplexing), 2 ports x 2 layers (36.211 6.3.4.2) — float-pair.

Replaces the srsRAN MMSE MIMO decode path the reference configures
(`src/src/SubframeWorker.cc:362-374`) and the sniffer-side MIMO config from
DCI (`lib/src/phy/falcon_phch/dl_sniffer_pdsch.c:134-276`).

All equalizers are closed-form 2x2 MMSE solves vectorized over (batch, RE).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import cplx

# 36.211 Table 6.3.4.2.3-2: 2-port codebook, 1 layer
_CB_1LAYER = np.array([
    [1, 1], [1, -1], [1, 1j], [1, -1j]], dtype=np.complex64) / np.sqrt(2.0)
# 2 layers: index 0: I/sqrt(2); 1: [[1,1],[1,-1]]/2; 2: [[1,1],[j,-j]]/2
_CB_2LAYER = np.stack([
    np.eye(2, dtype=np.complex64) / np.sqrt(2.0),
    np.array([[1, 1], [1, -1]], dtype=np.complex64) / 2.0,
    np.array([[1, 1], [1j, -1j]], dtype=np.complex64) / 2.0,
])

# large-delay CDD fixed matrices (2 ports)
_U_CDD = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
_W_CDD = np.eye(2, dtype=np.complex64) / np.sqrt(2.0)


def pmi_matrix_1layer(pmi: int) -> np.ndarray:
    return _CB_1LAYER[pmi]


def pmi_matrix_2layer(pmi: int) -> np.ndarray:
    return _CB_2LAYER[pmi]


def decode_pinfo_2tx(pinfo: int, two_tb: bool):
    """DCI format 2 precoding info, 2 TX ports (36.212 Table 5.3.3.1.5-4)."""
    if two_tb:
        return 2, {0: 0, 1: 1, 2: 2}.get(pinfo, 0)
    if pinfo == 0:
        return 0, None
    return 1, pinfo - 1


def _apply_const_matrix(h, w: np.ndarray):
    """h (B, RX, P, M, 2) x constant complex W (P, L) -> (B, RX, L, M, 2)."""
    wr = jnp.asarray(np.real(w).astype(np.float32))
    wi = jnp.asarray(np.imag(w).astype(np.float32))
    hr, hi = h[..., 0], h[..., 1]
    out_r = jnp.einsum("brpm,pl->brlm", hr, wr) - jnp.einsum("brpm,pl->brlm", hi, wi)
    out_i = jnp.einsum("brpm,pl->brlm", hr, wi) + jnp.einsum("brpm,pl->brlm", hi, wr)
    return jnp.stack([out_r, out_i], axis=-1)


def effective_channel_tm4(h, pmi: int, n_layers: int):
    """h: (B, RX, 2, M, 2) port channels -> (B, RX, L, M, 2) layer channels."""
    if n_layers == 1:
        w = pmi_matrix_1layer(pmi)[:, None]      # (2 ports, 1 layer)
        return _apply_const_matrix(h, w)
    return _apply_const_matrix(h, pmi_matrix_2layer(pmi))


def effective_channel_tm3(h):
    """Open-loop CDD effective channel, D(i) = diag(1, (-1)^i) per RE."""
    M = h.shape[-2]
    sign = jnp.asarray(1.0 - 2.0 * (np.arange(M) % 2), dtype=jnp.float32)
    # column l of (W D(i) U): W[:,0] U[0,l] + W[:,1] U[1,l] * s_i
    c0 = _W_CDD @ (np.diag([1.0, 0.0]).astype(np.complex64) @ _U_CDD)
    c1 = _W_CDD @ (np.diag([0.0, 1.0]).astype(np.complex64) @ _U_CDD)
    he0 = _apply_const_matrix(h, c0)
    he1 = _apply_const_matrix(h, c1)
    return he0 + he1 * sign[None, None, None, :, None]


def mmse_2layer(y, he, noise_var):
    """Per-RE 2x2 MMSE: y (B, RX, M, 2), he (B, RX, 2, M, 2) -> (B, 2, M, 2)."""
    h0 = he[:, :, 0]
    h1 = he[:, :, 1]
    a = jnp.sum(cplx.cabs2(h0), axis=1) + noise_var[:, None]     # (B, M)
    d = jnp.sum(cplx.cabs2(h1), axis=1) + noise_var[:, None]
    b = jnp.sum(cplx.cmul_conj(h1, h0), axis=1)                  # conj(h0)*h1
    det = a * d - cplx.cabs2(b)
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    z0 = jnp.sum(cplx.cmul_conj(y, h0), axis=1)                  # (B, M, 2)
    z1 = jnp.sum(cplx.cmul_conj(y, h1), axis=1)
    x0 = cplx.cscale(cplx.cscale(z0, d) - cplx.cmul(b, z1), inv_det)
    x1 = cplx.cscale(cplx.cscale(z1, a) - cplx.cmul(cplx.conj(b), z0), inv_det)
    return jnp.stack([x0, x1], axis=1)


def mmse_1layer(y, he, noise_var):
    """MRC/MMSE single layer: y (B, RX, M, 2) x he (B, RX, 1, M, 2)."""
    h0 = he[:, :, 0]
    num = jnp.sum(cplx.cmul_conj(y, h0), axis=1)
    den = jnp.sum(cplx.cabs2(h0), axis=1) + noise_var[:, None]
    return cplx.cdiv_real(num, den)[:, None]
