"""MIMO precoding/equalization for TM3 (open-loop CDD) and TM4 (closed-loop
spatial multiplexing), 2 ports x 2 layers (36.211 6.3.4.2).

Replaces the srsRAN MMSE MIMO decode path the reference configures
(`src/src/SubframeWorker.cc:362-374`: MMSE decoder) and the sniffer-side
MIMO config from DCI (`lib/src/phy/falcon_phch/dl_sniffer_pdsch.c:134-276`:
tx scheme per format, pinfo->PMI per 36.212 Table 5.3.3.1.5-4, layer count).

All equalizers are closed-form 2x2 MMSE solves vectorized over (batch, RE)
— no per-RE loops, pure VPU math.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_SQRT2 = np.float32(np.sqrt(2.0))

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
    """(2,) precoding vector for 1-layer TM4."""
    return _CB_1LAYER[pmi]


def pmi_matrix_2layer(pmi: int) -> np.ndarray:
    """(2,2) precoding matrix for 2-layer TM4 (columns = layers)."""
    return _CB_2LAYER[pmi]


def decode_pinfo_2tx(pinfo: int, two_tb: bool):
    """DCI format 2 precoding info, 2 TX ports (36.212 Table 5.3.3.1.5-4).

    Returns (n_layers, pmi or None).  With 2 enabled TBs: 0 -> 2 layers cb0
    (TM3-style), 1 -> 2 layers cb1, 2 -> 2 layers cb2.  With 1 enabled TB:
    0 -> tx diversity, 1..4 -> 1 layer pmi 0..3.
    """
    if two_tb:
        return 2, {0: 0, 1: 1, 2: 2}.get(pinfo, 0)
    if pinfo == 0:
        return 0, None     # 0 layers = transmit diversity fallback
    return 1, pinfo - 1


def effective_channel_tm4(h, pmi: int, n_layers: int):
    """h: (B, RX, 2, M) port channels -> (B, RX, L, M) layer channels."""
    if n_layers == 1:
        w = jnp.asarray(pmi_matrix_1layer(pmi))          # (2,)
        he = jnp.einsum("brpm,p->brm", h, w)
        return he[:, :, None, :]
    w = jnp.asarray(pmi_matrix_2layer(pmi))              # (2 ports, 2 layers)
    return jnp.einsum("brpm,pl->brlm", h, w)


def effective_channel_tm3(h):
    """Open-loop CDD effective channel: layer channels vary per RE index i.

    x_eff(i) = W D(i) U x(i) with D(i) = diag(1, (-1)^i) for 2 ports.
    Returns (B, RX, 2, M).
    """
    M = h.shape[-1]
    sign = jnp.asarray(1.0 - 2.0 * (np.arange(M) % 2), dtype=jnp.float32)
    WU = jnp.asarray(_W_CDD @ _U_CDD)   # before D ... careful with order
    # y = H * W * D(i) * U * x  ->  H_eff = H @ (W D(i) U)
    # W D(i) U = W @ diag(1, s_i) @ U ; expand per RE:
    # column l of (W D U) = W @ (D * U[:, l]) = W @ [U[0,l], s_i*U[1,l]]
    W = jnp.asarray(_W_CDD)
    U = jnp.asarray(_U_CDD)
    # port-p, layer-l factor: sum_k W[p,k] * d_k(i) * U[k,l]
    # = W[p,0]U[0,l] + W[p,1]U[1,l]*s_i
    c0 = jnp.einsum("pk,kl->pl", W, U * jnp.asarray([[1.0], [0.0]]))
    c1 = jnp.einsum("pk,kl->pl", W, U * jnp.asarray([[0.0], [1.0]]))
    he = (jnp.einsum("brpm,pl->brlm", h, c0)
          + jnp.einsum("brpm,pl->brlm", h, c1) * sign[None, None, None, :])
    return he


def mmse_2layer(y, he, noise_var):
    """Per-RE 2x2 MMSE: y (B, RX, M), he (B, RX, 2, M) -> x (B, 2, M).

    x = (He^H He + sigma^2 I)^-1 He^H y, closed form 2x2 inverse.
    Also returns per-layer scaling (diagonal of the MMSE-filtered channel)
    for LLR normalization.
    """
    # Gram matrix entries (B, M)
    a = jnp.sum(jnp.abs(he[:, :, 0]) ** 2, axis=1) + noise_var[:, None]
    d = jnp.sum(jnp.abs(he[:, :, 1]) ** 2, axis=1) + noise_var[:, None]
    b = jnp.sum(jnp.conj(he[:, :, 0]) * he[:, :, 1], axis=1)
    det = a * d - jnp.abs(b) ** 2
    inv_det = 1.0 / jnp.maximum(jnp.real(det), 1e-12)
    # z = He^H y
    z0 = jnp.sum(jnp.conj(he[:, :, 0]) * y, axis=1)
    z1 = jnp.sum(jnp.conj(he[:, :, 1]) * y, axis=1)
    x0 = (d * z0 - b * z1) * inv_det
    x1 = (a * z1 - jnp.conj(b) * z0) * inv_det
    # unbiased scaling: E[x_hat | x] ~ (1 - sigma^2 * inv(G)_ll) x
    g00 = (d * (a - noise_var[:, None])
           - b * jnp.conj(b)) * inv_det   # approx bias factor layer 0
    return jnp.stack([x0, x1], axis=1)


def mmse_1layer(y, he, noise_var):
    """MRC/MMSE for a single effective layer: (B, RX, M) x (B, RX, 1, M)."""
    h0 = he[:, :, 0]
    num = jnp.sum(jnp.conj(h0) * y, axis=1)
    den = jnp.sum(jnp.abs(h0) ** 2, axis=1) + noise_var[:, None]
    return (num / den)[:, None, :]
