"""Float-pair complex arithmetic for the TPU device path.

The axon TPU runtime has no complex64 compute support at all (even a complex
add fails at execution; see memory note axon-tpu-backend-quirks).  All device
kernels therefore represent complex tensors as float32 arrays with a
trailing re/im axis of size 2 — which is also the faster TPU-native design:
DFTs become MXU matmuls, elementwise complex math becomes plain VPU float
math, and no XLA complex lowering is involved.

Host boundary: `to_ri` / `from_ri` convert numpy complex64 <-> (..., 2)
float32 views (zero-copy where possible).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def to_ri(x: np.ndarray) -> np.ndarray:
    """numpy complex64 -> (..., 2) float32 (host side)."""
    x = np.ascontiguousarray(x, dtype=np.complex64)
    return x.view(np.float32).reshape(*x.shape, 2)


def to_i16(x: np.ndarray):
    """numpy complex64 -> ((..., 2) int16, scale) quantized IQ (host side).

    Halves host->device bytes vs float pairs; the ~90 dB quantization SNR
    is far beyond any radio front-end (SDR ADCs are 12-14 bit)."""
    ri = to_ri(x)
    peak = float(np.max(np.abs(ri))) or 1.0
    scale = peak / 32000.0
    return np.round(ri / scale).astype(np.int16), np.float32(scale)


def to_i8_packed(x: np.ndarray):
    """numpy complex64 frames (B, RX, n) -> ((B, RX, n/2) int32 packed
    int8 IQ, (B,) float32 per-subframe scales).

    8-bit IQ with per-subframe AGC: ~42 dB SNR below each subframe's peak —
    above the ~35 dB a 256QAM grant needs and at the fidelity of real SDR
    front-ends.  Packing 4 int8 into one int32 word matters on this
    backend: the tunnel H2D cost scales with element COUNT more than bytes,
    so the packed stream moves ~4x faster than (..., 2) int16 at half the
    bytes.  Device-side unpack is 4 shift/mask ops (`frontend.run_i8`)."""
    ri = to_ri(x)                                  # (B, RX, n, 2) f32
    B = ri.shape[0]
    flat = ri.reshape(B, -1)
    # per-subframe peak without an |.| temporary (one less full pass)
    peak = np.maximum(flat.max(axis=1), -flat.min(axis=1))
    peak[peak == 0] = 1.0
    scales = (peak / 126.0).astype(np.float32)
    q = np.multiply(ri, (1.0 / scales)[:, None, None, None],
                    dtype=np.float32)
    np.rint(q, out=q)
    q = q.astype(np.int8)
    # explicit little-endian word view: the device-side unpack shifts
    # assume byte k sits at bits 8k (true only for '<i4' words)
    packed = (np.ascontiguousarray(q).reshape(B, ri.shape[1], -1)
              .view(np.dtype("<i4")))
    return packed, scales


def view_i64(packed: np.ndarray) -> np.ndarray:
    """(..., n/2) '<i4' packed words -> (..., n/4) '<i8' zero-copy view.

    Pairs adjacent int32 words into one int64 element (w0 in the low half
    on little-endian hosts; the device-side `bitcast_convert_type` to
    int32 restores [w0, w1] order).  The tunnel H2D cost scales with
    element COUNT, so the int64 carrier moves the same bytes ~2x faster
    than the int32 words (measured 82 vs 19 MB/s on a good pass)."""
    assert packed.shape[-1] % 2 == 0
    return np.ascontiguousarray(packed).view(np.dtype("<i8"))


def unpack_i8(packed_row: np.ndarray, scale: float) -> np.ndarray:
    """Inverse of `to_i8_packed` for one subframe: (RX, n/2) '<i4' words +
    scale -> (RX, n) complex64 (host side; PRACH correlation runs on host
    numpy for the occasional allowed subframe)."""
    b = np.ascontiguousarray(packed_row).view(np.int8)
    ri = b.astype(np.float32).reshape(packed_row.shape[0], -1, 2) * scale
    return ri.view(np.complex64).reshape(packed_row.shape[0], -1)


def from_ri(x: np.ndarray) -> np.ndarray:
    """(..., 2) float32 -> numpy complex64 (host side)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    return x.view(np.complex64).reshape(x.shape[:-1])


def re(x):
    return x[..., 0]


def im(x):
    return x[..., 1]


def make(r, i):
    return jnp.stack([r, i], axis=-1)


def cmul(a, b):
    """a * b for (..., 2) pairs."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def cmul_conj(a, b):
    """a * conj(b)."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br + ai * bi, ai * br - ar * bi], axis=-1)


def conj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def cabs2(a):
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]


def cscale(a, s):
    """a * real scalar/array s (broadcast over the pair axis)."""
    return a * s[..., None]


def cdiv_real(a, d):
    """a / real d."""
    return a / d[..., None]


def cmatmul(x, w_re, w_im, contract: str = "last"):
    """Complex matmul: x (..., K, 2) @ W (K, N) -> (..., N, 2).

    W given as separate real/imag float32 matrices; four real matmuls on
    the MXU.  `contract='last'` contracts x's axis -2 (the K axis).
    """
    xr, xi = x[..., 0], x[..., 1]
    yr = jnp.matmul(xr, w_re) - jnp.matmul(xi, w_im)
    yi = jnp.matmul(xr, w_im) + jnp.matmul(xi, w_re)
    return jnp.stack([yr, yi], axis=-1)


def dft_matrices(n_in: int, bins: np.ndarray, sign: float = -1.0,
                 scale: float = 1.0):
    """(n_in, len(bins)) cos/sin DFT matrices: Y[k] = sum_n x[n] e^{sign*j*2pi*n*bins[k]/n_in}."""
    n = np.arange(n_in)[:, None]
    k = np.asarray(bins)[None, :]
    ang = sign * 2.0 * np.pi * n * k / n_in
    return (np.cos(ang).astype(np.float32) * scale,
            np.sin(ang).astype(np.float32) * scale)
