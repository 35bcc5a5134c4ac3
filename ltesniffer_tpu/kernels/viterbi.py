"""Batched tail-biting Viterbi decoder (JAX, XLA-compiled).

The blind-search hot loop: the reference decodes each PDCCH candidate
sequentially through srsRAN's SSE Viterbi
(`lib/src/phy/falcon_phch/falcon_pdcch.c:110-170` →
`srsran_pdcch_dci_decode`); here *all* (location × format × subframe)
candidates decode in one batched trellis pass:

* path metrics for all 64 states × all candidates are updated by one
  vectorized `lax.scan` step (VPU-friendly (B, 64, 2) tensors);
* tail-biting is handled by a circular wrap: `wrap` training steps are
  prepended/appended from the other end of the sequence and only the middle
  D decisions are kept (wrap-around Viterbi);
* traceback is a second (reverse) scan over the stored per-state decisions.

LLR sign convention: positive LLR ⇒ bit 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import conv


@functools.lru_cache(maxsize=1)
def _tables():
    # NumPy constants only — converting to jnp inside a jit trace and caching
    # the result would leak tracers across traces.
    t = conv.trellis_tables()
    signs = (1.0 - 2.0 * t["out_bits"].astype(np.float32))   # (64, 2, 3)
    return signs, t["pred"], t["pred_bit"]


def viterbi_decode_tb(llrs, wrap: int = 32):
    """Decode tail-biting rate-1/3 K=7 codewords.

    Args:
      llrs: (B, 3, D) float32 stream LLRs (positive ⇒ bit 0).
      wrap: circular training length (clamped to D).

    Returns:
      bits: (B, D) uint8 decoded payloads.
    """
    B, three, D = llrs.shape
    assert three == 3
    w = min(wrap, D)
    signs_np, pred_np, pred_bit_np = _tables()
    signs = jnp.asarray(signs_np)
    pred = jnp.asarray(pred_np)
    pred_bit = jnp.asarray(pred_bit_np)

    # circular extension: [tail w | body D | head w]
    ext = jnp.concatenate([llrs[:, :, D - w:], llrs, llrs[:, :, :w]], axis=-1)
    seq = jnp.moveaxis(ext, -1, 0)                     # (T, B, 3)

    # survivor decisions are bit-packed into two uint32 words per (step,
    # codeword): 8x less HBM traffic than a (T, B, 64) bool tensor — the
    # traceback store/load is this kernel's memory bottleneck.
    pack_w = jnp.asarray((1 << np.arange(32, dtype=np.int64)).astype(np.uint32))

    def step(pm, llr_t):
        # branch metrics for every (from-state, input): (B, 64, 2)
        bm = jnp.einsum("bi,sci->bsc", llr_t, signs)
        cand = pm[:, pred] + bm[:, pred, pred_bit[:, None]]   # (B, 64, 2)
        dec = cand[..., 1] > cand[..., 0]
        pm_new = jnp.where(dec, cand[..., 1], cand[..., 0])
        pm_new = pm_new - jnp.max(pm_new, axis=-1, keepdims=True)
        packed = jnp.stack(
            [jnp.sum(jnp.where(dec[:, :32], pack_w, 0), axis=-1),
             jnp.sum(jnp.where(dec[:, 32:], pack_w, 0), axis=-1)], axis=-1)
        return pm_new, packed

    pm0 = jnp.zeros((B, 64), dtype=llrs.dtype)
    pm_fin, decs = jax.lax.scan(step, pm0, seq)        # decs: (T, B, 2) u32

    start = jnp.argmax(pm_fin, axis=-1).astype(jnp.int32)   # (B,)
    bidx = jnp.arange(B)

    def back(state, dec_t):
        bit = (state >> 5).astype(jnp.uint8)
        word = dec_t[bidx, (state >> 5)]               # high/low word select
        j = ((word >> (state & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
        prev = pred[state, j]
        return prev, bit

    _, bits_rev = jax.lax.scan(back, start, decs, reverse=True)
    bits = bits_rev.T                                  # (T, B) -> (B, T)
    return bits[:, w:w + D]


def conv_encode_tb_jax(bits):
    """Batched tail-biting conv encoder (for on-device re-encode checks).

    bits: (B, D) uint8 -> (B, 3, D) uint8.
    """
    t = conv.trellis_tables()
    out_tab = jnp.asarray(t["out_bits"])    # (64, 2, 3)
    nxt_tab = jnp.asarray(t["next_state"])  # (64, 2)
    B, D = bits.shape
    # initial state = last 6 bits, u_{D-1} at bit 5
    weights = jnp.asarray([1, 2, 4, 8, 16, 32], dtype=jnp.int32)
    init = jnp.sum(bits[:, D - 6:].astype(jnp.int32) * weights, axis=-1)

    def step(state, b_t):
        out = out_tab[state, b_t]            # (B, 3)
        return nxt_tab[state, b_t], out

    _, outs = jax.lax.scan(step, init, bits.T.astype(jnp.int32))  # (D, B, 3)
    return jnp.moveaxis(outs, 0, -1)         # (B, 3, D)
