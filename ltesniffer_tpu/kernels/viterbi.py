"""Batched tail-biting Viterbi decoder (JAX, XLA-compiled).

The blind-search hot loop: the reference decodes each PDCCH candidate
sequentially through srsRAN's SSE Viterbi
(`lib/src/phy/falcon_phch/falcon_pdcch.c:110-170` →
`srsran_pdcch_dci_decode`); here *all* (location × format × subframe)
candidates decode in one batched trellis pass.

TPU shape of the kernel (what makes it fast):

* the add-compare-select step is expressed as a **butterfly**: with the
  state convention s' = (b << 5) | (s >> 1), the two predecessors of states
  n and n+32 are the adjacent pair (2(n&31), 2(n&31)+1), so the whole
  64-state update is `pm.reshape(B, 32, 2) + bm.reshape(B, 2, 32, 2)` plus a
  max — **no gathers**, pure VPU;
* branch metrics for all (state, input) come from ONE (B, 3) × (3, 128)
  matmul against the constant ±1 encoder-output signs;
* tail-biting is handled by a circular wrap: `wrap` training steps are
  prepended/appended from the other end and only the middle D decisions are
  kept (wrap-around Viterbi);
* survivor decisions are bit-packed into two uint32 words per step and
  codeword (8× less HBM than a bool (T, B, 64) tensor);
* candidates of **different payload sizes decode in one fused scan**
  (`viterbi_decode_tb_multi`): shorter codewords are zero-LLR-padded at the
  *front* (zero LLRs leave path metrics untouched, and front padding keeps
  the traceback through the real data intact), so the sequential step count
  of the whole blind search drops from Σ T_i to max T_i.

LLR sign convention: positive LLR ⇒ bit 0.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import conv


@functools.lru_cache(maxsize=1)
def _tables():
    # NumPy constants only — converting to jnp inside a jit trace and caching
    # the result would leak tracers across traces.
    t = conv.trellis_tables()
    # signs[s, b, i] = +1 if encoder output bit i is 0 else -1
    signs = (1.0 - 2.0 * t["out_bits"].astype(np.float32))   # (64, 2, 3)
    # butterfly layout: bm_mat[(i), (b*64 + s)] — column-major over (b, s) so
    # bm.reshape(B, 2, 64) indexes [input b][prev state s]
    bm_mat = np.transpose(signs, (2, 1, 0)).reshape(3, 128).copy()
    return t, bm_mat


def _acs_scan(llr_seq, B, dtype):
    """Forward pass: llr_seq (T, B, 3) → (final path metrics (B, 64),
    packed decisions (T, B, 2, 2) uint32 [new-half, word])."""
    _, bm_mat_np = _tables()
    bm_mat = jnp.asarray(bm_mat_np, dtype=dtype)
    pack_w = jnp.asarray((1 << np.arange(32, dtype=np.int64)).astype(np.uint32))

    def step(pm, llr_t):
        # (B, 3) @ (3, 128) → (B, 2 inputs, 64 prev states): one MXU matmul
        bm = jnp.dot(llr_t, bm_mat, preferred_element_type=dtype)
        bm = bm.reshape(-1, 2, 32, 2)          # [input b][pair m][j]
        pmp = pm.reshape(-1, 1, 32, 2)         # prev states (2m, 2m+1)
        cand = pmp + bm                        # (B, 2, 32, 2)
        dec = cand[..., 1] > cand[..., 0]      # (B, 2, 32): j choice
        pm_new = jnp.where(dec, cand[..., 1], cand[..., 0])   # (B, 2, 32)
        # new state n = b*32 + m → flat (B, 64) in that order
        pm_new = pm_new.reshape(-1, 64)
        pm_new = pm_new - jnp.max(pm_new, axis=-1, keepdims=True)
        packed = jnp.sum(jnp.where(dec, pack_w, jnp.uint32(0)), axis=-1,
                         dtype=jnp.uint32)     # (B, 2): word per new-half
        return pm_new, packed

    pm0 = jnp.zeros((B, 64), dtype=dtype)
    return jax.lax.scan(step, pm0, llr_seq)


def _traceback(pm_fin, decs, B):
    """Reverse pass over packed decisions → (T, B) bits, best end state."""
    start = jnp.argmax(pm_fin, axis=-1).astype(jnp.int32)   # (B,)

    def back(state, dec_t):
        # state n = b*32 + m ⇒ input bit b = n>>5, pair index m = n&31
        bit = (state >> 5).astype(jnp.uint8)
        word = jnp.where(state >= 32, dec_t[:, 1], dec_t[:, 0])
        j = ((word >> (state & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
        prev = ((state & 31) << 1) | j         # pred[n, j]
        return prev, bit

    _, bits_rev = jax.lax.scan(back, start, decs, reverse=True)
    return bits_rev                            # (T, B)


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
    # circular extension: [tail w | body D | head w]
    ext = jnp.concatenate([llrs[:, :, D - w:], llrs, llrs[:, :, :w]], axis=-1)
    seq = jnp.moveaxis(ext, -1, 0)                     # (T, B, 3)
    pm_fin, decs = _acs_scan(seq, B, llrs.dtype)
    bits = _traceback(pm_fin, decs, B).T               # (B, T)
    return bits[:, w:w + D]


def viterbi_decode_tb_multi(llrs_list: Sequence, wrap: int = 32) -> List:
    """Decode candidate groups of several payload sizes in ONE fused scan.

    Args:
      llrs_list: sequence of (B_i, 3, D_i) float32 LLR tensors.
      wrap: circular training length (clamped per size).

    Returns:
      list of (B_i, D_i) uint8 decoded payloads, same order.
    """
    if len(llrs_list) == 1:
        return [viterbi_decode_tb(llrs_list[0], wrap)]
    exts = []
    meta = []
    for llrs in llrs_list:
        B, three, D = llrs.shape
        assert three == 3
        w = min(wrap, D)
        ext = jnp.concatenate(
            [llrs[:, :, D - w:], llrs, llrs[:, :, :w]], axis=-1)
        meta.append((B, D, w, ext.shape[-1]))
        exts.append(ext)
    t_max = max(m[3] for m in meta)
    # zero-LLR FRONT padding: path metrics stay uniform through the pad, so
    # the real trellis runs identically; traceback only crosses real steps
    # for the kept window [pad+w, pad+w+D).
    padded = [jnp.pad(e, ((0, 0), (0, 0), (t_max - m[3], 0)))
              for e, m in zip(exts, meta)]
    cat = jnp.concatenate(padded, axis=0)              # (ΣB, 3, T_max)
    seq = jnp.moveaxis(cat, -1, 0)                     # (T_max, ΣB, 3)
    n_tot = cat.shape[0]
    pm_fin, decs = _acs_scan(seq, n_tot, cat.dtype)
    bits = _traceback(pm_fin, decs, n_tot).T           # (ΣB, T_max)
    outs = []
    off = 0
    for (B, D, w, t_ext) in meta:
        pad = t_max - t_ext
        outs.append(bits[off:off + B, pad + w:pad + w + D])
        off += B
    return outs


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
