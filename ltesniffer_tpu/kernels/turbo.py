"""Batched max-log-MAP turbo decoder (JAX, XLA-compiled).

The single most performance-critical kernel (SURVEY.md §7.3): PDSCH/PUSCH
transport blocks all pass through here.  Design:

* both constituent BCJR passes are `lax.scan`s over the trellis with the
  8-state metric vector vectorized across the (code blocks x windows) batch;
* termination tails initialize beta exactly (3 explicit trellis steps per
  constituent encoder);
* iterations exchange extrinsics through the QPP permutation as a static
  gather (per-K compiled);
* LLR sign convention: positive ⇒ bit 0 (matches demappers/Viterbi).

Compiled per code-block size K (few distinct K values appear in practice);
batch axis carries all blocks of that size across the subframe batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ltesniffer_tpu.phy import tables, turbo as turbo_host

NEG = -1e9


@functools.lru_cache(maxsize=1)
def _trellis():
    t = turbo_host.rsc_tables()
    ns = t["next_state"]                      # (8, 2)
    par = t["parity"]
    # inverse transitions: for each state, the two (prev, x) feeding it
    prev_s = np.zeros((8, 2), dtype=np.int64)
    prev_x = np.zeros((8, 2), dtype=np.int64)
    cnt = [0] * 8
    for s in range(8):
        for x in (0, 1):
            n = ns[s, x]
            prev_s[n, cnt[n]] = s
            prev_x[n, cnt[n]] = x
            cnt[n] += 1
    sgn_x = 1.0 - 2.0 * np.arange(2)          # (2,)
    sgn_z = (1.0 - 2.0 * par).astype(np.float32)   # (8, 2)
    return dict(ns=ns, par=par, prev_s=prev_s, prev_x=prev_x,
                sgn_z=sgn_z)


def _gammas(l_in, l_par):
    """gamma (B, K, 8, 2) from input-llr (B, K) and parity-llr (B, K)."""
    t = _trellis()
    sgn_z = jnp.asarray(t["sgn_z"])           # (8, 2)
    sgn_x = jnp.asarray(np.array([1.0, -1.0], np.float32))
    return 0.5 * (l_in[..., None, None] * sgn_x
                  + l_par[..., None, None] * sgn_z)


def _beta_init_from_tail(tail_sys, tail_par):
    """(B, 3) tail sys/par llrs -> beta at position K, shape (B, 8)."""
    t = _trellis()
    ns = jnp.asarray(t["ns"])
    sgn_z = jnp.asarray(t["sgn_z"])
    B = tail_sys.shape[0]
    beta = jnp.full((B, 8), NEG).at[:, 0].set(0.0)
    # walk backward: beta_k(s) = max_x gamma_k(s,x) + beta_{k+1}(ns)
    for k in (2, 1, 0):
        g = 0.5 * (tail_sys[:, k, None, None] * jnp.asarray([1.0, -1.0])
                   + tail_par[:, k, None, None] * sgn_z)   # (B, 8, 2)
        cand = g + beta[:, ns]                             # (B, 8, 2)
        beta = jnp.max(cand, axis=-1)
    return beta


def _bcjr(l_in, l_par, tail_sys, tail_par):
    """One constituent max-log BCJR.  Inputs (B, K); returns full LLR (B, K)."""
    t = _trellis()
    ns = jnp.asarray(t["ns"])                # (8, 2)
    prev_s = jnp.asarray(t["prev_s"])
    prev_x = jnp.asarray(t["prev_x"])
    B, K = l_in.shape
    g = _gammas(l_in, l_par)                 # (B, K, 8, 2)
    g_t = jnp.moveaxis(g, 1, 0)              # (K, B, 8, 2)

    def fwd(alpha, g_k):
        # alpha (B, 8); incoming = alpha[prev_s] + g[prev_s, prev_x]
        inc = alpha[:, prev_s] + g_k[:, prev_s, prev_x]    # (B, 8, 2)
        a = jnp.max(inc, axis=-1)
        a = a - jnp.max(a, axis=-1, keepdims=True)
        return a, a

    alpha0 = jnp.full((B, 8), NEG).at[:, 0].set(0.0)
    _, alphas = jax.lax.scan(fwd, alpha0, g_t)             # (K, B, 8) = alpha_{k+1}
    alphas = jnp.concatenate([alpha0[None], alphas[:-1]], axis=0)  # alpha_k

    beta_K = _beta_init_from_tail(tail_sys, tail_par)

    def bwd(beta, g_k):
        # beta_k(s) = max_x g_k(s,x) + beta_{k+1}(ns(s,x))
        cand = g_k + beta[:, ns]                           # (B, 8, 2)
        b = jnp.max(cand, axis=-1)
        b = b - jnp.max(b, axis=-1, keepdims=True)
        return b, b

    _, betas = jax.lax.scan(bwd, beta_K, g_t, reverse=True)  # (K, B, 8) = beta_{k+1}...
    # scan(reverse=True) outputs beta_k computed from step k; we need beta_{k+1}
    betas_kp1 = jnp.concatenate([betas[1:], beta_K[None]], axis=0)

    # LLR_k = max over x=0 transitions - max over x=1
    full = alphas[:, :, :, None] + g_t + betas_kp1[:, :, ns[None, :, :][0]]
    # betas_kp1[:, :, ns] -> (K, B, 8, 2)
    m0 = jnp.max(full[..., 0], axis=-1)       # (K, B)
    m1 = jnp.max(full[..., 1], axis=-1)
    return jnp.moveaxis(m0 - m1, 0, 1)        # (B, K)


def _window_len(K: int) -> int:
    """Largest power-of-two window <= 64 dividing K (K sizes are 8|16|32|64
    aligned by construction of the 36.212 ladder)."""
    for w in (64, 32, 16, 8):
        if K % w == 0:
            return w
    return K


def _bcjr_pw(l_in, l_par, tail_sys, tail_par, alpha_b, beta_b, W: int):
    """Parallel-window max-log BCJR.

    The K-step trellis is split into NW windows of W steps processed in
    parallel; window boundary metrics (alpha at each window end, beta at each
    window start) are inherited from the previous turbo iteration
    (next-iteration initialization) — the standard high-throughput BCJR
    decomposition, here expressed as a `lax.scan` of only W steps over
    (B, NW, 8) state tensors.

    alpha_b/beta_b: (B, NW, 8) boundary metrics from the previous iteration
    (window 0's alpha and the last window's beta are overridden by the known
    trellis start / tail termination).
    Returns (llr (B, K), alpha_b', beta_b').
    """
    t = _trellis()
    ns = jnp.asarray(t["ns"])
    prev_s = jnp.asarray(t["prev_s"])
    prev_x = jnp.asarray(t["prev_x"])
    B, K = l_in.shape
    NW = K // W
    g = _gammas(l_in, l_par).reshape(B, NW, W, 8, 2)
    g_t = jnp.moveaxis(g, 2, 0)                    # (W, B, NW, 8, 2)

    known0 = jnp.full((B, 1, 8), NEG).at[:, :, 0].set(0.0)
    alpha_init = jnp.concatenate([known0, alpha_b[:, :-1]], axis=1)
    beta_K = _beta_init_from_tail(tail_sys, tail_par)     # (B, 8)
    beta_init = jnp.concatenate([beta_b[:, 1:], beta_K[:, None]], axis=1)

    def fwd(alpha, g_k):
        inc = alpha[:, :, prev_s] + g_k[:, :, prev_s, prev_x]
        a = jnp.max(inc, axis=-1)
        a = a - jnp.max(a, axis=-1, keepdims=True)
        return a, a

    a_end, alphas = jax.lax.scan(fwd, alpha_init, g_t)    # (W, B, NW, 8)
    alphas = jnp.concatenate([alpha_init[None], alphas[:-1]], axis=0)

    def bwd(beta, g_k):
        cand = g_k + beta[:, :, ns]
        b = jnp.max(cand, axis=-1)
        b = b - jnp.max(b, axis=-1, keepdims=True)
        return b, b

    b_start, betas = jax.lax.scan(bwd, beta_init, g_t, reverse=True)
    betas_kp1 = jnp.concatenate([betas[1:], beta_init[None]], axis=0)

    full = alphas[..., None] + g_t + betas_kp1[:, :, :, ns]
    m0 = jnp.max(full[..., 0], axis=-1)            # (W, B, NW)
    m1 = jnp.max(full[..., 1], axis=-1)
    llr = jnp.moveaxis(m0 - m1, 0, 2).reshape(B, K)
    return llr, a_end, b_start


@functools.lru_cache(maxsize=64)
def make_decoder(K: int, n_iter: int = 8, windowed: bool | None = None):
    """Jitted turbo decoder for code-block size K.

    fn(d_llrs (B, 3, K+4)) -> (bits (B, K) uint8, llr (B, K) float32).
    ``windowed`` (default: K >= 512) selects the parallel-window BCJR.
    """
    if windowed is None:
        windowed = K >= 512
    if windowed:
        return _make_decoder_pw(K, n_iter)
    return _make_decoder_full(K, n_iter)


@functools.lru_cache(maxsize=64)
def _make_decoder_pw(K: int, n_iter: int):
    pi = tables.qpp_interleave_indices(K).astype(np.int32)
    de = np.zeros(K, dtype=np.int32)
    de[pi] = np.arange(K, dtype=np.int32)
    W = _window_len(K)
    NW = K // W

    @jax.jit
    def decode(d_llrs):
        d0 = d_llrs[:, 0, :]
        d1 = d_llrs[:, 1, :]
        d2 = d_llrs[:, 2, :]
        l_sys = d0[:, :K]
        l_p1 = d1[:, :K]
        l_p2 = d2[:, :K]
        t1_sys = jnp.stack([d0[:, K], d2[:, K], d1[:, K + 1]], axis=1)
        t1_par = jnp.stack([d1[:, K], d0[:, K + 1], d2[:, K + 1]], axis=1)
        t2_sys = jnp.stack([d0[:, K + 2], d2[:, K + 2], d1[:, K + 3]], axis=1)
        t2_par = jnp.stack([d1[:, K + 2], d0[:, K + 3], d2[:, K + 3]], axis=1)
        l_sys_i = l_sys[:, pi]
        B = l_sys.shape[0]
        zb = jnp.zeros((B, NW, 8), jnp.float32)

        def body(carry, _):
            apr1, a1, b1, a2, b2 = carry
            llr1, a1n, b1n = _bcjr_pw(l_sys + apr1, l_p1, t1_sys, t1_par,
                                      a1, b1, W)
            ext1 = llr1 - l_sys - apr1
            apr2 = ext1[:, pi]
            llr2, a2n, b2n = _bcjr_pw(l_sys_i + apr2, l_p2, t2_sys, t2_par,
                                      a2, b2, W)
            ext2 = llr2 - l_sys_i - apr2
            return (ext2[:, de], a1n, b1n, a2n, b2n), llr2

        init = (jnp.zeros_like(l_sys), zb, zb, zb, zb)
        (_, *_rest), llr2s = jax.lax.scan(body, init, None, length=n_iter)
        llr_final = llr2s[-1][:, de]
        bits = (llr_final < 0).astype(jnp.uint8)
        return bits, llr_final

    return decode


@functools.lru_cache(maxsize=64)
def _make_decoder_full(K: int, n_iter: int = 8):
    """Full-length-scan decoder (exact; used for short blocks)."""
    pi = tables.qpp_interleave_indices(K).astype(np.int32)
    de = np.zeros(K, dtype=np.int32)
    de[pi] = np.arange(K, dtype=np.int32)

    @jax.jit
    def decode(d_llrs):
        d0 = d_llrs[:, 0, :]
        d1 = d_llrs[:, 1, :]
        d2 = d_llrs[:, 2, :]
        l_sys = d0[:, :K]
        l_p1 = d1[:, :K]
        l_p2 = d2[:, :K]
        # tail llrs (see 36.212 5.1.3.2.2 arrangement)
        t1_sys = jnp.stack([d0[:, K], d2[:, K], d1[:, K + 1]], axis=1)
        t1_par = jnp.stack([d1[:, K], d0[:, K + 1], d2[:, K + 1]], axis=1)
        t2_sys = jnp.stack([d0[:, K + 2], d2[:, K + 2], d1[:, K + 3]], axis=1)
        t2_par = jnp.stack([d1[:, K + 2], d0[:, K + 3], d2[:, K + 3]], axis=1)

        l_sys_i = l_sys[:, pi]

        def body(carry, _):
            apr1 = carry
            llr1 = _bcjr(l_sys + apr1, l_p1, t1_sys, t1_par)
            ext1 = llr1 - l_sys - apr1
            apr2 = ext1[:, pi]
            llr2 = _bcjr(l_sys_i + apr2, l_p2, t2_sys, t2_par)
            ext2 = llr2 - l_sys_i - apr2
            apr1_next = ext2[:, de]
            return apr1_next, llr2

        apr0 = jnp.zeros_like(l_sys)
        apr1_fin, llr2s = jax.lax.scan(body, apr0, None, length=n_iter)
        llr_final = llr2s[-1][:, de]
        bits = (llr_final < 0).astype(jnp.uint8)
        return bits, llr_final

    return decode


def decode_blocks(d_llrs, n_iter: int = 8):
    """Convenience wrapper: (B, 3, K+4) numpy/jnp -> (bits, llr)."""
    K = d_llrs.shape[-1] - 4
    return make_decoder(K, n_iter)(jnp.asarray(d_llrs))
