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
    """Largest power-of-two window <= 32 dividing K (K sizes are 8|16|32|64
    aligned by construction of the 36.212 ladder).  W=32 measures fastest on
    TPU (half the sequential steps of W=64 at equal accuracy with
    next-iteration boundary initialization)."""
    for w in (32, 16, 8):
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


def make_decoder(K: int, n_iter: int = 8, windowed: bool | None = None):
    """Jitted turbo decoder for code-block size K.

    fn(d_llrs (B, 3, K+4)) -> (bits (B, K) uint8, llr (B, K) float32).
    ``windowed`` (default: whenever a window of >= 8 divides K, i.e. every
    36.212 ladder size) selects the parallel-window BCJR (`_bcjr_pw2`:
    butterfly ACS, fwd+bwd fused in one scan) — sequential depth W instead
    of K (a full-scan K=448 decode is ~7000 sequential trellis steps; the
    W=8 windowed one is ~130 for the same iteration count).  Window
    boundary metrics inherit across iterations (NII), so short windows
    converge by ~8 iterations; the escalation retry path covers the
    marginal-SNR residue.  A Pallas BCJR variant exists
    (`_make_decoder_pallas`) but measures slower than the XLA formulation
    on this backend (per-grid-step launch overhead), so the XLA path is the
    default on all platforms.
    """
    if windowed is None:
        windowed = _window_len(K) >= 8
    if windowed:
        return _make_decoder_pw(K, n_iter)
    return _make_decoder_full(K, n_iter)


@functools.lru_cache(maxsize=64)
def _lane_consts(K: int, B: int):
    """Constant index maps for the window-major lane layout (shared by the
    Pallas and XLA lane decoders): 8 RSC states on sublanes, (code block x
    window) columns on lanes; QPP permutes and window-boundary shifts are
    single constant-index gathers."""
    pi = tables.qpp_interleave_indices(K).astype(np.int32)
    de = np.zeros(K, dtype=np.int32)
    de[pi] = np.arange(K, dtype=np.int32)
    W = _window_len(K)
    NW = K // W
    L0 = B * NW
    L = -(-L0 // 128) * 128
    lane_b = np.arange(L) // NW          # code block of each lane
    lane_w = np.arange(L) % NW           # window of each lane
    lane_b[L0:] = 0
    lane_w[L0:] = 0

    def perm_w(p):
        # window-layout flat gather index for apr_dst[k] = ext_src[p[k]]
        idx = np.arange(W * L, dtype=np.int32).reshape(W, L)
        for lane in range(L0):
            b, w = lane // NW, lane % NW
            k = w * W + np.arange(W)                  # dst positions
            src = p[k]
            idx[:, lane] = (src % W) * L + b * NW + src // W
        return idx.reshape(-1)

    # alpha shift: window w inherits a_end of window w-1 (same block)
    sia = np.where(lane_w > 0, np.arange(L) - 1, np.arange(L))
    mask_a = (lane_w > 0).astype(np.float32)[None, :]
    const_a = np.where(mask_a > 0, 0.0, NEG) * np.ones((8, 1), np.float32)
    const_a[0] = 0.0                                   # known state 0
    const_a[:, L0:] = 0.0
    mask_a[:, L0:] = 0.0
    # beta shift: window w inherits b_start of window w+1; last window
    # gets the tail-terminated beta_K (data-dependent, masked in)
    sib = np.where(lane_w < NW - 1, np.arange(L) + 1, np.arange(L))
    is_last = (lane_w == NW - 1)
    is_last[L0:] = False
    mask_b = (~is_last).astype(np.float32)[None, :]
    return dict(L0=L0, L=L, W=W, NW=NW, pi=pi, de=de,
                pi_w=perm_w(pi), de_w=perm_w(de),
                sia=sia.astype(np.int32), mask_a=mask_a, const_a=const_a,
                sib=sib.astype(np.int32), mask_b=mask_b,
                is_last=is_last, lane_b=lane_b.astype(np.int32))


@functools.lru_cache(maxsize=64)
def _make_decoder_pallas(K: int, n_iter: int, interpret: bool | None = None):
    """Parallel-window decoder driving the Pallas BCJR kernel.

    Same algorithm as `_make_decoder_pw` (max-log-MAP, next-iteration
    window-boundary initialization); the whole W-step forward/backward pass
    runs inside one Pallas program per constituent decoder per iteration.
    """
    from ltesniffer_tpu.kernels import turbo_pallas

    pi = tables.qpp_interleave_indices(K).astype(np.int32)
    de = np.zeros(K, dtype=np.int32)
    de[pi] = np.arange(K, dtype=np.int32)
    W = _window_len(K)
    NW = K // W

    def _consts(B: int):
        return _lane_consts(K, B)

    @jax.jit
    def decode(d_llrs):
        d0 = d_llrs[:, 0, :]
        d1 = d_llrs[:, 1, :]
        d2 = d_llrs[:, 2, :]
        l_sys = d0[:, :K]
        t1_sys = jnp.stack([d0[:, K], d2[:, K], d1[:, K + 1]], axis=1)
        t1_par = jnp.stack([d1[:, K], d0[:, K + 1], d2[:, K + 1]], axis=1)
        t2_sys = jnp.stack([d0[:, K + 2], d2[:, K + 2], d1[:, K + 3]], axis=1)
        t2_par = jnp.stack([d1[:, K + 2], d0[:, K + 3], d2[:, K + 3]], axis=1)
        B = l_sys.shape[0]
        c = _consts(B)
        L0, L = c["L0"], c["L"]
        pad = L - L0
        bcjr = turbo_pallas.make_bcjr(W, L, interpret=interpret)

        def to_w(x):      # (B, K) -> (W, L) window-major lanes
            xw = jnp.transpose(x.reshape(B, NW, W), (2, 0, 1)).reshape(W, L0)
            return jnp.pad(xw, ((0, 0), (0, pad)))

        # layout conversions happen ONCE; the loop runs in window layout
        l_sys_w = to_w(l_sys)
        l_sys_iw = to_w(l_sys[:, pi])
        lp1w = to_w(d1[:, :K])
        lp2w = to_w(d2[:, :K])
        # tail-terminated beta_K scattered into the last-window lanes
        bK1 = _beta_init_from_tail(t1_sys, t1_par).T          # (8, B)
        bK2 = _beta_init_from_tail(t2_sys, t2_par).T
        is_last = jnp.asarray(c["is_last"])[None, :]
        betaK1_full = jnp.where(is_last, bK1[:, c["lane_b"]], 0.0)
        betaK2_full = jnp.where(is_last, bK2[:, c["lane_b"]], 0.0)
        mask_a = jnp.asarray(c["mask_a"])
        const_a = jnp.asarray(c["const_a"])
        mask_b = jnp.asarray(c["mask_b"])

        def shift_a(a_end):
            return a_end[:, c["sia"]] * mask_a + const_a

        def shift_b(b_start, betaK_full):
            return b_start[:, c["sib"]] * mask_b + betaK_full

        zero_b = jnp.zeros((8, L), jnp.float32)
        zero_w = jnp.zeros((W, L), jnp.float32)
        init = (zero_w, shift_a(zero_b), shift_b(zero_b, betaK1_full),
                shift_a(zero_b), shift_b(zero_b, betaK2_full), zero_w, zero_w)

        def body(carry, _):
            apr1, a1, b1, a2, b2, _e, _a = carry
            ext1, a1e, b1s = bcjr(apr1, l_sys_w, lp1w, a1, b1)
            apr2 = ext1.reshape(-1)[c["pi_w"]].reshape(W, L)
            ext2, a2e, b2s = bcjr(apr2, l_sys_iw, lp2w, a2, b2)
            apr1n = ext2.reshape(-1)[c["de_w"]].reshape(W, L)
            return (apr1n, shift_a(a1e), shift_b(b1s, betaK1_full),
                    shift_a(a2e), shift_b(b2s, betaK2_full), ext2, apr2), None

        (_, _, _, _, _, ext2, apr2), _ = jax.lax.scan(
            body, init, None, length=n_iter)
        llr2w = ext2 + apr2 + l_sys_iw                     # full LLR, dec-2
        llr2 = jnp.transpose(
            llr2w[:, :L0].reshape(W, B, NW), (1, 2, 0)).reshape(B, K)
        llr_final = llr2[:, de]
        bits = (llr_final < 0).astype(jnp.uint8)
        return bits, llr_final

    return decode


def _bcjr_lanes(apr, l_sys_w, lp_w, a_init, b_init, W: int, L: int):
    """One constituent max-log BCJR in lane-major layout.

    apr / l_sys_w / lp_w: (W, L) window-major LLRs; a_init / b_init: (8, L)
    boundary metrics.  The 8-state axis rides on sublanes so every ACS op
    vectorizes across the full 128-lane width (the (B, NW, 8) layout leaves
    the minor dim at 8/128 lane occupancy).  Forward and backward fused in
    one W-step scan.  Returns (full_llr (W, L), a_end (8, L), b_start (8, L)).
    """
    c = _butterfly_consts()
    SXF = jnp.asarray(c["SXF"])[..., None]      # (2, 4, 2, 1)
    SZF = jnp.asarray(c["SZF"])[..., None]
    SXB = jnp.asarray(c["SXB"])[..., None]      # (8, 2, 1)
    SZB = jnp.asarray(c["SZB"])[..., None]
    li = 0.5 * (l_sys_w + apr)
    lp = 0.5 * lp_w
    xs = (li, lp, jnp.flip(li, 0), jnp.flip(lp, 0))

    def step(carry, inp):
        alpha, beta = carry                      # (8, L)
        af, bf, ab, bb = inp                     # (L,)
        # forward butterfly: n = (a<<2)|m from predecessor pair (2m, 2m+1)
        g = af[None, None, None, :] * SXF + bf[None, None, None, :] * SZF
        cand = alpha.reshape(1, 4, 2, L) + g     # (2, 4, 2, L)
        anew = jnp.max(cand, axis=2).reshape(8, L)
        anew = anew - jnp.max(anew, axis=0, keepdims=True)
        # backward butterfly: successors of s are (d<<2)|(s>>1)
        bbt = jnp.swapaxes(beta.reshape(2, 4, L), 0, 1)   # (4, 2, L)
        bbp = jnp.repeat(bbt, 2, axis=0)                  # (8, 2, L)
        bcand = ab[None, None, :] * SXB + bb[None, None, :] * SZB + bbp
        bnew = jnp.max(bcand, axis=1)                     # (8, L)
        bnew = bnew - jnp.max(bnew, axis=0, keepdims=True)
        return (anew, bnew), (alpha, beta)

    (a_end, b_start), (alphas, betas_rev) = jax.lax.scan(
        step, (a_init, b_init), xs)
    betas_kp1 = jnp.flip(betas_rev, axis=0)               # (W, 8, L)
    SZL0 = jnp.asarray(c["SZL0"])[None, :, None]
    SZL1 = jnp.asarray(c["SZL1"])[None, :, None]
    FB = jnp.asarray(c["FB"])[None, :, None]
    bbt = jnp.swapaxes(betas_kp1.reshape(W, 2, 4, L), 1, 2)   # (W, 4, 2, L)
    bbp = jnp.repeat(bbt, 2, axis=1)                          # (W, 8, 2, L)
    bsel0 = jnp.where(FB, bbp[:, :, 1], bbp[:, :, 0])
    bsel1 = jnp.where(FB, bbp[:, :, 0], bbp[:, :, 1])
    m0 = jnp.max(alphas + li[:, None, :] + lp[:, None, :] * SZL0 + bsel0,
                 axis=1)
    m1 = jnp.max(alphas - li[:, None, :] + lp[:, None, :] * SZL1 + bsel1,
                 axis=1)                                      # (W, L)
    return m0 - m1, a_end, b_start


@functools.lru_cache(maxsize=64)
def _make_decoder_lanes(K: int, n_iter: int):
    """Parallel-window decoder in the (8, states-on-sublanes) lane layout,
    pure XLA.  Same algorithm and index maps as the Pallas driver.

    MEASURED RESULT (axon v5e, B=4096, K=4416, 4 iters): 1730 ms vs the
    (B, NW, 8) `_make_decoder_pw`'s 266 ms — the full-lane ACS wins are
    swamped by the per-iteration QPP interleaves becoming 18M-element flat
    gathers in window-major layout (in batch-major layout they are cheap
    shared-index row gathers).  Kept as the documented negative result and
    a CPU-correctness cross-check (bit-exact vs `_make_decoder_pw`)."""
    W = _window_len(K)
    NW = K // W

    @jax.jit
    def decode(d_llrs):
        d0 = d_llrs[:, 0, :]
        d1 = d_llrs[:, 1, :]
        d2 = d_llrs[:, 2, :]
        l_sys = d0[:, :K]
        t1_sys = jnp.stack([d0[:, K], d2[:, K], d1[:, K + 1]], axis=1)
        t1_par = jnp.stack([d1[:, K], d0[:, K + 1], d2[:, K + 1]], axis=1)
        t2_sys = jnp.stack([d0[:, K + 2], d2[:, K + 2], d1[:, K + 3]], axis=1)
        t2_par = jnp.stack([d1[:, K + 2], d0[:, K + 3], d2[:, K + 3]], axis=1)
        B = l_sys.shape[0]
        c = _lane_consts(K, B)
        L0, L = c["L0"], c["L"]
        pad = L - L0
        pi, de = c["pi"], c["de"]

        def to_w(x):      # (B, K) -> (W, L) window-major lanes
            xw = jnp.transpose(x.reshape(B, NW, W), (2, 0, 1)).reshape(W, L0)
            return jnp.pad(xw, ((0, 0), (0, pad)))

        l_sys_w = to_w(l_sys)
        l_sys_iw = to_w(l_sys[:, pi])
        lp1w = to_w(d1[:, :K])
        lp2w = to_w(d2[:, :K])
        bK1 = _beta_init_from_tail(t1_sys, t1_par).T          # (8, B)
        bK2 = _beta_init_from_tail(t2_sys, t2_par).T
        is_last = jnp.asarray(c["is_last"])[None, :]
        betaK1_full = jnp.where(is_last, bK1[:, c["lane_b"]], 0.0)
        betaK2_full = jnp.where(is_last, bK2[:, c["lane_b"]], 0.0)
        mask_a = jnp.asarray(c["mask_a"])
        const_a = jnp.asarray(c["const_a"])
        mask_b = jnp.asarray(c["mask_b"])

        def shift_a(a_end):
            return a_end[:, c["sia"]] * mask_a + const_a

        def shift_b(b_start, betaK_full):
            return b_start[:, c["sib"]] * mask_b + betaK_full

        zero_b = jnp.zeros((8, L), jnp.float32)
        zero_w = jnp.zeros((W, L), jnp.float32)
        init = (zero_w, shift_a(zero_b), shift_b(zero_b, betaK1_full),
                shift_a(zero_b), shift_b(zero_b, betaK2_full), zero_w,
                zero_w)

        def body(carry, _):
            apr1, a1, b1, a2, b2, _e, _a = carry
            llr1, a1e, b1s = _bcjr_lanes(apr1, l_sys_w, lp1w, a1, b1, W, L)
            ext1 = llr1 - l_sys_w - apr1
            apr2 = ext1.reshape(-1)[c["pi_w"]].reshape(W, L)
            llr2, a2e, b2s = _bcjr_lanes(apr2, l_sys_iw, lp2w, a2, b2, W, L)
            ext2 = llr2 - l_sys_iw - apr2
            apr1n = ext2.reshape(-1)[c["de_w"]].reshape(W, L)
            return (apr1n, shift_a(a1e), shift_b(b1s, betaK1_full),
                    shift_a(a2e), shift_b(b2s, betaK2_full), ext2, apr2), None

        (_, _, _, _, _, ext2, apr2), _ = jax.lax.scan(
            body, init, None, length=n_iter)
        llr2w = ext2 + apr2 + l_sys_iw                     # full LLR, dec-2
        llr2 = jnp.transpose(
            llr2w[:, :L0].reshape(W, B, NW), (1, 2, 0)).reshape(B, K)
        llr_final = llr2[:, de]
        bits = (llr_final < 0).astype(jnp.uint8)
        return bits, llr_final

    return decode


@functools.lru_cache(maxsize=1)
def _butterfly_consts():
    """Gather-free BCJR constants exploiting the RSC shift structure.

    With s=(s1,s2,s3) and next = (a, s1, s2) (a = x ^ fb(s), fb = s2^s3,
    `phy/turbo.py:91-111`), state n=(a<<2)|m has the adjacent predecessor
    pair (2m, 2m+1) — so add-compare-select is a reshape butterfly, and all
    ±1 sign tables below are compile-time constants.
    """
    t = turbo_host.rsc_tables()
    par = t["parity"]
    fb = np.array([((s >> 1) & 1) ^ (s & 1) for s in range(8)])
    SXF = np.zeros((2, 4, 2), np.float32)   # fwd: [a, m, j] for s=2m+j
    SZF = np.zeros((2, 4, 2), np.float32)
    for a in range(2):
        for m in range(4):
            for j in range(2):
                s = 2 * m + j
                x = a ^ fb[s]
                SXF[a, m, j] = 1.0 - 2.0 * x
                SZF[a, m, j] = 1.0 - 2.0 * par[s, x]
    SXB = np.zeros((8, 2), np.float32)      # bwd: [s, d] with d = a
    SZB = np.zeros((8, 2), np.float32)
    for s in range(8):
        for d in range(2):
            x = d ^ fb[s]
            SXB[s, d] = 1.0 - 2.0 * x
            SZB[s, d] = 1.0 - 2.0 * par[s, x]
    SZL0 = (1.0 - 2.0 * par[:, 0]).astype(np.float32)   # llr, x=0
    SZL1 = (1.0 - 2.0 * par[:, 1]).astype(np.float32)
    return dict(SXF=SXF, SZF=SZF, SXB=SXB, SZB=SZB,
                SZL0=SZL0, SZL1=SZL1, FB=fb.astype(bool))


def _bcjr_pw2(l_in, l_par, tail_sys, tail_par, alpha_b, beta_b, W: int):
    """Parallel-window max-log BCJR, v2: butterfly ACS (no gathers) and the
    forward & backward recursions fused into ONE `lax.scan` of W steps (the
    backward runs on the time-reversed sequence concurrently), halving the
    sequential depth vs `_bcjr_pw`.  Same interface/semantics.
    """
    c = _butterfly_consts()
    SXF = jnp.asarray(c["SXF"])
    SZF = jnp.asarray(c["SZF"])
    SXB = jnp.asarray(c["SXB"])
    SZB = jnp.asarray(c["SZB"])
    B, K = l_in.shape
    NW = K // W
    li = jnp.moveaxis(0.5 * l_in.reshape(B, NW, W), 2, 0)    # (W, B, NW)
    lp = jnp.moveaxis(0.5 * l_par.reshape(B, NW, W), 2, 0)

    known0 = jnp.full((B, 1, 8), NEG).at[:, :, 0].set(0.0)
    alpha_init = jnp.concatenate([known0, alpha_b[:, :-1]], axis=1)
    beta_K = _beta_init_from_tail(tail_sys, tail_par)        # (B, 8)
    beta_init = jnp.concatenate([beta_b[:, 1:], beta_K[:, None]], axis=1)

    xs = (li, lp, jnp.flip(li, axis=0), jnp.flip(lp, axis=0))

    def step(carry, inp):
        alpha, beta = carry
        af, bf, ab, bb = inp
        # forward butterfly: n=(a<<2)|m from pair (2m, 2m+1)
        g = af[..., None, None, None] * SXF + bf[..., None, None, None] * SZF
        cand = alpha.reshape(B, NW, 1, 4, 2) + g             # (B,NW,2,4,2)
        anew = jnp.max(cand, axis=-1).reshape(B, NW, 8)
        anew = anew - jnp.max(anew, axis=-1, keepdims=True)
        # backward butterfly: targets of s are (d<<2)|(s>>1), d in {0,1}
        bbt = jnp.swapaxes(beta.reshape(B, NW, 2, 4), -1, -2)  # (B,NW,4,2)
        bbp = jnp.repeat(bbt, 2, axis=-2)                    # (B,NW,8,2)
        bcand = (ab[..., None, None] * SXB + bb[..., None, None] * SZB
                 + bbp)
        bnew = jnp.max(bcand, axis=-1)
        bnew = bnew - jnp.max(bnew, axis=-1, keepdims=True)
        return (anew, bnew), (alpha, beta)

    (a_end, b_start), (alphas, betas_rev) = jax.lax.scan(
        step, (alpha_init, beta_init), xs)
    betas_kp1 = jnp.flip(betas_rev, axis=0)                  # (W,B,NW,8)

    # vectorized LLR over all positions
    SZL0 = jnp.asarray(c["SZL0"])
    SZL1 = jnp.asarray(c["SZL1"])
    FB = jnp.asarray(c["FB"])
    bbt = jnp.swapaxes(betas_kp1.reshape(W, B, NW, 2, 4), -1, -2)
    bbp = jnp.repeat(bbt, 2, axis=-2)                        # (W,B,NW,8,2)
    bsel0 = jnp.where(FB, bbp[..., 1], bbp[..., 0])
    bsel1 = jnp.where(FB, bbp[..., 0], bbp[..., 1])
    m0 = jnp.max(alphas + li[..., None] + lp[..., None] * SZL0 + bsel0,
                 axis=-1)
    m1 = jnp.max(alphas - li[..., None] + lp[..., None] * SZL1 + bsel1,
                 axis=-1)                                    # (W, B, NW)
    llr = jnp.moveaxis(m0 - m1, 0, 2).reshape(B, K)
    return llr, a_end, b_start


@functools.lru_cache(maxsize=64)
def _make_decoder_pw(K: int, n_iter: int, W: int | None = None):
    pi = tables.qpp_interleave_indices(K).astype(np.int32)
    de = np.zeros(K, dtype=np.int32)
    de[pi] = np.arange(K, dtype=np.int32)
    if W is None:
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
            llr1, a1n, b1n = _bcjr_pw2(l_sys + apr1, l_p1, t1_sys, t1_par,
                                      a1, b1, W)
            ext1 = llr1 - l_sys - apr1
            apr2 = ext1[:, pi]
            llr2, a2n, b2n = _bcjr_pw2(l_sys_i + apr2, l_p2, t2_sys, t2_par,
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
