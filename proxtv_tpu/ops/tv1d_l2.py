"""Batched 1D TV-L2 (grouped-norm) proximity solvers (TPU-native).

Solves, for every signal in a batch,

    min_x 0.5 ||x - y||^2 + lam ||D x||_2

where ``(Dx)_i = x_i - x_{i+1}``.  The dual is a Euclidean-ball-constrained
quadratic

    min_{||w|| <= lam} 0.5 w' DD' w - w' dy,      dy_i = y_{i+1} - y_i,

(reference ``src/TVL2opt.cpp``) which we solve with three engines:

*   :func:`tv2_ms` — More-Sorensen trust-region secular iteration (reference
    ``more_TV2``, src/TVL2opt.cpp:35).  Each iteration solves
    ``(DD' + alpha I) w = dy`` and the derivative system ``(DD'+alpha I) q = w``
    with batched parallel cyclic reduction (the TPU replacement for the
    reference's LAPACK dpttrf/dpttrs at src/TVL2opt.cpp:106-110), then applies
    the Newton secular update ``alpha += (||w||^2 / w'q) (||w|| - lam)/lam``.
    Fully batched; O(log n) depth per iteration.

*   :func:`tv2_pg` — projected gradient with fixed step 1/L, L = 4 =
    lambda_max(DD') (reference ``PG_TV2``, src/TVL2opt.cpp:446, STEP 0.25).
    Ball projection is a radial shrink — one norm + one scale per step.

*   :func:`tv2_mspg` — the reference default hybrid (``morePG_TV2``,
    src/TVL2opt.cpp:190): up to ``cfg.mspg_pg_iters`` PG steps first; lanes
    still above tolerance are finished with MS.

Duality gap (stopping criterion): gap = lam * ||g||_2 + w'g with
g = Dx = D(y + D'w) — the L2 analog of the reference GRAD2GAP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import diffs
from ..utils.config import DEFAULT_TV2, EPSILON, TV2Config
from ..utils.info import RC_ITERS, RC_OK, make_info
from . import tridiag


def _gap_tv2(w, g, lam):
    """Duality gap: lam * ||g||_2 + w'g (>= 0, == 0 at the optimum)."""
    return jnp.abs(lam * jnp.linalg.norm(g, axis=-1) + jnp.sum(w * g, axis=-1))


def _dst1(x):
    """Orthonormal DST-I along the last axis (involutory: S @ S = I), via an
    odd-extension real FFT: FFT([0, x, 0, -reverse(x)])_k = -2i DST1(x)_k.

    DD' (the TV dual Hessian) is the Dirichlet discrete Laplacian, which
    DST-I diagonalizes exactly — eigenvalues 4 sin^2(k pi / (2(m+1))) — so
    shifted solves and the whole More-Sorensen secular iteration become
    ELEMENTWISE in this basis (see :func:`_spectral_secular`)."""
    m = x.shape[-1]
    zero = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    ext = jnp.concatenate([zero, x, zero, -jnp.flip(x, -1)], axis=-1)
    F = jnp.fft.rfft(ext, axis=-1)
    import numpy as np
    return (-0.5 * np.sqrt(2.0 / (m + 1))) * jnp.imag(F)[..., 1:m + 1].astype(x.dtype)


def _smooth23(L: int) -> int:
    """Smallest 2-3-smooth integer >= L (TPU FFT sizes; radix-5-heavy sizes
    run ~5x slower, measured — see :func:`_fft_friendly`)."""
    best = 1
    while best < L:
        best *= 2
    t = 3
    while t < best:
        c = t
        while c < L:
            c *= 2
        best = min(best, c)
        t *= 3
    return best


@functools.lru_cache(maxsize=8)
def _chirp_consts(m: int, is64: bool):
    """Host-precomputed chirp-z constants for an arbitrary-length DST-I
    (Bluestein): phase tables and the FFT of the chirp kernel, exact in
    integer arithmetic (j^2 reduced mod 4(m+1), the chirp's phase period)
    so f32 runs keep full phase accuracy at j ~ 1e6.  Computed once per
    (length, dtype) at trace time; baked into the jit graph as constants."""
    import numpy as np
    M = m + 1
    alpha = np.pi / (2.0 * M)
    j = np.arange(1, m + 1, dtype=np.int64)
    wj = np.exp(1j * alpha * ((j * j) % (4 * M)))          # e^{i a j^2}
    u = np.arange(2 * m - 1, dtype=np.int64) - (m - 1)
    q = np.exp(-1j * alpha * ((u * u) % (4 * M)))          # e^{-i a t^2}
    L = _smooth23(2 * m - 1)
    qhat = np.fft.fft(q, n=L)
    scale = np.sqrt(2.0 / M)
    cdt = np.complex128 if is64 else np.complex64
    return (wj.astype(cdt), qhat.astype(cdt), L, scale)


def _dst1_chirp(x):
    """Orthonormal DST-I along the last axis at ARBITRARY length via the
    chirp-z (Bluestein) identity jk = (j^2 + k^2 - (k-j)^2)/2:

        DST1(x)_k = Im[ e^{i a k^2} sum_j (x_j e^{i a j^2}) e^{-i a (k-j)^2} ],

    a = pi/(2(m+1)) — a linear convolution with the fixed chirp kernel,
    evaluated with two same-size FFTs at the nearest 2-3-smooth length
    >= 2m-1 (the kernel's FFT is a host-precomputed constant).  This makes
    EVERY length FFT-friendly: the TPU backend's mixed-radix FFT degrades
    ~5x on radix-5-heavy sizes (e.g. 2(m+1) = 2,000,000 = 2^7*5^6), while
    the chirp route runs the same problem on 2^21-point transforms."""
    m = x.shape[-1]
    is64 = x.dtype == jnp.float64
    wj, qhat, L, scale = _chirp_consts(m, is64)
    a = x * jnp.real(wj) + 1j * (x * jnp.imag(wj))
    A = jnp.fft.fft(a, n=L, axis=-1)
    conv = jnp.fft.ifft(A * qhat, axis=-1)[..., m - 1: 2 * m - 1]
    # S'_k sits at conv index k-1 (correlation offset m-1); multiply by the
    # output chirp e^{i a k^2} — identical to wj since k ranges 1..m too.
    s = jnp.imag(conv) * jnp.real(wj) + jnp.real(conv) * jnp.imag(wj)
    return (scale * s).astype(x.dtype)


def _spectral_secular(dy, lamv, safe_lam, tolb, max_iters, zero_pen,
                      alpha_init=None, dst=None, return_w=True):
    """Solve the More-Sorensen secular equation ||w(alpha)|| = lam entirely
    in the DST-I eigenbasis of DD': with s = DST(dy) and eigenvalues mu_k,
    ||w(alpha)||^2 = sum_k s_k^2 / (mu_k + alpha)^2 — every Newton iteration
    is elementwise + a reduction, NO tridiagonal solves.  Returns
    (alpha, aprev, phi_prev, w_real, iters): the root, the previous iterate
    pair (seeding the real-space secant fallback in case f32 FFT rounding
    leaves the real-space norm outside tolerance), the dual in real space,
    and the iteration count.

    ``zero_pen`` rows (lam <= 0) and rows whose constraint is inactive at
    alpha = 0 never iterate and come back with alpha = 0 / iters = 0 (the
    caller substitutes x = y resp. the interior solution).  ``alpha_init``
    warm-starts the Newton iteration per row (the same Workspace-style
    restart the real-space paths honor): phi is convex decreasing, so the
    tangent at ANY alpha >= 0 crosses zero at or below the root — one step
    from a warm point lands below the root and the iteration proceeds
    monotonically from below, exactly as from cold.  The iteration budget is
    per-row: an exhausted row freezes without blocking the others."""
    m = dy.shape[-1]
    dtype = dy.dtype
    import numpy as np
    theta = (jnp.arange(1, m + 1, dtype=dtype) * (np.pi / (m + 1)))
    mu = 4.0 * jnp.sin(0.5 * theta) ** 2
    if dst is None:
        dst = _dst1
    s = dst(dy)
    s2 = s * s

    def norm_phi(alpha):
        denom = mu + alpha[:, None]
        t2 = s2 / (denom * denom)
        P = jnp.sum(t2, axis=-1)
        nrm = jnp.sqrt(P)
        phi = 1.0 / safe_lam - 1.0 / jnp.maximum(nrm, EPSILON)
        dphi = -jnp.sum(t2 / denom, axis=-1) / jnp.maximum(
            P * nrm, EPSILON)
        return nrm, phi, dphi

    B = dy.shape[0]
    zero = jnp.zeros((B,), dtype)
    nrm0, _, _ = norm_phi(zero)
    # Interior (||w(0)|| <= lam => root <= 0) and zero-penalty rows are
    # excluded up front: their secular equation has no positive root, so
    # Newton would chase ||w|| = lam forever against a per-row budget.
    needs_root = (jnp.abs(nrm0 - lamv) > tolb) & (nrm0 > lamv) & ~zero_pen
    if alpha_init is None:
        a0 = zero
    else:
        a0 = jnp.where(needs_root,
                       jnp.maximum(jnp.asarray(alpha_init, dtype), 0.0), 0.0)
    nrm_b, phi_b, dphi_b = norm_phi(a0)
    running0 = needs_root & (jnp.abs(nrm_b - lamv) > tolb)

    def body(state):
        alpha, aprev, phiprev, iters, running = state
        act = running & (iters < max_iters)
        nrm, phi, dphi = norm_phi(alpha)
        alpha_new = jnp.maximum(alpha - phi / jnp.where(
            dphi < -EPSILON, dphi, -EPSILON), 0.0)
        conv = jnp.abs(nrm - lamv) <= tolb
        aprev = jnp.where(act, alpha, aprev)
        phiprev = jnp.where(act, phi, phiprev)
        alpha = jnp.where(act & ~conv, alpha_new, alpha)
        iters = iters + act.astype(jnp.int32)
        running = running & ~(act & conv)
        return alpha, aprev, phiprev, iters, running

    def cond(state):
        _, _, _, iters, running = state
        return jnp.any(running & (iters < max_iters))

    alpha1 = jnp.maximum(a0 - phi_b / jnp.where(dphi_b < -EPSILON, dphi_b,
                                                -EPSILON), 0.0)
    alpha1 = jnp.where(running0, alpha1, a0)
    alpha, aprev, phiprev, iters, _ = jax.lax.while_loop(
        cond, body, (alpha1, a0, phi_b, jnp.zeros((B,), jnp.int32),
                     running0))
    # The dual in real space: the inverse DST (involutory) — or None when
    # the caller recovers w with one exact tridiagonal solve at the root
    # instead (cheaper and more accurate than a chirp-z back transform).
    w = dst(s / (mu + alpha[:, None])) if return_w else None
    return alpha, aprev, phiprev, w, iters


def _lam_vec(lam, B, dtype):
    lam = jnp.asarray(lam, dtype)
    if lam.ndim == 0:
        return jnp.broadcast_to(lam, (B,))
    return lam.reshape(B)


def _fft_friendly(L: int) -> bool:
    """True when a length-L FFT is fast on TPU: after removing factors of
    2 and 3 the remainder must be <= 5 (measured: 2^17*3*5 = 1,966,080 runs
    at 4.7 ms, 2^7*5^6 = 2,000,000 at 32.7 ms on a v5e)."""
    while L % 2 == 0:
        L //= 2
    while L % 3 == 0:
        L //= 3
    return L <= 5


def _ms_fused_ok(y):
    """Route to the fused Pallas MS kernel on TPU (f32, moderate n,
    single-device input — a pallas_call would gather a sharded operand)."""
    from .kernels import gating
    return gating.gate(y, "ms")


def tv2_ms(y, lam, cfg: TV2Config = DEFAULT_TV2, alpha_init=None,
           return_alpha: bool = False):
    """Batched More-Sorensen TV-L2 prox: fused Pallas kernel on TPU f32,
    XLA composition elsewhere (see :func:`_tv2_ms_xla` for the contract)."""
    y = jnp.asarray(y)
    if _ms_fused_ok(y):
        from .kernels import ms_fused
        B = y.shape[0]
        lam_a = jnp.asarray(lam, y.dtype)
        kw = dict(max_iters=cfg.max_iters, stop_boundary=float(cfg.stop_boundary))
        if lam_a.ndim == 0:
            x, alpha, gap, iters = ms_fused.ms_tv2_fused(
                y, lam=lam_a, alpha_init=alpha_init, **kw)
        else:
            x, alpha, gap, iters = ms_fused.ms_tv2_fused(
                y, lam_rows=lam_a.reshape(B), alpha_init=alpha_init, **kw)
        rc = jnp.where(iters >= cfg.max_iters, RC_ITERS, RC_OK).astype(jnp.int32)
        info = make_info(iters, gap, rc)
        if return_alpha:
            return x, info, alpha
        return x, info
    return _tv2_ms_xla(y, lam, cfg=cfg, alpha_init=alpha_init,
                       return_alpha=return_alpha)


@functools.partial(jax.jit, static_argnames=("cfg", "return_alpha"))
def _tv2_ms_xla(y, lam, cfg: TV2Config = DEFAULT_TV2, alpha_init=None,
                return_alpha: bool = False):
    """Batched More-Sorensen TV-L2 prox.

    Args:
        y: (B, n) batch of signals.
        lam: scalar or (B,) nonnegative penalties.
        cfg: tolerances (defaults mirror reference src/TVopt.h:36-39).
        alpha_init: optional (B,) secular-multiplier warm start — the TPU
            analog of the reference's Workspace warm restart of the MS
            lambda (src/TVL2opt.cpp:255-257,414-419); combiners carry each
            fiber's alpha across outer sweeps.
        return_alpha: also return the final multiplier for threading.

    Returns:
        (x, info) or (x, info, alpha).
    """
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    if n == 1:
        info1 = make_info(jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
                          jnp.zeros((B,), jnp.int32))
        if return_alpha:
            return y, info1, jnp.zeros((B,), dtype)
        return y, info1
    lamv = _lam_vec(lam, B, dtype)
    # Center (translation equivariance; dual unchanged — see tv1d_l1.tv1_pn).
    ybar = jnp.mean(y, axis=-1, keepdims=True)
    y = y - ybar
    dy = diffs.forward_diff(y)

    zero_pen = lamv <= 0
    safe_lam = jnp.where(lamv > 0, lamv, 1.0)
    tolb = cfg.stop_boundary * safe_lam

    def solve(rhs, alpha):
        # Normalized PCR: ~22% faster than the general pcr_solve at n ~ 1e6
        # (the dominant cost of the long-signal secular iteration); the
        # Pallas PCR kernel in spd_second_difference_solve covers n <= 8192.
        if rhs.shape[-1] > 8192 or jax.default_backend() != "tpu":
            return tridiag.spd_shifted_solve_normalized(rhs, alpha[:, None])
        return tridiag.spd_second_difference_solve(
            rhs, diag_shift=alpha[:, None])

    if n > 8192:
        # Large fibers: solve the secular equation ENTIRELY in the DST-I
        # eigenbasis of DD' — every Newton iteration is elementwise, no
        # tridiagonal solves.  FFT-friendly lengths (2n 5-smooth) use the
        # direct odd-extension rfft both ways (2 FFTs total); EVERY OTHER
        # length goes through the chirp-z (Bluestein) DST (2 same-size
        # 2-3-smooth FFTs for the forward transform) and recovers the dual
        # with ONE exact tridiagonal solve at the root instead of a back
        # transform — vs ~9 solves (~1.65 ms each at n ~ 1e6 on a v5e) for
        # the pure secant path it replaces.  The secant loop below then
        # runs only if FFT rounding left the real-space norm outside
        # tolerance (it is seeded with the spectral iterate pair).
        friendly = _fft_friendly(2 * n)
        alpha1, a_start, phi_s, w_s, it0 = _spectral_secular(
            dy, lamv, safe_lam, tolb, cfg.max_iters, zero_pen,
            alpha_init=alpha_init, dst=_dst1 if friendly else _dst1_chirp,
            return_w=friendly)
        if w_s is None:
            w_s = solve(dy, alpha1)
        nrm_s = jnp.linalg.norm(w_s, axis=-1)
        interior0 = (alpha1 <= 0) & (nrm_s <= lamv) & ~zero_pen
    else:
        # Bootstrap: one Cholesky-form Newton step of the secular equation
        # phi(alpha) = 1/lam - 1/||w(alpha)|| (reference more_TV2 update,
        # src/TVL2opt.cpp:106-128) — the only double solve; the loop then
        # runs the SECANT iteration (one solve per step), mirroring the
        # fused MS kernel (ops/kernels/ms_fused.py).  phi is convex
        # decreasing with phi(root) = 0, so Newton from below under-shoots
        # and the secant also converges monotonically from below; a warm
        # alpha may start above the root, where the (clipped) updates
        # descend, safeguarded by the cap.
        if alpha_init is None:
            a_start = jnp.zeros((B,), dtype)
        else:
            a_start = jnp.maximum(jnp.asarray(alpha_init, dtype), 0.0)
        w_s = solve(dy, a_start)
        q_s = solve(w_s, a_start)
        nrm_s = jnp.linalg.norm(w_s, axis=-1)
        wq_s = jnp.sum(w_s * q_s, axis=-1)
        delta0 = (nrm_s * nrm_s / jnp.maximum(wq_s, EPSILON)) \
            * (nrm_s - safe_lam) / safe_lam
        alpha1 = jnp.maximum(a_start + delta0, 0.0)
        phi_s = 1.0 / safe_lam - 1.0 / jnp.maximum(nrm_s, EPSILON)
        # Interior case: alpha driven to 0 with ||w|| <= lam (the
        # unconstrained solution is feasible; x is exactly the mean).
        interior0 = (a_start <= 0) & (nrm_s <= lamv) & ~zero_pen
        it0 = jnp.zeros((B,), jnp.int32)
    conv0 = (jnp.abs(nrm_s - lamv) <= tolb) | interior0
    running0 = ~conv0 & ~zero_pen

    def body(state):
        alpha, aprev, phiprev, w, interior, iters, running = state
        # Per-row budget: a row that exhausted cfg.max_iters freezes (and
        # exits with RC_ITERS) without starving rows that still converge —
        # e.g. when the spectral bootstrap above spent a mixed batch's
        # budget unevenly.
        act = running & (iters < cfg.max_iters)
        w_new = solve(dy, alpha)
        nrm = jnp.linalg.norm(w_new, axis=-1)
        phi = 1.0 / safe_lam - 1.0 / jnp.maximum(nrm, EPSILON)
        denom = phi - phiprev
        secant = alpha - phi * (alpha - aprev) / denom
        alpha_new = jnp.maximum(
            jnp.where(jnp.abs(denom) > EPSILON, secant, alpha), 0.0)
        inter = (alpha <= 0) & (nrm <= lamv)
        conv = (jnp.abs(nrm - lamv) <= tolb) | inter
        w = jnp.where(act[:, None], w_new, w)
        interior = jnp.where(act, inter, interior)
        aprev = jnp.where(act, alpha, aprev)
        phiprev = jnp.where(act, phi, phiprev)
        alpha = jnp.where(act & ~conv, alpha_new, alpha)
        iters = iters + act.astype(jnp.int32)
        running = running & ~(act & conv)
        return alpha, aprev, phiprev, w, interior, iters, running

    def cond(state):
        *_, iters, running = state
        return jnp.any(running & (iters < cfg.max_iters))

    alpha, _, _, w, interior, iters, running = jax.lax.while_loop(
        cond, body, (alpha1, a_start, phi_s, w_s, interior0, it0, running0))

    x = diffs.dual2primal(w, y)
    x = jnp.where(interior[:, None], 0.0, x)  # interior: x = mean (centered)
    x = jnp.where(zero_pen[:, None], y, x)
    g = diffs.primal2grad(x)
    gap = jnp.where(interior | zero_pen, 0.0, _gap_tv2(w, g, lamv))
    rc = jnp.where(running, RC_ITERS, RC_OK).astype(jnp.int32)
    info = make_info(iters, gap, rc)
    if return_alpha:
        return x + ybar, info, alpha
    return x + ybar, info


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def tv2_pg(y, lam, cfg: TV2Config = DEFAULT_TV2, max_iters: int | None = None):
    """Batched projected-gradient TV-L2 prox (reference PG_TV2, src/TVL2opt.cpp:446)."""
    y = jnp.asarray(y)
    B, n = y.shape
    dtype = y.dtype
    if n == 1:
        return y, make_info(jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
                            jnp.zeros((B,), jnp.int32))
    lamv = _lam_vec(lam, B, dtype)
    # Center (translation equivariance; dual unchanged — see tv1d_l1.tv1_pn).
    ybar = jnp.mean(y, axis=-1, keepdims=True)
    y = y - ybar
    dy = diffs.forward_diff(y)
    cap = int(max_iters) if max_iters else cfg.pg_max_iters
    step = jnp.asarray(cfg.pg_step, dtype)
    # Reference-parity absolute tolerance with a dtype-achievability floor:
    # in f64 tol == cfg.stop; in f32 the floor ~10*eps*||y||^2 prevents
    # never-terminating loops on gaps the dtype cannot resolve.
    scale = jnp.maximum(1.0, 0.5 * jnp.sum(y * y, axis=-1))
    tol = jnp.maximum(cfg.stop, 10.0 * jnp.finfo(dtype).eps * scale)

    def proj_ball(w):
        nrm = jnp.linalg.norm(w, axis=-1)
        scale = jnp.where(nrm > lamv, lamv / jnp.maximum(nrm, EPSILON), 1.0)
        return w * scale[:, None]

    def grad(w):
        # DD'w - dy, where DD' is the second-difference (2,-1) matrix.
        return diffs.primal2grad(diffs.adjoint_diff(w)) - dy

    def body(state):
        w, gap, iters, running = state
        w_new = proj_ball(w - step * grad(w))
        x = diffs.dual2primal(w_new, y)
        g = diffs.primal2grad(x)
        gap_new = _gap_tv2(w_new, g, lamv)
        w = jnp.where(running[:, None], w_new, w)
        gap = jnp.where(running, gap_new, gap)
        iters = iters + running.astype(jnp.int32)
        running = running & (gap > tol)
        return w, gap, iters, running

    def cond(state):
        _, _, iters, running = state
        return jnp.any(running) & (jnp.max(iters) < cap)

    w_init = jnp.zeros((B, n - 1), dtype)
    gap0 = _gap_tv2(w_init, diffs.primal2grad(y), lamv)
    running0 = (gap0 > tol) & (lamv > 0)
    w, gap, iters, running = jax.lax.while_loop(
        cond, body, (w_init, gap0, jnp.zeros((B,), jnp.int32), running0))
    x = diffs.dual2primal(w, y) + ybar
    rc = jnp.where(running, RC_ITERS, RC_OK).astype(jnp.int32)
    return x, make_info(iters, gap, rc)


@functools.partial(jax.jit, static_argnames=("cfg",))
def tv2_mspg(y, lam, cfg: TV2Config = DEFAULT_TV2):
    """Hybrid PG-then-MS TV-L2 prox (reference morePG_TV2, src/TVL2opt.cpp:190).

    Runs up to ``cfg.mspg_pg_iters`` projected-gradient steps; lanes that have
    not converged are finished with the More-Sorensen engine.  On TPU both
    phases are batched, so the hybrid costs one PG burst plus one (masked) MS
    solve.

    On single-device TPU f32 the fused MS kernel alone is faster than the PG
    burst it would skip (the hybrid exists to avoid expensive LAPACK
    factorizations on CPU, src/TVL2opt.cpp:190); both reach the same fixed
    point, so the hybrid routes straight to it — the same TPU method
    aliasing as tv1_batched.
    """
    y = jnp.asarray(y)
    if _ms_fused_ok(y):
        return tv2_ms(y, lam, cfg=cfg)
    B, _ = y.shape
    lamv = _lam_vec(lam, B, y.dtype)
    x_pg, info_pg = tv2_pg(y, lam, cfg=cfg, max_iters=cfg.mspg_pg_iters)
    yc = jnp.asarray(y)
    yc = yc - jnp.mean(yc, axis=-1, keepdims=True)
    scale = jnp.maximum(1.0, 0.5 * jnp.sum(yc ** 2, axis=-1))
    need_ms = info_pg.gap > jnp.maximum(
        cfg.stop, 10.0 * jnp.finfo(jnp.asarray(y).dtype).eps * scale)
    x_ms, info_ms = tv2_ms(y, lam, cfg=cfg)
    x = jnp.where(need_ms[:, None], x_ms, x_pg)
    iters = info_pg.iters + jnp.where(need_ms, info_ms.iters, 0)
    gap = jnp.where(need_ms, info_ms.gap, info_pg.gap)
    rc = jnp.where(need_ms, info_ms.rc, info_pg.rc)
    return x, make_info(iters, gap, rc)


def tv2_batched(y, lam, method: str = "mspg", cfg: TV2Config = DEFAULT_TV2):
    """Method dispatch mirroring the reference (prox_tv/__init__.py:257-309)."""
    method = method.lower()
    if method == "ms":
        return tv2_ms(y, lam, cfg=cfg)
    if method == "pg":
        return tv2_pg(y, lam, cfg=cfg)
    if method == "mspg":
        return tv2_mspg(y, lam, cfg=cfg)
    raise ValueError(f"Unknown TV-L2 method: {method!r}")
