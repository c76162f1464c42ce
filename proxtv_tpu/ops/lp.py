"""Lp-norm primitives: ball projections, proxes, and the linear oracle (TPU-native).

Covers the capability set of reference ``src/LPopt.cpp`` (C11 in SURVEY.md):
``LPnorm`` (:mod:`proxtv_tpu.utils.lpnorms`), ``PN_LP1``/``PN_LP2``/``PN_LPinf``/
``PN_LPp`` (norm proxes), ``LP1_project``/``LPp_project`` (ball projections) and
``solveLinearLP`` (the Frank-Wolfe linear oracle).

The TPU design inverts the reference's structure.  The reference computes the
general-p *prox* with a delicate projected-Newton iteration (diag+rank-1
Hessian, MNSG fallback, Armijo interpolation — ``src/LPopt.cpp:212-746``) and
derives ball *projection* from it via Moreau (``src/LPopt.cpp:888``).  Here the
primitive is the ball projection, computed by a doubly-nested **monotone
root-find on the KKT system** — every step a full-width vector op, no
gather/scatter, unconditionally convergent for all p in (1, inf):

    proj onto {||x||_p <= R}:  |x_i| + mu * p * |x_i|^{p-1} = |y_i|,
    with the scalar mu >= 0 chosen so ||x||_p = R  (safeguarded bisection over
    mu; safeguarded Newton in each coordinate, batched).

The general prox then falls out of Moreau:  prox_{t||.||_p}(y) = y -
proj_{||.||_q <= t}(y), q = p/(p-1).  Degenerate regimes follow the reference's
clamping (``src/LPopt.h:33-36``): p <= 1.002 -> L1, p >= 100 -> Linf.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.lpnorms import P_LARGE, P_SMALL, lp_norm

_BRACKET_STEPS = 60


def _bisect_steps(dtype):
    """(outer_bisect, outer_newton, inner_bisect, inner_newton) iteration
    depths.  Bisection localizes the bracket; safeguarded Newton then
    converges quadratically — far fewer monotone-KKT evaluations than pure
    bisection at equal accuracy."""
    if dtype == jnp.float32:
        return 10, 6, 12, 5
    return 16, 8, 18, 7


def dual_p(p: float) -> float:
    """Holder conjugate exponent q = p/(p-1), with the inf/1 limits."""
    if p <= P_SMALL:
        return float("inf")
    if p >= P_LARGE:
        return 1.0
    return p / (p - 1.0)


# ---------------------------------------------------------------------------
# Closed-form special cases
# ---------------------------------------------------------------------------


def linf_ball_project(y, R):
    """Projection onto {||x||_inf <= R}: elementwise clip."""
    R = jnp.asarray(R, y.dtype)
    Rb = R[..., None] if R.ndim == y.ndim - 1 else R
    return jnp.clip(y, -Rb, Rb)


def l2_ball_project(y, R):
    """Radial shrink onto {||x||_2 <= R} (reference PN_LP2 via Moreau)."""
    R = jnp.asarray(R, y.dtype)
    nrm = jnp.linalg.norm(y, axis=-1)
    scale = jnp.where(nrm > R, R / jnp.maximum(nrm, 1e-300), 1.0)
    return y * scale[..., None]


def l1_ball_project(y, R):
    """Sort-based projection onto {||x||_1 <= R} (Duchi et al.; reference
    ``LP1_project``, src/LPopt.cpp:804), batched on the last axis."""
    R = jnp.broadcast_to(jnp.asarray(R, y.dtype), y.shape[:-1])
    a = jnp.abs(y)
    inside = jnp.sum(a, axis=-1) <= R
    s = jnp.sort(a, axis=-1)[..., ::-1]
    cs = jnp.cumsum(s, axis=-1)
    k = jnp.arange(1, y.shape[-1] + 1, dtype=y.dtype)
    cand = (cs - R[..., None]) / k
    ok = s - cand > 0
    # Largest k with s_k > theta_k.  rho >= 1 holds for R > 0; at R == 0 no
    # candidate passes and the -1 would wrap to the last element — clamp to 0,
    # where theta = max|y| shrinks everything to the (correct) zero vector.
    rho = jnp.maximum(jnp.sum(ok, axis=-1) - 1, 0)
    theta = jnp.take_along_axis(cand, rho[..., None], axis=-1)
    theta = jnp.maximum(theta, 0.0)
    x = jnp.sign(y) * jnp.maximum(a - theta, 0.0)
    return jnp.where(inside[..., None], y, x)


def soft_threshold(y, t):
    """Prox of t||.||_1 (reference PN_LP1, src/LPopt.cpp:95)."""
    t = jnp.asarray(t, y.dtype)
    tb = t[..., None] if t.ndim == y.ndim - 1 else t
    return jnp.sign(y) * jnp.maximum(jnp.abs(y) - tb, 0.0)


# ---------------------------------------------------------------------------
# General-p ball projection: monotone KKT root-find
# ---------------------------------------------------------------------------


def _coord_root(a, mu, p, bisect_steps, newton_steps):
    """Solve s + mu*p*s^(p-1) = a for s in [0, a], elementwise (a >= 0, mu >= 0).

    Bracketed bisection to localize (f is strictly increasing with
    f(0) <= 0 <= f(a) — pure Newton's derivative blows up at s -> 0 for
    p < 2, the regime where the reference needs its MNSG fallback,
    src/LPopt.cpp:451-459), then safeguarded Newton inside the bracket.
    Every step is a full-width vector op.
    """

    def f(s):
        return s + mu * p * s ** (p - 1.0) - a

    def bis(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        pos = f(mid) > 0
        return jnp.where(pos, lo, mid), jnp.where(pos, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, bisect_steps, bis, (jnp.zeros_like(a), a))

    def newt(_, state):
        lo, hi, s = state
        fv = f(s)
        fp = 1.0 + mu * p * (p - 1.0) * s ** (p - 2.0)
        s_new = s - fv / fp
        # Safeguard: fall back to the bracket midpoint when Newton escapes.
        bad = ~((s_new > lo) & (s_new < hi)) | ~jnp.isfinite(s_new)
        s_new = jnp.where(bad, 0.5 * (lo + hi), s_new)
        pos = f(s_new) > 0
        lo = jnp.where(pos, lo, s_new)
        hi = jnp.where(pos, s_new, hi)
        return lo, hi, s_new

    lo, hi, s = jax.lax.fori_loop(
        0, newton_steps, newt, (lo, hi, 0.5 * (lo + hi)))
    return 0.5 * (lo + hi)


def _joint_kkt_newton(an, Rn, T, p: float, mu_init, iters: int):
    """Joint primal-dual Newton on the full projection KKT system

        s_i + mu * p * s_i^{p-1} = an_i   (i = 1..n),    sum_i s_i^p = T,

    for normalized data ``an`` (row-max 1) strictly outside the ball.  The
    Jacobian is diagonal-plus-border, so each Newton step is closed form:

        ds_i = -(F_i + r_i dmu) / d_i,
        dmu  = (G - sum r F / d) / sum r^2 / d,       r_i = p s_i^{p-1},
        d_i  = 1 + mu p (p-1) s_i^{p-2}.

    ~4 pow evaluations per step and quadratic convergence replace the
    nested bracket/bisect/Newton's ~300 evaluations (src/LPopt.cpp:212's
    PN_LPp is the same idea in prox form; this is the projection form with
    the radial-init safeguard instead of the MNSG fallback).  Returns
    (s, mu, max|F|, |G|) for the caller's acceptance test.
    """
    pos = an > 0
    nrm = jnp.sum(an ** p, axis=-1) ** (1.0 / p)
    fac0 = Rn / jnp.maximum(nrm, 1e-300)
    s0 = an * fac0[..., None]
    if mu_init is None:
        # mu consistent with the largest coordinate (an = 1 there):
        # 1 - fac0 = mu p fac0^{p-1}.
        mu = (1.0 - fac0) / jnp.maximum(p * fac0 ** (p - 1.0), 1e-300)
    else:
        mu = jnp.maximum(jnp.asarray(mu_init, an.dtype), 1e-30)

    if p >= 2.0:
        def body(_, state):
            s, mu = state
            sp1 = s ** (p - 1.0)
            F = s + mu[..., None] * p * sp1 - an
            G = jnp.sum(s * sp1, axis=-1) - T
            d = 1.0 + mu[..., None] * p * (p - 1.0) * s ** (p - 2.0)
            r = p * sp1
            rod = r / d
            A = jnp.sum(rod * F, axis=-1)
            Bq = jnp.sum(rod * r, axis=-1)
            dmu = (G - A) / jnp.maximum(Bq, 1e-300)
            mu_new = jnp.maximum(mu + dmu, 0.0)
            ds = -(F + r * dmu[..., None]) / d
            # Keep s in (0, an]: s = 0 with an > 0 would pin the coordinate;
            # the true solution has s > 0 there.
            s_new = jnp.clip(s + ds, 1e-20, an)
            s_new = jnp.where(pos, s_new, 0.0)
            return s_new, mu_new

        s, mu = jax.lax.fori_loop(0, iters, body, (s0, mu))
    else:
        # p < 2: iterate in u = s^{p-1}.  In s-space the Jacobian term
        # s^{p-2} blows up at s -> 0 (the stiffness that forces the
        # reference's MNSG fallback); in u-space F = u^rr + mu p u - an with
        # rr = 1/(p-1) > 1, whose derivative rr u^{rr-1} + mu p is bounded
        # and positive at u -> 0.
        rr = 1.0 / (p - 1.0)

        def body_u(_, state):
            u, mu = state
            F = u ** rr + mu[..., None] * p * u - an
            G = jnp.sum(u ** (rr * p), axis=-1) - T
            d = rr * u ** (rr - 1.0) + mu[..., None] * p
            g = (rr * p) * u ** (rr * p - 1.0)
            pu = p * u
            A = jnp.sum(g * F / d, axis=-1)
            Bq = jnp.sum(g * pu / d, axis=-1)
            dmu = (G - A) / jnp.maximum(Bq, 1e-300)
            mu_new = jnp.maximum(mu + dmu, 0.0)
            du = -(F + pu * dmu[..., None]) / d
            u_new = jnp.clip(u + du, 1e-30, an ** (p - 1.0))
            u_new = jnp.where(pos, u_new, 0.0)
            return u_new, mu_new

        u, mu = jax.lax.fori_loop(0, iters, body_u,
                                  (s0 ** (p - 1.0), mu))
        s = u ** rr

    sp1 = s ** (p - 1.0)
    F = jnp.where(pos, s + mu[..., None] * p * sp1 - an, 0.0)
    G = jnp.sum(s * sp1, axis=-1) - T
    return s, mu, jnp.max(jnp.abs(F), axis=-1), jnp.abs(G)


@functools.partial(jax.jit, static_argnames=("p",))
def _lp_ball_project_general(y, R, p: float, mu0=None):
    """Projection onto {||x||_p <= R} for p in (1.002, 100), batched.

    Fast path: :func:`_joint_kkt_newton` (quadratic, ~10x fewer pow
    evaluations), gated to the p range where fuzzing shows every lane
    converges — [1.05, 3.6] in f64, [1.12, 3.1] in f32 (outside, the
    Newton dmu overflows for large p — the same regime where the
    reference's GPFW abandons FW, src/TVLPopt.cpp:1144 — and f32 runs out
    of precision near p = 1).  Lanes whose KKT residuals fail the
    acceptance test still fall back to the unconditionally-convergent
    nested root-find (:func:`_lp_ball_project_nested`) behind one scalar
    branch, so the gate only avoids wasted work, never correctness.
    """
    y = jnp.asarray(y)
    lo, hi = (1.05, 3.6) if y.dtype == jnp.float64 else (1.12, 3.1)
    if not (lo <= p <= hi):
        return _lp_ball_project_nested(y, R, p, mu0)
    a = jnp.abs(y)
    R = jnp.broadcast_to(jnp.asarray(R, y.dtype), y.shape[:-1])
    nrm = lp_norm(a, p)
    inside = nrm <= R
    pos_R = R > 0

    scale = jnp.maximum(jnp.max(a, axis=-1), 1e-300)
    an = a / scale[..., None]
    Rn = R / scale
    T = Rn ** p

    iters = 8 if y.dtype == jnp.float32 else 14
    s, mu, Fres, Gres = _joint_kkt_newton(an, Rn, T, p, mu0, iters)
    eps = jnp.finfo(y.dtype).eps
    ok = ((Fres <= 64.0 * eps) & (Gres <= 64.0 * eps * jnp.maximum(T, 1.0))
          | inside | ~pos_R)

    fac = jnp.minimum(1.0, Rn / jnp.maximum(
        jnp.sum(s ** p, axis=-1) ** (1.0 / p), 1e-300))
    x_joint = jnp.sign(y) * s * (fac * scale)[..., None]
    x_joint = jnp.where(pos_R[..., None], x_joint, jnp.zeros_like(x_joint))
    x_joint = jnp.where(inside[..., None], y, x_joint)

    def fallback(_):
        # Per-lane merge (VERDICT r2 item 4): lanes whose joint KKT
        # residuals passed keep the quadratically-converged joint result;
        # only the rejected lanes take the nested root-find's answer (the
        # nested solve is lock-step full-width vector work either way, but
        # the joint pass's result is no longer discarded for good lanes).
        x_n, mu_n = _lp_ball_project_nested(y, R, p, mu0)
        return (jnp.where(ok[..., None], x_joint, x_n),
                jnp.where(ok, mu, mu_n))

    def accept(_):
        return x_joint, mu

    return jax.lax.cond(jnp.all(ok), accept, fallback, None)


def _lp_ball_project_nested(y, R, p: float, mu0=None):
    """Nested monotone root-find projection onto {||x||_p <= R} —
    unconditionally convergent; the joint-Newton fast path's fallback.

    Outer safeguarded root-find on the KKT multiplier mu (G(mu) =
    ||x(mu)||_p^p - R^p is strictly decreasing); inner per-coordinate Newton
    (:func:`_coord_root`).  ``mu0``: optional warm start for mu (the TPU
    analog of the reference's Workspace warm restart) — the bracket barely
    moves between outer GP iterations, so a warm start replaces the
    ~30-evaluation cold bracket+bisect phase with a couple of expansion
    checks plus safeguarded Newton.

    Returns ``(x, mu)`` so iterative callers can thread the multiplier.
    """
    a = jnp.abs(y)
    R = jnp.broadcast_to(jnp.asarray(R, y.dtype), y.shape[:-1])
    nrm = lp_norm(a, p)
    inside = nrm <= R
    pos_R = R > 0

    # Work in a normalized scale to keep powers tame: divide by max|y|.
    scale = jnp.maximum(jnp.max(a, axis=-1), 1e-300)
    an = a / scale[..., None]
    Rn = R / scale
    T = Rn ** p

    ob, on, ib, inw = _bisect_steps(y.dtype)

    def norm_pp(mu):
        s = _coord_root(an, mu[..., None], p, ib, inw)
        return jnp.sum(s ** p, axis=-1), s

    # Safeguarded Newton on G(mu) = sum s(mu)^p - R^p inside a bracket.
    # ds/dmu = -p*s / (s^(2-p) + mu*p*(p-1)) (algebraic form stable at s -> 0).
    def newton_body(_, state):
        lo, hi, mu = state
        g, s = norm_pp(mu)
        mub = mu[..., None]
        dsd = -p * s / (s ** (2.0 - p) + mub * p * (p - 1.0) + 1e-300)
        dG = jnp.sum(p * s ** (p - 1.0) * dsd, axis=-1)
        mu_new = mu - (g - T) / jnp.minimum(dG, -1e-300)
        bad = ~((mu_new > lo) & (mu_new < hi)) | ~jnp.isfinite(mu_new)
        mu_new = jnp.where(bad, 0.5 * (lo + hi), mu_new)
        g2, _ = norm_pp(mu_new)
        too_big = g2 > T
        lo = jnp.where(too_big, mu_new, lo)
        hi = jnp.where(too_big, hi, mu_new)
        return lo, hi, mu_new

    if mu0 is None:
        # Cold start: bracket by doubling, bisect, then Newton.
        def bracket_body(_, state):
            hi, done = state
            g, _ = norm_pp(hi)
            need = ~done & (g > T)
            hi = jnp.where(need, hi * 4.0, hi)
            done = done | ~need
            return hi, done

        hi0 = jnp.ones_like(Rn)
        hi, _ = jax.lax.fori_loop(0, _BRACKET_STEPS // 2, bracket_body,
                                  (hi0, jnp.zeros(Rn.shape, bool)))
        lo = jnp.zeros_like(hi)

        def bisect_body(_, state):
            lo, hi = state
            mid = 0.5 * (lo + hi)
            g, _ = norm_pp(mid)
            too_big = g > T
            lo = jnp.where(too_big, mid, lo)
            hi = jnp.where(too_big, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, ob, bisect_body, (lo, hi))
        lo, hi, mu = jax.lax.fori_loop(
            0, -(-on // 2), newton_body, (lo, hi, 0.5 * (lo + hi)))
    else:
        # Warm start: G(0) >= T always holds outside the ball, so lo = 0 is a
        # valid lower end; the upper end is adapted both ways around mu0
        # (expand while infeasible, shrink while a 16x smaller hi is still
        # feasible — keeps the bracket tight when mu0 overshoots).
        mu_w = jnp.maximum(jnp.asarray(mu0, y.dtype), 1e-30)
        hi = 2.0 * mu_w

        def exp_body(_, hi):
            g, _ = norm_pp(hi)
            return jnp.where(g > T, hi * 16.0, hi)

        hi = jax.lax.fori_loop(0, 3, exp_body, hi)

        def shrink_body(_, hi):
            g, _ = norm_pp(hi * 0.0625)
            return jnp.where(g <= T, hi * 0.0625, hi)

        hi = jax.lax.fori_loop(0, 3, shrink_body, hi)
        lo = jnp.zeros_like(hi)
        lo, hi, mu = jax.lax.fori_loop(
            0, on, newton_body, (lo, hi, jnp.clip(mu_w, lo, hi)))

    # Evaluate at the Newton iterate and clamp radially to exact feasibility:
    # with mu near the root the radial correction is second-order small, and
    # the returned point always satisfies ||x||_p <= R.
    g_fin, s = norm_pp(mu)
    fac = jnp.minimum(1.0, Rn / jnp.maximum(g_fin ** (1.0 / p), 1e-300))
    x = jnp.sign(y) * s * (fac * scale)[..., None]
    x = jnp.where(pos_R[..., None], x, jnp.zeros_like(x))
    return jnp.where(inside[..., None], y, x), mu


def lp_ball_project(y, R, p: float):
    """Projection onto {||x||_p <= R} with the reference's p-clamping
    (reference LPp_project, src/LPopt.cpp:888; p regimes src/LPopt.h:33-36)."""
    if p <= P_SMALL:
        return l1_ball_project(y, R)
    if p >= P_LARGE:
        return linf_ball_project(y, R)
    if p == 2.0:
        return l2_ball_project(y, R)
    return _lp_ball_project_general(y, R, p)[0]


def lp_ball_project_ws(y, R, p: float, mu0):
    """Warm-started projection: returns (x, mu) threading the KKT multiplier
    across calls.  Closed-form regimes pass mu through untouched."""
    if p <= P_SMALL:
        return l1_ball_project(y, R), mu0
    if p >= P_LARGE:
        return linf_ball_project(y, R), mu0
    if p == 2.0:
        return l2_ball_project(y, R), mu0
    return _lp_ball_project_general(y, R, p, mu0)


def lp_prox(y, t, p: float):
    """Prox of t*||.||_p via Moreau: y - proj_{||.||_q <= t}(y), q = p/(p-1)
    (reference PN_LPp, src/LPopt.cpp:212, structure inverted — see module doc)."""
    if p <= P_SMALL:
        return soft_threshold(y, t)
    if p >= P_LARGE:
        # prox of t*||.||_inf = y - proj onto L1 ball of radius t.
        return y - l1_ball_project(y, t)
    if p == 2.0:
        return y - l2_ball_project(y, t)
    return y - lp_ball_project(y, t, dual_p(p))


def solve_linear_lp(g, R, p: float):
    """Linear oracle: argmin_{||s||_p <= R} s'g (reference solveLinearLP,
    src/LPopt.cpp:1000).  Closed form via Holder equality: the minimizer is
    -R * sign(g) |g|^{q-1} / ||g||_q^{q-1} with q = p/(p-1); for p = 1 a signed
    vertex at the max-|g| coordinate; for p = inf the sign vector."""
    R = jnp.broadcast_to(jnp.asarray(R, g.dtype), g.shape[:-1])[..., None]
    if p <= P_SMALL:
        idx = jnp.argmax(jnp.abs(g), axis=-1, keepdims=True)
        val = jnp.take_along_axis(g, idx, axis=-1)
        s = jnp.zeros_like(g)
        onehot = jnp.arange(g.shape[-1]) == idx
        return jnp.where(onehot, -R * jnp.sign(val), s)
    if p >= P_LARGE:
        return -R * jnp.sign(g)
    q = dual_p(p)
    ag = jnp.abs(g)
    mx = jnp.maximum(jnp.max(ag, axis=-1, keepdims=True), 1e-300)
    r = ag / mx
    num = r ** (q - 1.0)
    den = jnp.maximum(jnp.sum(r ** q, axis=-1, keepdims=True) ** ((q - 1.0) / q), 1e-300)
    return -R * jnp.sign(g) * num / den
