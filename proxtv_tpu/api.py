"""User-facing API with the reference's function names, signatures and defaults.

Mirrors ``prox_tv/__init__.py`` of the reference, with the warts fixed:
info is returned on request (``return_info=True``), ``max_iters`` is honored in
``tvp_1d`` (the reference accepts but drops it, prox_tv/__init__.py:351), and
``tvgen`` uses the correct dispatch (the reference Python layer's operator-
precedence bug sends 2D problems to the wrong solver, prox_tv/__init__.py:585;
the MATLAB layer ``matlab/solveTVgen.cpp:90-97`` has the intended behavior,
which we follow).

Inputs are numpy-like arrays; outputs are numpy arrays (device-synchronized).
For jittable, batched, device-resident use, call the functional layer in
``proxtv_tpu.ops`` / ``proxtv_tpu.models`` directly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops import tv1d_l1
from .utils.config import TV1Config
from .utils.info import SolverInfo


def _as2d(x, dtype=None):
    """Coerce to a (1, n) float array (int inputs promoted — reference
    force_float_* semantics, prox_tv/__init__.py:80-121)."""
    a = jnp.asarray(x, dtype=dtype)
    if not jnp.issubdtype(a.dtype, jnp.floating):
        a = a.astype(jnp.result_type(jnp.float32, jnp.zeros(0).dtype))
    return a.reshape(1, -1)


def _native_ret(out):
    """Coerce a native-path (f64 numpy) result to the dtype/container the JAX
    path would produce, so ``backend='auto'`` does not change the public
    return contract with the environment (host compiler present or not)."""
    return np.asarray(out, dtype=jnp.zeros(0, jnp.result_type(float)).dtype)


def _ret(x2d, info, return_info):
    x = np.asarray(x2d[0])
    if return_info:
        return x, info
    return x


# ---------------------------------------------------------------------------
# 1D
# ---------------------------------------------------------------------------

_TV1_METHODS = {"classictautstring", "linearizedtautstring", "hybridtautstring",
                "pn", "condat", "dp", "condattautstring", "kolmogorov"}


# Methods served by the native host taut-string scan when backend='auto'.
# 'condat' is NOT among them: since round 4 it names the independent
# dual-variable segment-scan engine (ops.tv1d_l1.tv1_condat, reference
# src/condat_fast_tv.cpp:78), not a taut-string alias — an explicit
# method='condat' runs that algorithm.  'condattautstring' remains the
# taut-string variant (reference TV1D_denoise_tautstring, :133).
# 'classictautstring' is likewise NOT among them since round 5: it names
# the classic hull-merge engine (ops.tv1d_l1.tv1_classic_ts, reference
# src/TVL1opt_tautstring.cpp:256), and the host lib runs the LINEARIZED
# scan — an explicit classictautstring must run the named algorithm.
_TAUTSTRING_METHODS = {"linearizedtautstring", "hybridtautstring",
                       "condattautstring"}


def tv1_1d(x, w, method="auto", sigma=0.05, maxbacktracks=None,
           return_info=False, backend="auto"):
    """1D TV-L1 prox: min_y 0.5||x-y||^2 + w * sum |y_{i+1} - y_i|.

    Reference: prox_tv/__init__.py:124-216.  Methods: auto (default),
    classictautstring, linearizedtautstring, hybridtautstring (the
    reference's default), pn, condat, dp, condattautstring, kolmogorov.

    **Auto policy** (``method='auto'``): the solver is chosen for the
    platform — the native host taut string for a single short signal
    (microsecond latency; a short signal pays tens of ms of TPU dispatch
    latency for microseconds of compute), the device scan/Newton engines at
    moderate n, and for n > 16384 the TPU-resident chunked
    solve+glue+certify path (:func:`proxtv_tpu.ops.tv1d_long.tv1_long`,
    exact by duality-gap certificate).  With ``maxbacktracks`` set, auto
    honors the *intent* of the reference's hybrid backtrack bound
    (src/TVL1opt_hybridtautstring.cpp:56 switches to a worst-case-linear
    method) by routing to the message-passing engine whose worst case is
    O(n) with zero backtracks.

    An **explicit** method is honored faithfully at every size AND on every
    backend: the named engine runs (``strict=True`` reaches the device
    dispatcher, so TPU f32 does not re-route it to the fused Newton kernel)
    even when the auto policy would pick a faster route.  Note the lock-step
    scan/DP engines pay one sequential while-step per sample on
    accelerators, so an explicit scan method at n >> 16384 is orders of
    magnitude slower than ``method='auto'`` at an equal result (all engines
    share one exact fixed point).  ``maxbacktracks`` with an explicit
    taut-string method is a no-op bound: the batched scan engine never
    backtracks.

    ``backend='auto'`` routes single host signals with taut-string-family
    methods to the native C++ engine; ``backend='tpu'`` forces the device
    path.  Both backends return the same dtype (the JAX default float).
    """
    auto = method == "auto"
    if auto:
        method = "hybridtautstring"
    assert method in _TV1_METHODS, f"unknown method {method}"
    assert w >= 0
    if auto and maxbacktracks is not None and method in _TAUTSTRING_METHODS:
        method = "dp"
    n = int(np.asarray(x).size)
    # Native host engine: auto keeps it for the short-signal latency tail
    # only (above 16384 the documented auto policy is the TPU chunked path
    # below); an explicit taut-string method takes it at any size — it IS
    # the named algorithm, and the host scan beats a lock-step device scan.
    if (backend == "auto" and method in _TAUTSTRING_METHODS
            and not return_info and (not auto or n <= 16384)):
        from .runtime import native

        if native.available():
            out = native.tv1_host(np.asarray(x, dtype=float).ravel(), float(w))
            return _native_ret(out)
    if auto and n > 16384:  # auto is 'hybridtautstring' or 'dp' here
        # Long single signal: the lock-step scan engines pay one sequential
        # while-step per sample — route to the TPU-resident chunked
        # solve+glue+polish path (ops/tv1d_long.py), exact by certificate.
        from .ops import tv1d_long

        out, info = tv1d_long.tv1_long(_as2d(x)[0], float(w))
        return _ret(out[None], info, return_info)
    y = _as2d(x)
    if method == "pn":
        cfg = TV1Config(sigma=float(sigma))
        out, info = tv1d_l1.tv1_pn(y, float(w), cfg=cfg)
        return _ret(out, info, return_info)
    out = tv1d_l1.tv1_batched(y, float(w), method=method, strict=not auto)
    # Direct (non-iterative) engines: exact to working precision, no
    # iteration count — info is (0, 0, RC_OK) by construction.
    info = SolverInfo.single(0, 0.0, dtype=out.dtype) if return_info else None
    return _ret(out, info, return_info)


def tv1w_1d(x, w, method="auto", sigma=0.05, return_info=False,
            backend="auto"):
    """Weighted 1D TV-L1 prox: min_y 0.5||x-y||^2 + sum_i w_i |y_{i+1} - y_i|.

    Reference: prox_tv/__init__.py:218-254.  Methods: auto (default),
    tautstring (the reference's default), pn; we additionally expose 'dp'
    (message passing).  ``backend`` as in :func:`tv1_1d`.

    Auto policy: taut-string semantics, with n > 16384 routed to the chunked
    solve+glue+certify path.  An explicit method runs the named engine at
    every size (the lock-step scans pay one sequential while-step per sample
    on accelerators — see :func:`tv1_1d`).
    """
    auto = method == "auto"
    if auto:
        method = "tautstring"
    # Same native-host policy as tv1_1d: auto reserves it for the
    # short-signal latency tail; explicit 'tautstring' takes it at any size.
    if (backend == "auto" and method == "tautstring" and not return_info
            and (not auto or int(np.asarray(x).size) <= 16384)):
        from .runtime import native

        if native.available():
            wv = np.asarray(w, dtype=float).ravel()
            xv = np.asarray(x, dtype=float).ravel()
            assert wv.size == xv.size - 1 and (wv >= 0).all()
            return _native_ret(native.tv1w_host(xv, wv))
    y = _as2d(x)
    wv = jnp.asarray(np.asarray(w, dtype=np.asarray(y).dtype)).reshape(1, -1)
    assert wv.shape[-1] == y.shape[-1] - 1
    assert bool(jnp.all(wv >= 0))
    if auto and y.shape[-1] > 16384 and method in ("tautstring", "dp"):
        # Long single signal: chunked solve+glue+certificate (see tv1_1d);
        # tv1_long takes the per-edge weight vector directly.
        from .ops import tv1d_long

        out, info = tv1d_long.tv1_long(y[0], wv[0])
        return _ret(out[None], info, return_info)
    if method in ("tautstring", "dp"):
        engine = tv1d_l1.tv1_tautstring if method == "tautstring" else tv1d_l1.tv1_dp
        out = engine(y, wv)
        info = SolverInfo.single(0, 0.0, dtype=out.dtype) if return_info else None
        return _ret(out, info, return_info)
    if method == "pn":
        cfg = TV1Config(sigma=float(sigma))
        out, info = tv1d_l1.tv1_pn(y, wv, cfg=cfg)
        return _ret(out, info, return_info)
    raise ValueError(f"unknown method {method}")


def tv2_1d(x, w, method="mspg", return_info=False):
    """1D TV-L2 (grouped-norm) prox: min_y 0.5||x-y||^2 + w ||Dy||_2.

    Reference: prox_tv/__init__.py:257-309.  Methods: ms, pg, mspg (default).
    """
    assert w >= 0
    from .ops import tv1d_l2
    y = _as2d(x)
    out, info = tv1d_l2.tv2_batched(y, float(w), method=method)
    return _ret(out, info, return_info)


def tvp_1d(x, w, p, method="gpfw", max_iters=0, return_info=False):
    """1D TV-Lp prox: min_y 0.5||x-y||^2 + w ||Dy||_p.

    Reference: prox_tv/__init__.py:311-352.  Methods: gp, fw, gpfw (default),
    plus ogp and fista (implemented in the reference C layer but not exposed by
    its Python layer).  Unlike the reference, ``max_iters`` is honored.
    """
    assert w >= 0 and p >= 1
    from .ops import tv1d_lp
    y = _as2d(x)
    out, info = tv1d_lp.tvp_batched(y, float(w), float(p), method=method,
                                    max_iters=int(max_iters))
    return _ret(out, info, return_info)


# ---------------------------------------------------------------------------
# 2D / ND (filled by models layer)
# ---------------------------------------------------------------------------


def tv1_2d(x, w, n_threads=1, max_iters=0, method="auto", return_info=False):
    """2D anisotropic TV-L1 prox (reference prox_tv/__init__.py:355-443).

    Methods: auto (default — the fastest engine for the backend: the fused
    accelerated primal-dual on TPU, Douglas-Rachford elsewhere; all methods
    agree within the reference's 1e-3 contract), dr (the reference default),
    pd, yang, condat, chambolle-pock, chambolle-pock-acc, kolmogorov.
    ``n_threads`` is accepted for API compatibility; parallelism on TPU comes
    from batched fibers and the device mesh instead of OpenMP threads.
    """
    import jax

    from .models import tv2d

    y = jnp.asarray(np.asarray(x, dtype=float))[None, ...]
    if method == "auto":
        method = ("chambolle-pock-acc"
                  if jax.default_backend() == "tpu" and y.dtype == jnp.float32
                  else "dr")
    out, info = tv2d.tv1_2d_batched(y, float(w), method=method,
                                    max_iters=int(max_iters))
    return _ret(out, info, return_info)


def tv1w_2d(x, w_col, w_row, max_iters=0, n_threads=1, return_info=False):
    """Weighted 2D TV-L1 prox via Douglas-Rachford (reference :445-481)."""
    from .models import tv2d

    X = np.asarray(x, dtype=float)
    M, N = X.shape
    w_col = np.asarray(w_col, dtype=float)
    w_row = np.asarray(w_row, dtype=float)
    assert w_col.shape == (M - 1, N)
    assert w_row.shape == (M, N - 1)
    assert (w_col >= 0).all() and (w_row >= 0).all()
    out, info = tv2d.tv1w_2d_batched(jnp.asarray(X)[None], jnp.asarray(w_col)[None],
                                     jnp.asarray(w_row)[None], max_iters=int(max_iters))
    return _ret(out, info, return_info)


def tvp_2d(x, w_col, w_row, p_col, p_row, n_threads=1, max_iters=0,
           return_info=False):
    """2D general-norm TV prox via Douglas-Rachford (reference :484-530)."""
    from .models import tv2d

    assert w_col >= 0 and w_row >= 0 and p_col >= 1 and p_row >= 1
    y = jnp.asarray(np.asarray(x, dtype=float))[None, ...]
    out, info = tv2d.tvp_2d_batched(y, float(w_col), float(w_row), float(p_col),
                                    float(p_row), max_iters=int(max_iters))
    return _ret(out, info, return_info)


def tvgen(x, ws, ds, ps, n_threads=1, max_iters=0, return_info=False):
    """Generalized multidimensional TV prox (reference :533-600).

    Dispatch follows the intended (MATLAB) rule: a 2D signal penalized on both
    dims goes to Douglas-Rachford; two arbitrary terms go to Proximal Dykstra;
    more terms go to Parallel Proximal Dykstra.
    """
    from .models import tvnd

    X = jnp.asarray(np.asarray(x, dtype=float))
    ws = [float(v) for v in ws]
    ds = [int(v) for v in ds]
    ps = [float(v) for v in ps]
    assert len(ws) == len(ds) == len(ps)
    out, info = tvnd.tvgen_dispatch(X, ws, ds, ps, max_iters=int(max_iters))
    if return_info:
        return np.asarray(out), info
    return np.asarray(out)


def tvgen_nd(x, ws, ds, ps, max_iters=0, method="pd", return_info=False):
    """ND combiner with explicit method choice: 'pd' (Parallel Proximal Dykstra)
    or 'pdr' (Parallel Douglas-Rachford, reference src/TVNDopt.cpp:280)."""
    from .models import tvnd

    X = jnp.asarray(np.asarray(x, dtype=float))
    out, info = tvnd.tv_nd_batched(X[None], tuple(float(v) for v in ws),
                                   tuple(int(v) for v in ds),
                                   tuple(float(v) for v in ps),
                                   max_iters=int(max_iters), method=method)
    if return_info:
        return np.asarray(out[0]), info
    return np.asarray(out[0])


def tv(y, lam, p=1.0, threads=1, max_iters=0, return_info=False):
    """Polymorphic TV prox front end — dispatch on the *type* of ``lam``
    (reference ``matlab/TV.m:22-84``, the MATLAB layer's convenience entry):

    *   ``lam`` a pair (list/tuple of two weight matrices) → weighted 2D TV
        via :func:`tv1w_2d` (TV.m:30-48 cell-array branch; ``lam[0]`` weights
        column edges with shape (M-1, N), ``lam[1]`` row edges (M, N-1)).
        Requires 2D ``y`` and p = 1, as in the reference.
    *   ``lam`` a weight vector of length ``len(y) - 1`` → weighted 1D TV via
        the taut-string engine (:func:`tv1w_1d`; TV.m:51-68).  Requires 1D
        ``y`` and p = 1.
    *   scalar ``lam``, 1D ``y`` → the 1D dispatcher (reference ``TV()``,
        src/TVgenopt.cpp:30-57): p = 1 → hybrid taut string, p = 2 → TV-L2
        mspg, else → TV-Lp gpfw.
    *   scalar ``lam``, ND ``y`` → :func:`tvgen` with ``lam``/``p`` replicated
        over every dimension (TV.m:79-80).

    ``threads`` is accepted for API compatibility (parallelism comes from
    batched fibers / the device mesh).  ``max_iters`` reaches the combiner
    algorithms (the MATLAB ``mit`` argument); 0 keeps each algorithm's
    default.
    """
    # Cell-array-of-weights branch (TV.m:30-48): a pair of weight matrices.
    if isinstance(lam, (list, tuple)):
        if np.asarray(y).ndim != len(lam):
            raise ValueError(
                "for an N-dimensional signal the weights must be provided "
                "as a sequence of length N (reference TV.m:33)")
        if len(lam) != 2:
            raise ValueError("only 1D and 2D weighted filtering is supported "
                             "(reference TV.m:37)")
        if p != 1:
            raise ValueError("only the L1 norm is accepted for weighted TV "
                             "(reference TV.m:41)")
        return tv1w_2d(y, lam[0], lam[1], max_iters=max_iters,
                       n_threads=threads, return_info=return_info)

    lam_arr = np.asarray(lam, dtype=float)
    # Weight-vector branch (TV.m:51-68).
    if lam_arr.size > 1:
        yv = np.asarray(y)
        if yv.ndim != 1:
            raise ValueError("only 1-dimensional signals are accepted for "
                             "vector-weighted TV (reference TV.m:58)")
        if lam_arr.size != yv.size - 1:
            raise ValueError(
                "lam should be a scalar or a weight vector with "
                "len(lam) == len(y) - 1 (reference TV.m:54)")
        if p != 1:
            raise ValueError("only the L1 norm is accepted for weighted TV "
                             "(reference TV.m:62)")
        return tv1w_1d(y, lam_arr, return_info=return_info)

    w = float(lam_arr)
    yv = np.asarray(y)
    if yv.ndim == 1:
        # 1D dispatcher (reference TV(), src/TVgenopt.cpp:30-57).
        if p == 1:
            return tv1_1d(yv, w, return_info=return_info)
        if p == 2:
            return tv2_1d(yv, w, return_info=return_info)
        return tvp_1d(yv, w, float(p), max_iters=max_iters,
                      return_info=return_info)
    # ND: lam/p replicated per dimension (TV.m:79-80).
    nd = yv.ndim
    return tvgen(yv, [w] * nd, list(range(1, nd + 1)), [float(p)] * nd,
                 n_threads=threads, max_iters=max_iters,
                 return_info=return_info)


def tv_value(x, ws, ds, ps):
    """Value of the generalized TV penalty (reference TVval, src/TVNDopt.cpp:524)."""
    from .models import tvnd

    X = jnp.asarray(np.asarray(x, dtype=float))
    return float(tvnd.tv_value(X, [float(v) for v in ws], [int(v) for v in ds],
                               [float(v) for v in ps]))
