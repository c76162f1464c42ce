"""Tests for the fused 3D PDHG engine (ops/kernels/pdhg3d_fused.py +
models/tvnd._run_pdhg3d_fused), run in Pallas interpret mode on CPU."""
import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental import pallas as pl

from proxtv_tpu.models import tvnd
from proxtv_tpu.utils.config import DEFAULT_COMBINER as CFG


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def _pdhg3d_numpy(Y, lams, sigma, tau, iters, variant):
    """Independent per-volume 3D PDHG reference; returns xhat = Y - D'u.
    lams = (lam_L, lam_M, lam_N)."""
    lam_L, lam_M, lam_N = lams
    x = Y.copy()
    xb = Y.copy()
    u1 = np.zeros(Y.shape[:-1] + (Y.shape[-1] - 1,), np.float32)  # N edges
    u2 = np.zeros((Y.shape[0], Y.shape[1] - 1, Y.shape[2]), np.float32)
    u3 = np.zeros((Y.shape[0] - 1,) + Y.shape[1:], np.float32)    # L edges

    def div(u1, u2, u3):
        d = np.zeros_like(Y)
        d[..., :-1] += u1
        d[..., 1:] -= u1
        d[:, :-1, :] += u2
        d[:, 1:, :] -= u2
        d[:-1] += u3
        d[1:] -= u3
        return d

    for _ in range(iters):
        u1 = np.clip(u1 + sigma * (xb[..., :-1] - xb[..., 1:]), -lam_N, lam_N)
        u2 = np.clip(u2 + sigma * (xb[:, :-1, :] - xb[:, 1:, :]),
                     -lam_M, lam_M)
        u3 = np.clip(u3 + sigma * (xb[:-1] - xb[1:]), -lam_L, lam_L)
        dv = div(u1, u2, u3)
        if variant == "condat":
            xn = x - tau * ((x - Y) + dv)
        else:
            xn = (x - tau * dv + tau * Y) / (1.0 + tau)
        xb = 2.0 * xn - x
        x = xn
    return Y - div(u1, u2, u3)


def test_pdhg3d_fused_matches_numpy_trajectory(rng):
    B, L, M, N = 2, 5, 12, 9
    Y = rng.randn(B, L, M, N).astype(np.float32)
    sigma = np.float32(CFG.cp_sigma)
    tau = np.float32(0.9 / (12.0 * sigma))
    lams = (0.35, 0.4, 0.3)  # (lam_L, lam_M, lam_N)
    for variant in ["cp", "condat"]:
        x_fus, _ = tvnd._run_pdhg3d_fused(jnp.asarray(Y), lams, 48, CFG,
                                          variant, gap_tol=0.0)
        for b in range(B):
            x_ref = _pdhg3d_numpy(Y[b], lams, sigma, tau, 48, variant)
            np.testing.assert_allclose(np.asarray(x_fus)[b], x_ref,
                                       atol=5e-5, err_msg=variant)


def test_pdhg3d_fused_accelerated_converges(rng):
    """cp-acc fused 3D run matches the exact Parallel-Dykstra solution within
    the certificate-implied tolerance."""
    Y = rng.randn(1, 4, 10, 9).astype(np.float32)
    x_acc, info = tvnd._run_pdhg3d_fused(jnp.asarray(Y), (0.3, 0.3, 0.3),
                                         4000, CFG, "cp-acc", gap_tol=1e-7)
    x_pd, _ = tvnd.tv_nd_batched(jnp.asarray(np.asarray(Y, np.float64)),
                                 (0.3, 0.3, 0.3), (1, 2, 3), (1.0, 1.0, 1.0),
                                 max_iters=600, method="pd")
    assert np.all(np.asarray(info.gap) >= 0)
    np.testing.assert_allclose(np.asarray(x_acc), np.asarray(x_pd), atol=2e-3)


def test_pdhg3d_zero_lam_identity(rng):
    Y = rng.randn(1, 3, 9, 9).astype(np.float32)
    x, info = tvnd._run_pdhg3d_fused(jnp.asarray(Y), (0.0, 0.0, 0.0), 100,
                                     CFG, "cp-acc")
    np.testing.assert_allclose(np.asarray(x), Y, atol=1e-7)
    assert np.all(np.asarray(info.rc) == 0)


def test_pdhg3d_schedule_override_matches_auto(rng):
    """Passing schedule_override equal to the auto-tuned (sigma0, cap_mult)
    must reproduce the cp-acc path exactly (ADVICE r2: the override parameter
    needs coverage so regressions in it are caught)."""
    from proxtv_tpu.models.tv2d import _pdhg_sigma_schedule

    Y = jnp.asarray(rng.randn(1, 4, 9, 9).astype(np.float32))
    lams = (0.3, 0.4, 0.35)
    lam_eff = jnp.asarray(max(lams), jnp.float32)
    sigma0, cap_mult = _pdhg_sigma_schedule(Y, lam_eff, jnp.float32)
    x_auto, info_auto = tvnd._run_pdhg3d_fused(Y, lams, 96, CFG, "cp-acc",
                                               gap_tol=0.0)
    x_over, info_over = tvnd._run_pdhg3d_fused(
        Y, lams, 96, CFG, "cp-acc", gap_tol=0.0,
        schedule_override=(sigma0, cap_mult))
    np.testing.assert_array_equal(np.asarray(x_auto), np.asarray(x_over))
    np.testing.assert_array_equal(np.asarray(info_auto.iters),
                                  np.asarray(info_over.iters))


def test_pdhg3d_method_validation(rng):
    Y = jnp.asarray(rng.randn(1, 3, 4, 5))  # f64 on CPU -> not fused-capable
    with pytest.raises(ValueError):
        tvnd.tv_nd_batched(Y, (0.3, 0.3, 0.3), (1, 2, 3), (1.0, 1.0, 1.0),
                           method="chambolle-pock-acc")


def test_pdhg3d_lane_orientation(rng):
    """A volume whose best lane axis is not last solves via the rotated
    orientation; result must match solving the pre-rotated volume directly
    and respect per-axis penalties (anisotropic lams permute along)."""
    from proxtv_tpu.models.tvnd import _run_pdhg3d_fused

    B, L, M, N = 1, 8, 96, 16        # lane 16 pads to 128: M is far better
    V = jnp.asarray(rng.randn(B, L, M, N).astype(np.float32))
    lams = (0.2, 0.35, 0.3)          # distinct per-axis penalties
    x, info = _run_pdhg3d_fused(V, lams, cap=48, cfg=CFG, variant="cp-acc")
    assert x.shape == (B, L, M, N)
    # direct solve of the pre-rotated problem (M as lane): axes (B, L, N, M),
    # lams (lam_L, lam_N, lam_M)
    x_dir, _ = _run_pdhg3d_fused(jnp.transpose(V, (0, 1, 3, 2)),
                                 (0.2, 0.3, 0.35), cap=48, cfg=CFG,
                                 variant="cp-acc")
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(jnp.transpose(x_dir, (0, 1, 3, 2))),
                               atol=1e-6)
