"""Smoke tests for the CLI skin and the observability hooks."""
import os

import numpy as np

from proxtv_tpu.__main__ import main as cli_main
from proxtv_tpu.utils import debug


def test_cli_denoise1d(tmp_path, rng):
    xin = tmp_path / "in.npy"
    xout = tmp_path / "out.npy"
    np.save(xin, rng.randn(40))
    assert cli_main(["denoise1d", str(xin), str(xout), "--lam", "0.5"]) == 0
    out = np.load(xout)
    assert out.shape == (40,)


def test_cli_denoise2d(tmp_path, rng):
    xin = tmp_path / "in.npy"
    xout = tmp_path / "out.npy"
    np.save(xin, rng.randn(8, 9))
    assert cli_main(["denoise2d", str(xin), str(xout), "--lam", "0.3"]) == 0
    assert np.load(xout).shape == (8, 9)


def test_debug_flag_toggles(monkeypatch):
    monkeypatch.setenv("PROXTV_TPU_DEBUG", "0")
    assert not debug.debug_enabled()
    debug.dprint("never printed {x}", x=1)  # no-op, must not raise
    monkeypatch.setenv("PROXTV_TPU_DEBUG", "1")
    assert debug.debug_enabled()


def test_profile_ctx_noop(monkeypatch):
    monkeypatch.delenv("PROXTV_TPU_PROFILE", raising=False)
    with debug.profile_ctx("x"):
        pass


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from proxtv_tpu.utils import checkpoint as ckpt
    state = {"w": jnp.asarray(rng.randn(4, 7)), "x": jnp.asarray(rng.randn(3))}
    p = ckpt.save(str(tmp_path / "st"), state)
    out = ckpt.restore(p, like=state)
    if isinstance(out, dict):
        np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(state["w"]))
    else:
        vals = {np.asarray(v).shape: np.asarray(v) for v in out}
        np.testing.assert_allclose(vals[(4, 7)], np.asarray(state["w"]))
