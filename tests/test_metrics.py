"""Metric tests: pinned against analytic values and the documented reference
formulas (fair CRPS, SSR correction factor, vertical integral math)."""

import jax.numpy as jnp
import numpy as np

from spherical_dyffusion_tpu.evaluation import metrics as M


def test_area_weights_normalized_and_cosine():
    lats = np.linspace(-89.5, 89.5, 180)
    w = M.spherical_area_weights(lats, 360)
    assert w.shape == (180, 360)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-5)
    # equator heavier than poles
    assert float(w[90, 0]) > float(w[0, 0])


def test_weighted_mean_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8, 16))
    w = rng.uniform(1, 2, (8, 16))
    got = np.asarray(M.weighted_mean(jnp.asarray(x), jnp.asarray(w), dim=(-2, -1)))
    want = (x * w).sum(axis=(-2, -1)) / np.broadcast_to(w, x.shape).sum(axis=(-2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rmse_and_bias():
    t = jnp.zeros((4, 4))
    p = jnp.full((4, 4), 2.0)
    assert float(M.root_mean_squared_error(t, p, dim=(-2, -1))) == 2.0
    assert float(M.weighted_mean_bias(t, p, dim=(-2, -1))) == 2.0


def test_fair_crps_two_member_analytic():
    """For 2 members a, b and truth y: CRPS = (|a-y| + |b-y|)/2 - |a-b|/2
    (fair version divides the spread term by M(M-1)=2)."""
    y = jnp.zeros((1, 1))
    pred = jnp.asarray([1.0, -0.5]).reshape(2, 1, 1)
    got = float(M.crps_ensemble(y, pred, reduction="mean"))
    want = (1.0 + 0.5) / 2 - 0.5 * 1.5
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crps_decreases_with_sharper_ensemble():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    wide = y[None] + jnp.asarray(rng.standard_normal((10, 8, 8)), jnp.float32) * 2.0
    sharp = y[None] + jnp.asarray(rng.standard_normal((10, 8, 8)), jnp.float32) * 0.1
    assert float(M.crps_ensemble(y, sharp)) < float(M.crps_ensemble(y, wide))


def test_spread_skill_ratio_well_calibrated_near_one():
    rng = np.random.default_rng(0)
    center = rng.standard_normal((32, 32)).astype(np.float32)
    # exchangeable truth/members: truth and each member = center + unit noise
    truth = jnp.asarray(center + rng.standard_normal((32, 32)).astype(np.float32))
    preds = jnp.asarray(center[None] + rng.standard_normal((64, 32, 32)).astype(np.float32))
    ssr = float(M.spread_skill_ratio(truth, preds, dim=(-2, -1)))
    assert 0.75 < ssr < 1.35, ssr


def test_vertical_integral_constant_field():
    """For x == 1 everywhere: integral = (1/g) * (p_surface - p_top)."""
    K = 4
    ak = jnp.linspace(0.0, 0.0, K + 1)
    bk = jnp.linspace(0.0, 1.0, K + 1)
    ps = jnp.full((2, 2), 1000.0)
    x = jnp.ones((2, 2, K))
    got = np.asarray(M.vertical_integral(x, ps, ak, bk))
    np.testing.assert_allclose(got, 1000.0 / M.GRAVITY, rtol=1e-6)


def test_dry_air_pressure():
    K = 3
    ak = jnp.zeros((K + 1,))
    bk = jnp.linspace(0.0, 1.0, K + 1)
    ps = jnp.full((2, 2), 900.0)
    q = jnp.zeros((2, 2, K))
    got = np.asarray(M.surface_pressure_due_to_dry_air(q, ps, ak, bk))
    np.testing.assert_allclose(got, 900.0)


def test_gradient_magnitude_linear_field():
    x = jnp.asarray(np.tile(np.arange(8.0), (4, 1)))  # gradient 1 along axis -1
    g = np.asarray(M.gradient_magnitude(x, dim=(-2, -1)))
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


def test_rmse_of_time_mean():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((5, 8, 8)), jnp.float32)
    # predicted = truth with zero-time-mean noise -> rmse of time mean ~ 0
    noise = rng.standard_normal((5, 8, 8)).astype(np.float32)
    noise -= noise.mean(axis=0, keepdims=True)
    p = t + jnp.asarray(noise)
    assert float(M.rmse_of_time_mean(t, p)) < 1e-5


def test_video_aggregator_running_moments():
    from spherical_dyffusion_tpu.evaluation.video import VideoAggregator

    rng = np.random.default_rng(0)
    agg = VideoAggregator(["a"], enable_variance=True)
    E, T, H, W = 4, 6, 4, 4
    targets = rng.standard_normal((T, H, W, 1)).astype(np.float32)
    all_preds = rng.standard_normal((E, T, H, W, 1)).astype(np.float32)
    # record in two windows of 3 steps
    agg.record_batch(all_preds[:, :3], targets[:3], start_step=0)
    agg.record_batch(all_preds[:, 3:], targets[3:], start_step=3)
    vids = agg.get_videos()
    np.testing.assert_allclose(vids["gen_mean"], all_preds.mean(axis=0), rtol=1e-5)
    np.testing.assert_allclose(vids["target_mean"], targets, rtol=1e-5)
    np.testing.assert_allclose(
        vids["gen_variance"], all_preds.var(axis=0, ddof=1), rtol=1e-4
    )
    np.testing.assert_allclose(
        vids["error_mean"], all_preds.mean(axis=0) - targets, rtol=1e-4, atol=1e-6
    )


def test_checkpoint_path_resolution(tmp_path):
    from spherical_dyffusion_tpu.utils.checkpointing import (
        find_checkpoint_in_dir,
        resolve_checkpoint_path,
    )

    p = tmp_path / "sub" / "model.ckpt"
    p.parent.mkdir()
    p.write_bytes(b"x")
    assert resolve_checkpoint_path(str(p)) == str(p)
    assert resolve_checkpoint_path(str(tmp_path)) == str(p)
    assert find_checkpoint_in_dir(str(tmp_path)) == str(p)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        resolve_checkpoint_path(str(tmp_path / "missing.ckpt"))


def test_hf_checkpoint_download_loopback(tmp_path):
    """Exercise the ``hf:`` distribution leg end-to-end against a LOCAL
    loopback HTTP server implementing the hub resolve protocol (HEAD metadata
    + GET payload) — the reference's HF download path
    (src/utilities/checkpointing.py:99-154) without network egress."""
    import http.server
    import threading

    payload = b"fake-lightning-checkpoint-bytes"
    commit = "0" * 40

    class Handler(http.server.BaseHTTPRequestHandler):
        def _headers(self):
            self.send_response(200)
            self.send_header("X-Repo-Commit", commit)
            self.send_header("ETag", '"deadbeef"')
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()

        def do_HEAD(self):
            assert self.path.endswith("/org/repo/resolve/main/model.ckpt"), self.path
            self._headers()

        def do_GET(self):
            self._headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from spherical_dyffusion_tpu.utils.checkpointing import resolve_checkpoint_path

        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        import os as _os
        old = _os.environ.get("HF_ENDPOINT")
        _os.environ["HF_ENDPOINT"] = endpoint
        try:
            local = resolve_checkpoint_path("hf:org/repo/model.ckpt",
                                            cache_dir=str(tmp_path))
        finally:
            if old is None:
                _os.environ.pop("HF_ENDPOINT", None)
            else:
                _os.environ["HF_ENDPOINT"] = old
        with open(local, "rb") as f:
            assert f.read() == payload
        assert commit in local
    finally:
        srv.shutdown()
