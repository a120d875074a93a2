"""DYffusion core tests: step mapping, schedule DSL, cold-sampling algebra.

The d->i mapping cases are pinned to the examples documented in the reference
(dyffusion.py:160-163); cold sampling is validated against an analytically
exact interpolator/forecaster pair, for which the sampler must recover the
true trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.diffusion import (
    DYffusionConfig,
    build_schedule,
    p_losses,
    sample_loop,
)


def make(cfg_kwargs=None, timesteps=6):
    cfg = DYffusionConfig(timesteps=timesteps, **(cfg_kwargs or {}))
    return cfg, build_schedule(cfg)


def test_d_to_i_default_identity():
    cfg, sched = make()
    assert sched.num_timesteps == 6
    for d in range(1, 6):
        assert sched.d_to_i(d) == d
    assert sched.dynamical_steps == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
    assert sched.sampling_steps == (0, 1, 2, 3, 4, 5)


@pytest.mark.parametrize(
    "k,expected",
    [
        # reference docstring examples for h=5 (dyffusion.py:160-163)
        (1, {5: 4, 4: 3, 3: 2, 2: 1, 1: 0.5}),
        (2, {6: 4, 5: 3, 4: 2, 3: 1, 2: 2 / 3, 1: 1 / 3}),
        (3, {7: 4, 6: 3, 5: 2, 4: 1, 3: 0.75, 2: 0.5, 1: 0.25}),
    ],
)
def test_d_to_i_before_t1_only_with_additional_steps(k, expected):
    cfg, sched = make({"additional_interpolation_steps": k}, timesteps=5)
    assert sched.num_timesteps == 5 + k
    for d, i_n in expected.items():
        assert np.isclose(float(sched.d_to_i(d)), i_n), (d, i_n)
    # tensor path must agree with the scalar path (reference asserts the same)
    ds = jnp.asarray(list(expected.keys()), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sched.d_to_i(ds)), np.asarray(list(expected.values())), atol=4e-6
    )


def test_linear_schedule_with_factor():
    cfg, sched = make(
        {"schedule": "linear", "additional_interpolation_steps_factor": 1}, timesteps=5
    )
    assert sched.num_timesteps == 5 + 4
    for d in range(1, sched.num_timesteps):
        assert np.isclose(float(sched.d_to_i(d)), d / 2)


def test_sampling_schedule_dsl():
    cfg, sched = make({"additional_interpolation_steps": 3,
                       "sampling_schedule": "every2nd"}, timesteps=5)
    # artificial steps are 1, 2, 3 -> every2nd keeps 1, 3; base = 0 + dynamical
    assert sched.sampling_steps == (0, 1, 3, 4, 5, 6, 7)

    cfg2, sched2 = make({"additional_interpolation_steps": 3,
                         "sampling_schedule": "first2"}, timesteps=5)
    assert sched2.sampling_steps == (0, 1, 2, 4, 5, 6, 7)

    cfg3, sched3 = make({"additional_interpolation_steps": 3,
                         "sampling_schedule": "only_dynamics"}, timesteps=5)
    assert sched3.sampling_steps == (0, 4, 5, 6, 7)


def _exact_world(horizon, shape=(2, 4, 4, 3)):
    """A linear-dynamics world where interpolation and forecasting are exact:
    x(t) = x0 + v * t with constant v. The interpolator returns the true
    linear interpolation; the forecaster reads the velocity off x_t and t."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x_last = x0 + v * horizon

    def interpolate_fn(x_end, xl, t, rng_key, **kw):
        w = (t / horizon).reshape((-1,) + (1,) * (x_end.ndim - 1))
        return x_end + (xl - x_end) * w

    def forecast_fn(x_t, time, condition, static_condition=None):
        tt = jnp.asarray(time, jnp.float32).reshape((-1,) + (1,) * (x_t.ndim - 1))
        # x_t = x0 + v t  =>  x_last = x_t + v (h - t); v is known in closure
        return x_t + v * (horizon - tt)

    return x0, v, x_last, interpolate_fn, forecast_fn


def test_cold_sampling_recovers_exact_trajectory():
    horizon = 6
    cfg, sched = make(timesteps=horizon)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    out = sample_loop(
        interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0)
    )
    assert set(out.preds.keys()) == {1, 2, 3, 4, 5, 6}
    for h in range(1, 7):
        np.testing.assert_allclose(
            np.asarray(out.preds[h]), np.asarray(x0 + v * h), atol=1e-4, err_msg=f"h={h}"
        )
    np.testing.assert_allclose(np.asarray(out.x_last), np.asarray(x_last), atol=1e-4)


def test_naive_sampling_also_exact_in_exact_world():
    horizon = 4
    cfg, sched = make({"sampling_type": "naive"}, timesteps=horizon)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    out = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    for h in range(1, horizon + 1):
        np.testing.assert_allclose(
            np.asarray(out.preds[h]), np.asarray(x0 + v * h), atol=1e-4
        )


def test_ar_init_branch():
    horizon = 4
    cfg, sched = make(
        {"use_cold_sampling_for_last_step": False,
         "use_cold_sampling_for_init_of_ar_step": True},
        timesteps=horizon,
    )
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    out = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert out.ar_init is not None
    # in the exact world the AR init equals the true final state
    np.testing.assert_allclose(np.asarray(out.ar_init), np.asarray(x_last), atol=1e-4)


def test_p_losses_exact_world_is_zero():
    horizon = 6
    cfg, sched = make(timesteps=horizon)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    losses = p_losses(
        interpolate_fn, forecast_fn, cfg, sched, x0, x_last, jax.random.PRNGKey(1)
    )
    assert float(losses["loss"]) < 1e-5
    assert float(losses["loss_forward2"]) == 0.0


def test_p_losses_lambda2():
    horizon = 6
    cfg, sched = make({"lambda_reconstruction2": 0.5}, timesteps=horizon)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    losses = p_losses(
        interpolate_fn, forecast_fn, cfg, sched, x0, x_last, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["loss"]) < 1e-5  # still exact world


def test_hack_channel_shims():
    """With hack_for_imprecise_interpolation, state carries one extra leading
    channel; preds and x_last come back in forecaster channels."""
    horizon = 3
    cfg, sched = make({"hack_for_imprecise_interpolation": True}, timesteps=horizon)
    B, H, W, C = 2, 4, 4, 5  # state channels = 5, forecaster channels = 4
    rngn = np.random.default_rng(0)
    x0 = jnp.asarray(rngn.standard_normal((B, H, W, C)), jnp.float32)

    def interpolate_fn(x_end, xl, t, rng_key, **kw):
        # contract: xl has C-1 channels; output has C (prepend channel 0)
        assert xl.shape[-1] == C - 1
        xl_full = jnp.concatenate([x_end[..., :1], xl], axis=-1)
        w = (t / horizon).reshape((-1, 1, 1, 1))
        return x_end + (xl_full - x_end) * w

    def forecast_fn(x_t, time, condition, static_condition=None):
        assert x_t.shape[-1] == C
        return x_t[..., 1:] * 0.9

    out = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    for h, p in out.preds.items():
        assert p.shape[-1] == C - 1, h
    assert out.x_last.shape[-1] == C - 1


def test_scan_sampler_matches_unrolled_in_exact_world():
    from spherical_dyffusion_tpu.diffusion import sample_loop_scan, scan_compatible

    horizon = 6
    cfg, sched = make(timesteps=horizon)
    assert scan_compatible(cfg, sched)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    out_a = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    out_b = sample_loop_scan(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert set(out_a.preds) == set(out_b.preds)
    for h in out_a.preds:
        np.testing.assert_allclose(
            np.asarray(out_a.preds[h]), np.asarray(out_b.preds[h]), atol=1e-4, err_msg=str(h)
        )
    np.testing.assert_allclose(np.asarray(out_a.x_last), np.asarray(out_b.x_last), atol=1e-4)


def test_scan_sampler_with_artificial_steps():
    from spherical_dyffusion_tpu.diffusion import sample_loop_scan, scan_compatible

    cfg, sched = make({"additional_interpolation_steps": 2}, timesteps=4)
    assert scan_compatible(cfg, sched)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(4)
    out = sample_loop_scan(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert set(out.preds) == {1, 2, 3, 4}
    for h in range(1, 5):
        np.testing.assert_allclose(
            np.asarray(out.preds[h]), np.asarray(x0 + v * h), atol=1e-4
        )


def test_peeled_sampler_matches_unrolled_in_exact_world():
    """peel_sampler computes the s=0 / s=N-1 iterations as degenerate
    single-batch updates instead of masked double-batch lanes; results must
    match the unrolled reference loop."""
    from spherical_dyffusion_tpu.diffusion import sample_loop_scan, scan_compatible

    horizon = 6
    cfg, sched = make({"peel_sampler": True}, timesteps=horizon)
    assert scan_compatible(cfg, sched)
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    out_a = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    out_b = sample_loop_scan(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert set(out_a.preds) == set(out_b.preds)
    for h in out_a.preds:
        np.testing.assert_allclose(
            np.asarray(out_a.preds[h]), np.asarray(out_b.preds[h]), atol=1e-4, err_msg=str(h)
        )
    np.testing.assert_allclose(np.asarray(out_a.x_last), np.asarray(out_b.x_last), atol=1e-4)


def test_peeled_sampler_interpolator_row_budget():
    """The peel exists to skip the two wasted interpolator rows: count rows
    actually fed through the interpolator per EXECUTION (io_callback fires on
    every scan iteration, unlike a Python-side trace hook) — exactly 2N-2
    batches of B, versus the uniform scan sampler's 2N."""
    from jax.experimental import io_callback

    from spherical_dyffusion_tpu.diffusion import sample_loop_scan

    horizon = 6
    x0, v, x_last, interpolate_fn, forecast_fn = _exact_world(horizon)
    B = x0.shape[0]

    def run(peel):
        cfg, sched = make({"peel_sampler": peel}, timesteps=horizon)
        counter = {"rows": 0}

        def record(n):
            counter["rows"] += int(n)
            return np.int32(0)

        def counting_interp(x_end, xl, t, rng_key, **kw):
            io_callback(record, jax.ShapeDtypeStruct((), jnp.int32),
                        jnp.asarray(x_end.shape[0], jnp.int32), ordered=True)
            return interpolate_fn(x_end, xl, t, rng_key, **kw)

        out = sample_loop_scan(counting_interp, forecast_fn, cfg, sched, x0,
                               jax.random.PRNGKey(0))
        jax.block_until_ready(out.x_last)
        return counter["rows"]

    assert run(False) == 2 * horizon * B
    assert run(True) == (2 * horizon - 2) * B


def test_peeled_sampler_matches_with_fractional_times_and_hack():
    """Peel must preserve fractional interpolation times (k > 0) and the
    hack channel shims."""
    from spherical_dyffusion_tpu.diffusion import sample_loop_scan, scan_compatible

    horizon, k = 4, 2
    cfg, sched = make({"additional_interpolation_steps": k,
                       "peel_sampler": True}, timesteps=horizon)
    assert scan_compatible(cfg, sched)
    x0, interpolate_fn, forecast_fn = _nonlinear_world(horizon)
    out_a = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    out_b = sample_loop_scan(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert set(out_a.preds) == set(out_b.preds)
    for h in out_a.preds:
        np.testing.assert_allclose(
            np.asarray(out_a.preds[h]), np.asarray(out_b.preds[h]), atol=1e-4, err_msg=str(h)
        )
    np.testing.assert_allclose(np.asarray(out_a.x_last), np.asarray(out_b.x_last), atol=1e-4)

    # hack shim: channel counts come back in forecaster channels
    cfg2, sched2 = make({"hack_for_imprecise_interpolation": True,
                         "peel_sampler": True}, timesteps=3)
    B, H, W, C = 2, 4, 4, 5
    rngn = np.random.default_rng(0)
    xh = jnp.asarray(rngn.standard_normal((B, H, W, C)), jnp.float32)

    def interp_hack(x_end, xl, t, rng_key, **kw):
        xl_full = jnp.concatenate([x_end[..., :1], xl], axis=-1)
        w = (t / 3.0).reshape((-1, 1, 1, 1))
        return x_end + (xl_full - x_end) * w

    def fc_hack(x_t, time, condition, static_condition=None):
        return x_t[..., 1:] * 0.9

    out_h = sample_loop_scan(interp_hack, fc_hack, cfg2, sched2, xh,
                             jax.random.PRNGKey(0))
    out_r = sample_loop(interp_hack, fc_hack, cfg2, sched2, xh,
                        jax.random.PRNGKey(0))
    for h in out_r.preds:
        assert out_h.preds[h].shape[-1] == C - 1
        np.testing.assert_allclose(np.asarray(out_h.preds[h]),
                                   np.asarray(out_r.preds[h]), atol=1e-4)


def _nonlinear_world(horizon, shape=(2, 4, 4, 3)):
    """A world whose interpolator is NONLINEAR in t, so any silent clamping of
    fractional interpolation times (the k > 0 artificial steps) changes the
    output — unlike the telescoping linear _exact_world."""
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def interpolate_fn(x_end, xl, t, rng_key, **kw):
        w = ((t / horizon) ** 2).reshape((-1,) + (1,) * (x_end.ndim - 1))
        return x_end + (xl - x_end) * w

    def forecast_fn(x_t, time, condition, static_condition=None):
        tt = jnp.asarray(time, jnp.float32).reshape((-1,) + (1,) * (x_t.ndim - 1))
        return x_t + v * (horizon - tt)

    return x0, interpolate_fn, forecast_fn


def test_sample_loop_preserves_fractional_times_k_gt_0():
    """Regression (ADVICE r1 high): with before_t1_only and k > 0, artificial
    diffusion steps map to interpolation times in (0, 1) which must reach the
    interpolator UNCLAMPED (reference _interpolate accepts any t in
    (0, horizon))."""
    horizon, k = 4, 2
    cfg, sched = make({"additional_interpolation_steps": k}, timesteps=horizon)
    x0, inner_interp, forecast_fn = _nonlinear_world(horizon)
    seen = []

    def recording_interp(x_end, xl, t, rng_key, **kw):
        seen.extend(np.unique(np.asarray(t)).tolist())
        return inner_interp(x_end, xl, t, rng_key, **kw)

    sample_loop(recording_interp, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    # artificial steps d=1,2 map to 1/3, 2/3 — they must be seen verbatim
    for frac in (1 / 3, 2 / 3):
        assert any(np.isclose(s, frac, atol=1e-6) for s in seen), (frac, sorted(seen))
    # nothing in the open interval (0, 1) may have been rounded up to 1 except
    # genuine integral times
    assert not any(0 < s < 1 and not any(
        np.isclose(s, f, atol=1e-6) for f in (1 / 3, 2 / 3)) for s in seen), sorted(seen)


def test_scan_sampler_matches_unrolled_with_fractional_times():
    """The scan sampler must agree with the unrolled sampler in a world where
    clamping fractional times would change the answer."""
    from spherical_dyffusion_tpu.diffusion import sample_loop_scan, scan_compatible

    horizon, k = 4, 2
    cfg, sched = make({"additional_interpolation_steps": k}, timesteps=horizon)
    assert scan_compatible(cfg, sched)
    x0, interpolate_fn, forecast_fn = _nonlinear_world(horizon)
    out_a = sample_loop(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    out_b = sample_loop_scan(interpolate_fn, forecast_fn, cfg, sched, x0, jax.random.PRNGKey(0))
    assert set(out_a.preds) == set(out_b.preds)
    for h in out_a.preds:
        np.testing.assert_allclose(
            np.asarray(out_a.preds[h]), np.asarray(out_b.preds[h]), atol=1e-4, err_msg=str(h)
        )
    np.testing.assert_allclose(np.asarray(out_a.x_last), np.asarray(out_b.x_last), atol=1e-4)


def test_p_losses_fractional_times_reach_interpolator():
    """Training-path regression: q_sample inside p_losses must pass k > 0
    fractional times through (only the masked t == 0 lane is remapped)."""
    horizon, k = 4, 2
    cfg, sched = make({"additional_interpolation_steps": k}, timesteps=horizon)
    x0, inner_interp, forecast_fn = _nonlinear_world(horizon)
    x_last = forecast_fn(x0, jnp.zeros((x0.shape[0],)), None)
    seen = []

    def recording_interp(x_end, xl, t, rng_key, **kw):
        seen.extend(np.unique(np.asarray(t)).tolist())
        return inner_interp(x_end, xl, t, rng_key, **kw)

    # draw many batches so every diffusion step is hit
    for i in range(20):
        p_losses(recording_interp, forecast_fn, cfg, sched, x0, x_last,
                 jax.random.PRNGKey(i))
    for frac in (1 / 3, 2 / 3):
        assert any(np.isclose(s, frac, atol=1e-6) for s in seen), (frac, sorted(set(seen)))


def test_p_losses_lambda2_uses_injected_criterion():
    """Regression (ADVICE r1 medium): the lambda_reconstruction2 term must use
    the configured criterion, not a hardcoded L1."""
    horizon = 6
    cfg, sched = make({"lambda_reconstruction2": 1.0, "lambda_reconstruction": 0.0},
                      timesteps=horizon)
    x0, interpolate_fn, forecast_fn = _nonlinear_world(horizon)
    x_last = x0 + 1.7  # wrong target => nonzero losses
    l1 = lambda p, t: jnp.mean(jnp.abs(p - t))  # noqa: E731
    l2 = lambda p, t: jnp.mean((p - t) ** 2)  # noqa: E731
    out_l1 = p_losses(interpolate_fn, forecast_fn, cfg, sched, x0, x_last,
                      jax.random.PRNGKey(5), criterion=l1)
    out_l2 = p_losses(interpolate_fn, forecast_fn, cfg, sched, x0, x_last,
                      jax.random.PRNGKey(5), criterion=l2)
    a, b = float(out_l1["loss_forward2"]), float(out_l2["loss_forward2"])
    assert a > 0 and b > 0
    assert not np.isclose(a, b), (a, b)  # criteria must actually differ
    # loss1 and loss2 use the same criterion: in a world where the t2 forecast
    # equals the t forecast they'd be equal; here just check both are finite
    assert np.isfinite(float(out_l1["loss"])) and np.isfinite(float(out_l2["loss"]))
