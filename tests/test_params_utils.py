"""Parameter-utility tests: wildcard matching, freezing, weight overwrite."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spherical_dyffusion_tpu.utils.params import (
    freeze_mask,
    frozen_param_optimizer,
    matches_any,
    overwrite_weights,
    param_names,
)


def tree():
    return {
        "encoder": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros((3,))},
        "block_0": {"filter": {"weight": jnp.ones((3, 3, 4, 2))}},
    }


def test_param_names_and_matching():
    names = param_names(tree())
    assert "encoder/kernel" in names and "block_0/filter/weight" in names
    assert matches_any("block_0/filter/weight", ["block_*/filter/*"])
    assert not matches_any("encoder/kernel", ["block_*"])


def test_freeze_mask_and_optimizer():
    t = tree()
    mask = freeze_mask(t, ["encoder/*"])
    assert mask["encoder"]["kernel"] is False
    assert mask["block_0"]["filter"]["weight"] is True

    tx = frozen_param_optimizer(optax.sgd(1.0), ["encoder/*"])
    state = tx.init(t)
    grads = jax.tree_util.tree_map(jnp.ones_like, t)
    updates, _ = tx.update(grads, state, t)
    np.testing.assert_array_equal(np.asarray(updates["encoder"]["kernel"]), 0.0)
    assert float(jnp.abs(updates["block_0"]["filter"]["weight"]).sum()) > 0


def test_overwrite_weights_matching_and_partial_shapes():
    target = tree()
    source = {
        "encoder": {"kernel": jnp.full((2, 3), 7.0), "bias": jnp.full((3,), 2.0)},
        "block_0": {"filter": {"weight": jnp.full((2, 2, 4, 2), 5.0)}},  # smaller
    }
    out = overwrite_weights(target, source)
    np.testing.assert_array_equal(np.asarray(out["encoder"]["kernel"]), 7.0)
    w = np.asarray(out["block_0"]["filter"]["weight"])
    np.testing.assert_array_equal(w[:2, :2], 5.0)
    np.testing.assert_array_equal(w[2:, 2:], 1.0)  # untouched region

    out2 = overwrite_weights(target, source, include=["encoder/bias"])
    np.testing.assert_array_equal(np.asarray(out2["encoder"]["kernel"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out2["encoder"]["bias"]), 2.0)

    out3 = overwrite_weights(target, source, exclude=["encoder/*"])
    np.testing.assert_array_equal(np.asarray(out3["encoder"]["kernel"]), 1.0)


def test_runs_api(tmp_path):
    """Local runs-query API (wandb_api functional counterpart)."""
    import json
    import os

    from spherical_dyffusion_tpu.utils.loggers import JsonlLogger
    from spherical_dyffusion_tpu.utils.runs_api import RunsApi

    for name, seed, losses in [("runA", 1, [3.0, 2.0, 1.0]), ("runB", 2, [5.0, 4.5, 4.2])]:
        lg = JsonlLogger(str(tmp_path / name))
        lg.log_hyperparams({"seed": seed, "model": {"embed_dim": 8}})
        for i, l in enumerate(losses):
            lg.log({"val/avg/rmse": l}, step=i)
        lg.finish()

    api = RunsApi(str(tmp_path))
    assert [r.name for r in api.runs()] == ["runA", "runB"]
    assert [r.name for r in api.runs(config_filters={"seed": 2})] == ["runB"]
    assert [r.name for r in api.runs(config_filters={"model.embed_dim": 8})] == ["runA", "runB"]
    run = api.get_run("runA")
    assert run.config["seed"] == 1
    arr = run.metric_array("val/avg/rmse")
    assert arr.shape == (3, 2) and arr[-1, 1] == 1.0
    assert run.best("val/avg/rmse") == 1.0
    assert run.summary()["val/avg/rmse"] == 1.0
    best = api.best_run("val/avg/rmse", mode="min")
    assert best.name == "runA"


def test_variable_metadata():
    from spherical_dyffusion_tpu.utils.naming import long_name, units, variable_metadata

    assert units("PRESsfc") == "Pa"
    assert long_name("air_temperature_3") == "air temperature (level 3)"
    assert units("specific_total_water_0") == "kg/kg"
    ln, u = variable_metadata("unknown_thing")
    assert ln == "unknown thing" and u == ""
