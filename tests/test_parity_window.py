"""Round-3 full-window checkpoint parity harness tests.

Covers the chain the released HuggingFace checkpoints will flow through:
reference-format torch Lightning ckpt pair (fabricated with real torch.save,
hyper_parameters composed from the reference's on-disk configs, LitEma shadow
naming) -> load_experiment_checkpoint's torch dispatch -> jitted
DYffusionStepper window vs the independent float64 numpy window oracle
(interpolator + forecaster cold sampling + prescriber + hack channel order +
autoregressive hand-off)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load_parity_check():
    spec = importlib.util.spec_from_file_location(
        "parity_check", os.path.join(_SCRIPTS, "parity_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    if not os.path.isdir(os.environ.get(
            "REFERENCE_CONFIG_DIR", "/root/reference/src/configs")):
        pytest.skip("reference configs not available")
    pc = _load_parity_check()
    out = str(tmp_path_factory.mktemp("ref_ckpts"))
    facts = pc.fabricate_checkpoints(
        out, embed_dim=8, num_layers=1, horizon=3, img_shape=(8, 16),
        n_state_extra=2,
    )
    return pc, facts


def test_full_window_parity_on_synthetic_reference_ckpts(fabricated):
    pc, facts = fabricated
    # 7 steps = 2 full segments + 1 partial: exercises the scan body, the
    # autoregressive hand-off, HGTsfc carry, prescriber with time-varying
    # masks, and the trailing partial segment
    report = pc.run_window_parity_check(
        facts["forecaster"], stats_dir=facts["stats"], n_steps=7, tol=1e-4,
        verbose=False,
    )
    assert report["max_abs_diff"] <= 1e-4
    assert len(report["per_step_max_abs_diff"]) == 7


def test_reference_ckpt_load_path_structure(fabricated):
    """The torch ckpt flows through load_experiment_checkpoint itself (the
    run_inference.py path), producing a DYffusion experiment with
    hparams-rebuilt packers, stats-file normalizer, and LitEma-converted EMA
    params shifted by the fabricated epsilon."""
    import jax

    from spherical_dyffusion_tpu.interface import load_experiment_checkpoint

    pc, facts = fabricated
    exp, params, ema_params, config = load_experiment_checkpoint(
        facts["forecaster"],
        overrides={"datamodule": {"data_dir_stats": facts["stats"]},
                   "diffusion": {"enable_interpolator_dropout": False}},
    )
    assert list(exp.in_packer.names) == facts["state_names"]
    assert list(exp.out_packer.names) == facts["out_names"]
    assert list(exp.forcing_names) == facts["forcing_names"]
    assert exp.cfg.horizon == facts["horizon"]
    # stats-file normalizer (not unit fallback)
    assert "_unit_normalization" not in config
    assert float(np.asarray(exp.normalizer.stds)[0]) != 1.0
    # embedded interpolator weights were extracted
    assert exp.interpolator_params is not None
    # EMA shadows (live + 1e-3) converted through the same mapping
    assert ema_params is not None
    leaf = jax.tree_util.tree_leaves(params["params"])[0]
    leaf_ema = jax.tree_util.tree_leaves(ema_params["params"])[0]
    np.testing.assert_allclose(
        np.asarray(leaf_ema) - np.asarray(leaf), 1e-3, rtol=1e-4
    )
    # diffusion config carries the hack flag from the reference yaml compose
    assert exp.diffusion_cfg.hack_for_imprecise_interpolation


def test_interpolator_only_ckpt_loads_as_interpolation_experiment(fabricated):
    from spherical_dyffusion_tpu.interface import load_experiment_checkpoint
    from spherical_dyffusion_tpu.training import InterpolationExperiment

    pc, facts = fabricated
    exp, params, ema, config = load_experiment_checkpoint(
        facts["interpolator"],
        overrides={"datamodule": {"data_dir_stats": facts["stats"]}},
    )
    assert isinstance(exp, InterpolationExperiment)
    assert config["experiment"] == "interpolation"
    assert params is not None


def test_forecaster_ckpt_without_embedded_interpolator_uses_sidecar(fabricated):
    """When a forecaster ckpt lacks embedded interpolator weights, the
    documented override points at a standalone interpolator ckpt."""
    import torch

    from spherical_dyffusion_tpu.interface import load_experiment_checkpoint

    pc, facts = fabricated
    ck = torch.load(facts["forecaster"], map_location="cpu",
                    weights_only=False)
    sd = {k: v for k, v in ck["state_dict"].items()
          if not k.startswith("model.interpolator.")}
    stripped = facts["forecaster"] + ".nointerp"
    torch.save({"state_dict": sd, "hyper_parameters": ck["hyper_parameters"]},
               stripped)
    with pytest.raises(ValueError, match="interpolator"):
        load_experiment_checkpoint(
            stripped,
            overrides={"datamodule": {"data_dir_stats": facts["stats"]}},
        )
    exp, params, _, _ = load_experiment_checkpoint(
        stripped,
        overrides={"datamodule": {"data_dir_stats": facts["stats"]},
                   "interpolator_checkpoint_path": facts["interpolator"]},
    )
    assert exp.interpolator_params is not None


def test_run_inference_cli_on_reference_torch_ckpt(fabricated, tmp_path):
    """The full inference CLI (run_inference.main_from_config) runs directly
    off a reference-format torch Lightning checkpoint: load dispatch, packer/
    normalizer rebuild, prescriber from the ckpt's datamodule config,
    aggregator + per-timestep logs."""
    from spherical_dyffusion_tpu.run_inference import main_from_config

    pc, facts = fabricated
    out = main_from_config({
        "checkpoint_path": facts["forecaster"],
        "overrides": {"datamodule": {"data_dir_stats": facts["stats"]},
                      "diffusion": {"enable_interpolator_dropout": False}},
        "n_forward_steps": facts["horizon"] + 1,  # one full + partial segment
        "forward_steps_in_memory": facts["horizon"] + 1,
        "experiment_dir": str(tmp_path),
        "platform": "cpu",
        "verbose": False,
        "log_zonal_mean_images": False,
        "use_ema": False,
    })
    assert out["summary"]["n_forward_steps"] == facts["horizon"] + 1
    import numpy as np

    vals = [v for v in out["logs"].values()]
    assert vals and all(np.isfinite(v) for v in vals)


def test_stochastic_window_parity_on_synthetic_reference_ckpts(
        tmp_path_factory):
    """The stochastic leg (round-3 verdict #5): interpolator dropout ON on
    both sides — exact float-bernoulli in the jitted stepper (the translator
    auto-fork), train-mode numpy dropout in the f64 oracle — ensemble mean
    and spread must agree within sampling tolerance."""
    if not os.path.isdir(os.environ.get(
            "REFERENCE_CONFIG_DIR", "/root/reference/src/configs")):
        pytest.skip("reference configs not available")
    pc = _load_parity_check()
    out = str(tmp_path_factory.mktemp("stoch_ckpts"))
    facts = pc.fabricate_checkpoints(
        out, embed_dim=8, num_layers=1, horizon=3, img_shape=(8, 16),
        n_state_extra=2, dropout_mlp=0.2,
    )
    report = pc.run_stochastic_parity_check(
        facts["forecaster"], stats_dir=facts["stats"], n_members=10,
        verbose=False,
    )
    assert report["rms_z"] <= report["rms_z_max_allowed"]
    assert report["pooled_std_jax"] > 0


def test_exact_dropout_autoselected_for_reference_ckpts(fabricated):
    """translate_reference_hparams must fork QuantizedDropout -> exact
    float-bernoulli for loaded reference ckpts (dropout is the reference's
    operative ensemble-spread mechanism, reference dyffusion.py:226-240),
    matching the gelu_exact/exact_norm pattern."""
    from spherical_dyffusion_tpu.interface import load_experiment_checkpoint

    pc, facts = fabricated
    exp, *_ = load_experiment_checkpoint(
        facts["forecaster"],
        overrides={"datamodule": {"data_dir_stats": facts["stats"]},
                   "diffusion": {"enable_interpolator_dropout": False}},
    )
    assert exp.interpolator.model.cfg.exact_dropout
    assert exp.model.cfg.exact_dropout


def test_deep_encoder_ema_conversion(tmp_path_factory):
    """Regression: EMA shadow conversion must honor the INFERRED
    encoder_layers (it used to default to 1), otherwise an encoder_layers=2
    checkpoint maps encoder.2 (the second hidden conv) as encoder_out and
    drops encoder_1/decoder_1 from the EMA tree entirely."""
    import jax

    from spherical_dyffusion_tpu.interface import load_experiment_checkpoint

    if not os.path.isdir(os.environ.get(
            "REFERENCE_CONFIG_DIR", "/root/reference/src/configs")):
        pytest.skip("reference configs not available")
    pc = _load_parity_check()
    out = str(tmp_path_factory.mktemp("deep_enc"))
    facts = pc.fabricate_checkpoints(
        out, embed_dim=8, num_layers=1, horizon=3, img_shape=(8, 16),
        n_state_extra=2, encoder_layers=2,
    )
    exp, params, ema_params, config = load_experiment_checkpoint(
        facts["forecaster"],
        overrides={"datamodule": {"data_dir_stats": facts["stats"]},
                   "diffusion": {"enable_interpolator_dropout": False}},
    )
    assert ema_params is not None
    flat_live = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_ema = dict(jax.tree_util.tree_leaves_with_path(ema_params["params"]))
    # every live leaf (incl. encoder_1/decoder_1) has an EMA shadow at +1e-3
    assert len(flat_ema) == len(flat_live)
    for path, leaf in flat_live:
        np.testing.assert_allclose(
            np.asarray(flat_ema[path]) - np.asarray(leaf), 1e-3, rtol=1e-4,
            err_msg=str(path),
        )
