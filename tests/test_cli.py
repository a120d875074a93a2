"""CLI-level tests: config overrides deep-merge at checkpoint reload, the
run_inference config flow, and train eval modes."""

import json
import os

import numpy as np
import pytest

from spherical_dyffusion_tpu.interface import (
    get_datamodule,
    get_experiment,
    load_experiment_checkpoint,
    save_experiment_checkpoint,
)
from spherical_dyffusion_tpu.training import Trainer, TrainerConfig

CFG = {
    "experiment": "interpolation",
    "datamodule": {"kind": "debug", "channels": 2, "height": 8, "width": 16,
                   "horizon": 3, "n_forcing": 1, "batch_size": 4, "n_timesteps": 24},
    "model": {"kind": "sfno", "embed_dim": 8, "num_layers": 1, "dropout_mlp": 0.1},
    "module": {"enable_inference_dropout": True},
}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ck") / "ipol.ckpt")
    dm = get_datamodule(CFG)
    exp = get_experiment(CFG, dm)
    tr = Trainer(exp, dm, TrainerConfig(epochs=1, warmup_steps=2))
    tr.fit(verbose=False, val_every=100)
    save_experiment_checkpoint(path, tr.state, CFG)
    return path


def test_checkpoint_reload_with_overrides(ckpt):
    """The inference 'overrides:' deep-merge (reference
    stepper_multistep.py:244): stored config + user overrides rebuild the
    experiment."""
    exp, params, ema, cfg = load_experiment_checkpoint(
        ckpt, overrides={"module": {"num_predictions": 3},
                         "datamodule": {"n_timesteps": 30}}
    )
    assert cfg["module"]["num_predictions"] == 3
    assert cfg["datamodule"]["n_timesteps"] == 30
    assert cfg["model"]["embed_dim"] == 8  # untouched keys survive
    assert exp.cfg.num_predictions == 3
    assert ema is not None


def test_run_inference_cli_from_checkpoint(ckpt, tmp_path):
    """A DYffusion checkpoint driven through the full inference CLI config."""
    # train a tiny forecaster on top of the interpolator ckpt
    cfg2 = dict(CFG)
    cfg2["experiment"] = "dyffusion"
    cfg2["diffusion"] = {"forward_conditioning": "none",
                         "interpolator_checkpoint_path": ckpt}
    dm = get_datamodule(cfg2)
    exp = get_experiment(cfg2, dm)
    tr = Trainer(exp, dm, TrainerConfig(epochs=1, warmup_steps=2))
    tr.fit(verbose=False, val_every=100)
    fc_ckpt = str(tmp_path / "fc.ckpt")
    save_experiment_checkpoint(fc_ckpt, tr.state, cfg2)

    from spherical_dyffusion_tpu.run_inference import main_from_config

    out_dir = str(tmp_path / "out")
    result = main_from_config({
        "checkpoint_path": fc_ckpt,
        "experiment_dir": out_dir,
        "n_forward_steps": 6,
        "forward_steps_in_memory": 6,
        "verbose": False,
        "log_zonal_mean_images": False,
        "data_writer": {"save_prediction_files": True},
    })
    assert result["summary"]["n_forward_steps"] == 6
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "autoregressive_predictions.nc"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        logs = json.load(f)
    assert np.isfinite(logs["inference/avg/rmse"])
