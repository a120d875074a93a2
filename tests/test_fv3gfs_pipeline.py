"""Production FV3GFS pipeline test on synthetic netCDF files: ensemble ic_*
training dirs + validation member + centering/scaling stats -> datamodule ->
training via the factory interface -> checkpoint -> rollout via the stepper.

This exercises the same code path a user runs with the real 1-degree FV3GFS
dataset (reference fv3gfs_ensemble.py + getters.py ensemble_xarray flow).
"""

import os

import h5py
import jax
import numpy as np
import pytest

from spherical_dyffusion_tpu.data import FV3GFSDataModule, DataModuleConfig

IN_NAMES = ["PRESsfc", "surface_temperature", "air_temperature_0",
            "specific_total_water_0"]
FORCING = ["DSWRFtoa"]
EXTRA = ["ocean_fraction"]
H, W = 8, 16


def _write_member(d, n_time, seed):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    # two files to exercise the cumulative index
    for fi, n in enumerate([n_time // 2, n_time - n_time // 2]):
        with h5py.File(os.path.join(d, f"data_{fi}.nc"), "w") as f:
            for v in IN_NAMES + FORCING + EXTRA:
                base = 1.0 if v != "ocean_fraction" else 0.0
                data = base + rng.standard_normal((n, H, W)).astype(np.float32)
                if v == "ocean_fraction":
                    data = (data > 0).astype(np.float32)
                f.create_dataset(v, data=data)
            f.create_dataset("lat", data=np.linspace(-89.5, 89.5, H))
            f.create_dataset("lon", data=np.linspace(0.5, 359.5, W))
            f.create_dataset("ak", data=np.linspace(0, 100, 3))
            f.create_dataset("bk", data=np.linspace(0, 1, 3))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fv3gfs")
    for i, m in enumerate(["ic_0001", "ic_0002"]):
        _write_member(str(root / m), 24, seed=i)
    _write_member(str(root / "validation" / "ic_0011"), 24, seed=9)
    # stats files (scalar per variable, like data_statistics/*.nc)
    for fname, val in [("centering.nc", 1.0), ("scaling.nc", 0.7)]:
        with h5py.File(root / fname, "w") as f:
            for v in IN_NAMES + FORCING:
                f.create_dataset(v, data=np.float32(val))
    return str(root)


def make_dm(data_root, horizon=3):
    return FV3GFSDataModule(DataModuleConfig(
        in_names=IN_NAMES, out_names=IN_NAMES, forcing_names=FORCING,
        data_dir=data_root, data_dir_stats=data_root, horizon=horizon,
        prediction_horizon=6, prediction_horizon_long=6, batch_size=2,
    ))


def test_fv3gfs_datamodule_structure(data_root):
    dm = make_dm(data_root)
    # ensemble concat: two members, each 24 steps, horizon+window = 4 frames
    ds = dm.dataset("train")
    assert len(ds) == 2 * (24 - 4 + 1)
    item = ds[0]
    assert item["dynamics"].shape == (4, H, W, len(IN_NAMES))
    assert item["dynamical_condition"].shape == (4, H, W, 1)
    # forcing is normalized with the stats files
    raw = dm._source("train").read_window(0, 4, FORCING)["DSWRFtoa"]
    np.testing.assert_allclose(
        item["dynamical_condition"][..., 0], (raw - 1.0) / 0.7, atol=1e-5
    )
    # val split reads validation/ic_0011 with the long horizon
    assert dm.horizon_for_split("val") == 6
    assert dm.grid.sigma is not None and dm.grid.sigma.num_levels == 2


def test_fv3gfs_train_checkpoint_rollout(data_root, tmp_path):
    from spherical_dyffusion_tpu.interface import (
        get_experiment,
        load_experiment_checkpoint,
        save_experiment_checkpoint,
    )
    from spherical_dyffusion_tpu.training import Trainer, TrainerConfig
    from spherical_dyffusion_tpu.inference import (
        DYffusionStepper,
        InferenceConfig,
        PrescriberConfig,
        run_inference,
    )
    from spherical_dyffusion_tpu.evaluation.aggregators import InferenceAggregator

    cfg = {
        "experiment": "interpolation",
        "datamodule": {"kind": "fv3gfs", "in_names": IN_NAMES, "out_names": IN_NAMES,
                       "forcing_names": FORCING, "data_dir": data_root,
                       "data_dir_stats": data_root, "horizon": 3,
                       "prediction_horizon": 6, "prediction_horizon_long": 6,
                       "batch_size": 2},
        "model": {"kind": "sfno", "embed_dim": 8, "num_layers": 1, "dropout_mlp": 0.1},
        "module": {"enable_inference_dropout": True},
    }
    dm = make_dm(data_root)
    interp = get_experiment(cfg, dm)
    t1 = Trainer(interp, dm, TrainerConfig(epochs=1, use_ema=False, warmup_steps=2))
    t1.fit(verbose=False, val_every=100)
    ipol_ckpt = str(tmp_path / "ipol.ckpt")
    save_experiment_checkpoint(ipol_ckpt, t1.state, cfg)

    # forecaster on top, loading the interpolator from its checkpoint
    cfg2 = dict(cfg)
    cfg2["experiment"] = "dyffusion"
    cfg2["diffusion"] = {"forward_conditioning": "none",
                         "interpolator_checkpoint_path": ipol_ckpt}
    exp2 = get_experiment(cfg2, dm)
    t2 = Trainer(exp2, dm, TrainerConfig(epochs=1, use_ema=False, warmup_steps=2))
    t2.fit(verbose=False, val_every=100)
    fc_ckpt = str(tmp_path / "fc.ckpt")
    save_experiment_checkpoint(fc_ckpt, t2.state, cfg2)

    # reload purely from the checkpoint file + rollout on the validation member
    exp3, params, _, _ = load_experiment_checkpoint(fc_ckpt)
    prescriber = PrescriberConfig("surface_temperature", "ocean_fraction", 1).build(IN_NAMES)
    stepper = DYffusionStepper(exp3, params, prescriber=prescriber)
    src = dm._source("val")
    agg = InferenceAggregator(IN_NAMES, dm.grid.horizontal.area_weights(),
                              log_zonal_mean_images=False)
    summary = run_inference(
        stepper, src,
        InferenceConfig(n_forward_steps=9, forward_steps_in_memory=9),
        aggregator=agg, mask_name="ocean_fraction", verbose=False,
    )
    assert summary["n_forward_steps"] == 9
    logs = agg.get_logs()
    assert np.isfinite(logs["inference/avg/rmse"])
    assert np.isfinite(logs["inference/time_mean/rmse/PRESsfc"])
