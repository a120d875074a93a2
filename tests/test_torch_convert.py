"""Checkpoint-conversion tests: structural roundtrip and numerical equivalence
of the layer mappings against real torch ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
from spherical_dyffusion_tpu.utils.torch_convert import (
    sfno_flax_to_torch,
    sfno_torch_to_flax,
    strip_prefix,
    translate_reference_hparams,
)


def _tiny_params():
    cfg = SFNOConfig(img_shape=(8, 16), in_chans=3, out_chans=3, embed_dim=8,
                     num_layers=2, with_time_emb=True, dropout_mlp=0.0)
    model = SFNO(cfg)
    x = jnp.ones((1, 8, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, time=jnp.ones((1,)))
    return cfg, model, params


def test_roundtrip_identity():
    cfg, model, params = _tiny_params()
    sd = sfno_flax_to_torch(jax.device_get(params))
    back = sfno_torch_to_flax(sd, num_layers=cfg.num_layers)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": jax.device_get(params)["params"]}
    )
    b = back
    for path, leaf in flat_a:
        node = b
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=str(path))


def test_roundtrip_identity_with_mlp_dropout():
    """Regression (ADVICE r1 low): a torch MLP with dropout puts fc2 at
    Sequential index 3; flax->torch must emit fwd.3.* in that case so the
    roundtrip stays an identity for dropout>0 checkpoints."""
    cfg, model, params = _tiny_params()
    sd = sfno_flax_to_torch(jax.device_get(params), mlp_dropout=True)
    assert any(".mlp.fwd.3.weight" in k for k in sd)
    assert not any(".mlp.fwd.2.weight" in k for k in sd)
    back = sfno_torch_to_flax(sd, num_layers=cfg.num_layers)
    flat_a = jax.tree_util.tree_leaves_with_path(
        {"params": jax.device_get(params)["params"]}
    )
    for path, leaf in flat_a:
        node = back
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                      err_msg=str(path))


def test_converted_params_run_and_match_dense_conv_semantics():
    """The conv1x1<->Dense transpose convention must match torch exactly."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((5, 3, 1, 1)).astype(np.float32)  # (co, ci, 1, 1)
    b = rng.standard_normal(5).astype(np.float32)
    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)  # NCHW

    conv = torch.nn.Conv2d(3, 5, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    y_t = conv(torch.from_numpy(x)).detach().numpy()  # (2, 5, 4, 4)

    from spherical_dyffusion_tpu.utils.torch_convert import _conv1x1_to_dense

    kernel = _conv1x1_to_dense(w)  # (ci, co)
    x_cl = np.moveaxis(x, 1, -1)  # NHWC
    y_j = x_cl @ kernel + b
    np.testing.assert_allclose(np.moveaxis(y_j, -1, 1), y_t, atol=1e-5)


def test_forward_equivalence_after_flax_to_torch_to_flax_with_noise():
    """Converting perturbed torch weights back must change our model output
    (i.e. the converted leaves are actually wired into the forward pass)."""
    cfg, model, params = _tiny_params()
    x = jnp.ones((1, 8, 16, 3))
    t = jnp.ones((1,))
    y0 = model.apply(params, x, time=t)
    sd = sfno_flax_to_torch(jax.device_get(params))
    sd["blocks.0.filter.filter.weight"] = sd["blocks.0.filter.filter.weight"] + 0.5
    # converted checkpoints carry only "params"; SHT constants come from the
    # freshly-initialized template (same flow as interface._restore_params)
    consts = {k: v for k, v in params.items() if k != "params"}
    params2 = {**consts, **sfno_torch_to_flax(sd, num_layers=cfg.num_layers)}
    y1 = model.apply(params2, x, time=t)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # and unperturbed conversion reproduces the output exactly
    params3 = {**consts, **sfno_torch_to_flax(
        sfno_flax_to_torch(jax.device_get(params)), num_layers=cfg.num_layers)}
    y2 = model.apply(params3, x, time=t)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y2))


def test_strip_prefix_and_hparams_translation():
    sd = {"model.encoder.0.weight": 1, "model_ema.x": 2, "other": 3}
    assert strip_prefix(sd, "model.") == {"encoder.0.weight": 1}

    hparams = {
        "model_config": {"_target_": "src.models.sfno.sfnonet.SphericalFourierNeuralOperatorNet",
                         "embed_dim": 256, "num_layers": 8},
        "datamodule_config": {"_target_": "src.datamodules.fv3gfs_ensemble.FV3GFSEnsembleDataModule",
                              "horizon": 6},
        "diffusion_config": {"_target_": "src.diffusion.dyffusion.DYffusion",
                             "timesteps": 6, "forward_conditioning": "none"},
    }
    cfg = translate_reference_hparams(hparams)
    assert cfg["experiment"] == "dyffusion"
    assert cfg["model"]["kind"] == "sfno"
    assert cfg["model"]["embed_dim"] == 256
    assert cfg["datamodule"]["horizon"] == 6
    assert cfg["diffusion"]["forward_conditioning"] == "none"


def test_load_real_lightning_checkpoint_file(tmp_path):
    """End-to-end against a REAL torch-serialized Lightning checkpoint file
    (torch.save zip format, tensors in state_dict, hparams dict): load ->
    translate hparams -> convert weights -> our SFNO runs and matches the
    converted-parameter forward. This is the exact file format of the released
    hf:salv47/spherical-dyffusion ckpts (reference
    ckpts_from_huggingface_10years.yaml:19-37)."""
    cfg, model, params = _tiny_params()
    sd = sfno_flax_to_torch(jax.device_get(params))
    ckpt = {
        "state_dict": {f"model.{k}": torch.from_numpy(np.asarray(v))
                       for k, v in sd.items()},
        "hyper_parameters": {
            "model_config": {
                "_target_": "src.models.sfno.sfnonet.SphericalFourierNeuralOperatorNet",
                "embed_dim": cfg.embed_dim,
                "num_layers": cfg.num_layers,
                "activation_function": "gelu",
            },
            "diffusion_config": {"_target_": "src.diffusion.dyffusion.DYffusion",
                                 "timesteps": 6},
            "num_predictions": 5,
        },
        "epoch": 3,
        "global_step": 1234,
    }
    path = str(tmp_path / "last.ckpt")
    torch.save(ckpt, path)

    from spherical_dyffusion_tpu.utils.torch_convert import load_lightning_checkpoint

    sd2, hparams = load_lightning_checkpoint(path)
    assert all(isinstance(v, np.ndarray) for v in sd2.values())
    restored = sfno_torch_to_flax(strip_prefix(sd2, "model."),
                                  num_layers=cfg.num_layers)
    out_cfg = translate_reference_hparams(hparams)
    assert out_cfg["model"]["kind"] == "sfno"
    assert out_cfg["model"]["activation_function"] == "gelu_exact"
    assert out_cfg["experiment"] == "dyffusion"
    assert out_cfg["module"]["num_predictions"] == 5

    x = jnp.ones((1, 8, 16, 3))
    want = model.apply(params, x, time=jnp.ones((1,)), deterministic=True)
    # constants (SHT matrices) are not in checkpoints; merge with template
    full = {**jax.device_get(params), "params": restored["params"]}
    got = model.apply(full, x, time=jnp.ones((1,)), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
