"""Conversion between reference PyTorch SFNO checkpoints and our Flax params.

The reference publishes Lightning checkpoints on HuggingFace
(configs/inference/ckpts_from_huggingface_10years.yaml:19-37) whose
``state_dict`` holds the torch SFNO weights (sfnonet.py module tree) and whose
``hyper_parameters`` embed the model/datamodule/diffusion configs. This module
maps those to our channels-last Flax parameter tree:

* 1x1 convs (encoder/decoder/skips/MLP)  (co, ci, 1, 1) <-> Dense (ci, co)
* pos_embed                              (1, C, H, W)   <-> (1, H, W, C)
* spectral filter weights                (ci, co, l[, m], 2) — identical layout
* instance norms                         weight/bias    <-> scale/bias
* time embedding MLPs                    Linear (o, i)  <-> Dense (i, o)

Both directions are provided; ``roundtrip == identity`` is the structural
guarantee tested in tests/test_torch_convert.py. Loading a real published
checkpoint additionally uses :func:`load_lightning_checkpoint` (torch.load on
CPU) and :func:`translate_reference_hparams`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "sfno_torch_to_flax",
    "sfno_flax_to_torch",
    "load_lightning_checkpoint",
    "translate_reference_hparams",
    "strip_prefix",
]


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)[:, :, 0, 0].T


def _dense_to_conv1x1(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).T[:, :, None, None]


def _linear_to_dense(w: np.ndarray) -> np.ndarray:
    return np.asarray(w).T


def sfno_torch_to_flax(torch_sd: Dict[str, np.ndarray], num_layers: int,
                       encoder_layers: int = 1) -> Dict[str, Any]:
    """Map a torch SFNO state_dict (reference sfnonet.py naming) to our Flax
    ``params`` dict (models/sfno.py naming)."""
    sd = {k: np.asarray(v) for k, v in torch_sd.items()}
    p: Dict[str, Any] = {}

    def put(path: str, leaf: np.ndarray):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = leaf

    # encoder / decoder stacks (Sequential: conv at even indices)
    for i in range(encoder_layers):
        put(f"encoder_{i}/kernel", _conv1x1_to_dense(sd[f"encoder.{2*i}.weight"]))
        put(f"encoder_{i}/bias", sd[f"encoder.{2*i}.bias"])
        put(f"decoder_{i}/kernel", _conv1x1_to_dense(sd[f"decoder.{2*i}.weight"]))
        put(f"decoder_{i}/bias", sd[f"decoder.{2*i}.bias"])
    put("encoder_out/kernel", _conv1x1_to_dense(sd[f"encoder.{2*encoder_layers}.weight"]))
    put("decoder_out/kernel", _conv1x1_to_dense(sd[f"decoder.{2*encoder_layers}.weight"]))

    if "pos_embed" in sd:
        put("pos_embed", np.moveaxis(sd["pos_embed"], 1, -1))

    if "time_emb_mlp.1.weight" in sd:
        put("time_emb/Dense_0/kernel", _linear_to_dense(sd["time_emb_mlp.1.weight"]))
        put("time_emb/Dense_0/bias", sd["time_emb_mlp.1.bias"])
        put("time_emb/Dense_1/kernel", _linear_to_dense(sd["time_emb_mlp.3.weight"]))
        put("time_emb/Dense_1/bias", sd["time_emb_mlp.3.bias"])

    for n in range(num_layers):
        b = f"blocks.{n}."
        fb = f"block_{n}/"
        for norm in ("norm0", "norm1"):
            if b + norm + ".weight" in sd:
                put(fb + f"{norm}/scale", sd[b + norm + ".weight"])
                put(fb + f"{norm}/bias", sd[b + norm + ".bias"])
        if b + "time_mlp.1.weight" in sd:
            put(fb + "time_mlp/kernel", _linear_to_dense(sd[b + "time_mlp.1.weight"]))
            put(fb + "time_mlp/bias", sd[b + "time_mlp.1.bias"])
        # spectral filter (linear): weight layout matches ours exactly
        if b + "filter.filter.weight" in sd:
            put(fb + "filter/weight", sd[b + "filter.filter.weight"])
        if b + "filter.filter.bias" in sd:
            put(fb + "filter/bias", sd[b + "filter.filter.bias"].reshape(-1))
        if b + "inner_skip.weight" in sd:
            put(fb + "inner_skip/kernel", _conv1x1_to_dense(sd[b + "inner_skip.weight"]))
            put(fb + "inner_skip/bias", sd[b + "inner_skip.bias"])
        # MLP Sequential indices shift when dropout is present (fc2 at 3)
        fc2_idx = 3 if b + "mlp.fwd.3.weight" in sd else 2
        if b + "mlp.fwd.0.weight" in sd:
            put(fb + "mlp/Dense_0/kernel", _conv1x1_to_dense(sd[b + "mlp.fwd.0.weight"]))
            put(fb + "mlp/Dense_0/bias", sd[b + "mlp.fwd.0.bias"])
            put(fb + "mlp/Dense_1/kernel",
                _conv1x1_to_dense(sd[b + f"mlp.fwd.{fc2_idx}.weight"]))
            put(fb + "mlp/Dense_1/bias", sd[b + f"mlp.fwd.{fc2_idx}.bias"])
    return {"params": p}


def sfno_flax_to_torch(params: Dict[str, Any], encoder_layers: int = 1,
                       mlp_dropout: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of :func:`sfno_torch_to_flax` (used for validation and for
    exporting our checkpoints to reference-consumable form).

    ``mlp_dropout`` mirrors whether the torch MLP Sequential contains a
    Dropout module, which shifts fc2 from index 2 to 3 (the fc2_idx logic in
    :func:`sfno_torch_to_flax`); set it when exporting to a reference model
    built with mlp dropout > 0 so the roundtrip stays an identity."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for i in range(encoder_layers):
        sd[f"encoder.{2*i}.weight"] = _dense_to_conv1x1(p[f"encoder_{i}"]["kernel"])
        sd[f"encoder.{2*i}.bias"] = np.asarray(p[f"encoder_{i}"]["bias"])
        sd[f"decoder.{2*i}.weight"] = _dense_to_conv1x1(p[f"decoder_{i}"]["kernel"])
        sd[f"decoder.{2*i}.bias"] = np.asarray(p[f"decoder_{i}"]["bias"])
    sd[f"encoder.{2*encoder_layers}.weight"] = _dense_to_conv1x1(p["encoder_out"]["kernel"])
    sd[f"decoder.{2*encoder_layers}.weight"] = _dense_to_conv1x1(p["decoder_out"]["kernel"])
    if "pos_embed" in p:
        sd["pos_embed"] = np.moveaxis(np.asarray(p["pos_embed"]), -1, 1)
    if "time_emb" in p:
        sd["time_emb_mlp.1.weight"] = np.asarray(p["time_emb"]["Dense_0"]["kernel"]).T
        sd["time_emb_mlp.1.bias"] = np.asarray(p["time_emb"]["Dense_0"]["bias"])
        sd["time_emb_mlp.3.weight"] = np.asarray(p["time_emb"]["Dense_1"]["kernel"]).T
        sd["time_emb_mlp.3.bias"] = np.asarray(p["time_emb"]["Dense_1"]["bias"])
    n = 0
    while f"block_{n}" in p:
        blk = p[f"block_{n}"]
        b = f"blocks.{n}."
        for norm in ("norm0", "norm1"):
            if norm in blk:
                sd[b + norm + ".weight"] = np.asarray(blk[norm]["scale"])
                sd[b + norm + ".bias"] = np.asarray(blk[norm]["bias"])
        if "time_mlp" in blk:
            sd[b + "time_mlp.1.weight"] = np.asarray(blk["time_mlp"]["kernel"]).T
            sd[b + "time_mlp.1.bias"] = np.asarray(blk["time_mlp"]["bias"])
        if "filter" in blk:
            sd[b + "filter.filter.weight"] = np.asarray(blk["filter"]["weight"])
            if "bias" in blk["filter"]:
                sd[b + "filter.filter.bias"] = np.asarray(
                    blk["filter"]["bias"]
                ).reshape(1, -1, 1, 1)
        if "inner_skip" in blk:
            sd[b + "inner_skip.weight"] = _dense_to_conv1x1(blk["inner_skip"]["kernel"])
            sd[b + "inner_skip.bias"] = np.asarray(blk["inner_skip"]["bias"])
        if "mlp" in blk:
            fc2_idx = 3 if mlp_dropout else 2
            sd[b + "mlp.fwd.0.weight"] = _dense_to_conv1x1(blk["mlp"]["Dense_0"]["kernel"])
            sd[b + "mlp.fwd.0.bias"] = np.asarray(blk["mlp"]["Dense_0"]["bias"])
            sd[b + f"mlp.fwd.{fc2_idx}.weight"] = _dense_to_conv1x1(blk["mlp"]["Dense_1"]["kernel"])
            sd[b + f"mlp.fwd.{fc2_idx}.bias"] = np.asarray(blk["mlp"]["Dense_1"]["bias"])
        n += 1
    return sd


def load_lightning_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """torch.load a Lightning checkpoint on CPU; returns (state_dict as numpy,
    hyper_parameters)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt.get("state_dict", {}).items()}
    return sd, ckpt.get("hyper_parameters", {})


def translate_reference_hparams(hparams: Dict[str, Any]) -> Dict[str, Any]:
    """Best-effort translation of a reference checkpoint's hyper_parameters
    into our config dict schema (interface.py), covering the fields used by
    MultiStepStepper.from_state (stepper_multistep.py:228-295)."""
    out: Dict[str, Any] = {}
    model_cfg = dict(hparams.get("model_config", {}) or {})
    target = str(model_cfg.pop("_target_", ""))
    model_cfg.pop("_recursive_", None)
    if "sfno" in target.lower() or "fourier" in target.lower():
        model_cfg["kind"] = "sfno"
    elif "unet" in target.lower():
        model_cfg["kind"] = "unet"
    # torch nn.GELU is the exact erf form; our fast default is the tanh
    # approximation (30% faster end-to-end on TPU, differs ~1e-3). Reference
    # checkpoints must run the exact form for activation parity.
    if str(model_cfg.get("activation_function", "gelu")) == "gelu":
        model_cfg["activation_function"] = "gelu_exact"
    out["model"] = model_cfg

    dm_cfg = dict(hparams.get("datamodule_config", {}) or {})
    dm_cfg.pop("_target_", None)
    if dm_cfg:
        dm_cfg.setdefault("kind", "fv3gfs")
        out["datamodule"] = dm_cfg

    diff_cfg = dict(hparams.get("diffusion_config", {}) or {})
    dtar = str(diff_cfg.pop("_target_", ""))
    if diff_cfg:
        out["diffusion"] = diff_cfg
        out["experiment"] = "dyffusion"
    else:
        out["experiment"] = "interpolation"
    for key in ("num_predictions", "enable_inference_dropout"):
        if key in hparams:
            out.setdefault("module", {})[key] = hparams[key]
    return out
