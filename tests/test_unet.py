"""UNet backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.models import UNet, UNetConfig


def test_unet_forward_even_grid():
    cfg = UNetConfig(img_shape=(32, 64), in_chans=3, out_chans=3, dim=8,
                     dim_mults=(1, 2), with_time_emb=True)
    model = UNet(cfg)
    x = jnp.ones((2, 32, 64, 3))
    t = jnp.asarray([1.0, 2.0])
    params = model.init(jax.random.PRNGKey(0), x, time=t)
    y = model.apply(params, x, time=t)
    assert y.shape == (2, 32, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_unet_odd_grid_with_outer_resampler():
    """The reference handles odd grids by resampling to a 2^k-divisible size
    (unet.py:157-167)."""
    cfg = UNetConfig(img_shape=(45, 90), in_chans=2, out_chans=2, dim=8,
                     dim_mults=(1, 2, 4), outer_sample_mode="bilinear",
                     upsample_dims=(48, 96))
    model = UNet(cfg)
    x = jnp.ones((1, 45, 90, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 45, 90, 2)


def test_unet_condition_and_dropout_stochasticity():
    cfg = UNetConfig(img_shape=(16, 32), in_chans=2, out_chans=2, dim=8,
                     dim_mults=(1, 2), block_dropout=0.3, block_dropout1=0.3,
                     attn_dropout=0.2)
    model = UNet(cfg)
    x = jnp.ones((2, 16, 32, 2))
    cond = jnp.ones((2, 16, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x, condition=cond)
    y1 = model.apply(params, x, condition=cond, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, x, condition=cond, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert y1.shape == (2, 16, 32, 2)


def test_unet_debug_mode():
    cfg = UNetConfig(img_shape=(16, 32), in_chans=2, out_chans=2, dim=64,
                     dim_mults=(1, 2, 4, 8), debug_mode=True)
    model = UNet(cfg)
    x = jnp.ones((1, 16, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    # debug mode shrinks to dim 8 and 3 stages (reference unet.py:139-141)
    assert params["params"]["init_conv"]["kernel"].shape[-1] == 8
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 2)


def test_unet_grad_flows():
    cfg = UNetConfig(img_shape=(16, 32), in_chans=2, out_chans=2, dim=8, dim_mults=(1, 2))
    model = UNet(cfg)
    x = jnp.ones((1, 16, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0
