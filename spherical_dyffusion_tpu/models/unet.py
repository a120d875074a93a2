"""ADM-style UNet backbone (channels-last Flax).

TPU-native counterpart of the reference UNet (src/models/unet.py:102-383) and
its modules (modules/attention.py, convs.py WeightStandardizedConv2d,
net_norm.py PreNorm): weight-standardized conv ResNet blocks with GroupNorm
and time scale-shift, linear attention along the down/up paths, full attention
at the bottleneck, optional outer resampler for odd grid sizes
(unet.py:157-167: e.g. (45, 90) -> (48, 96) so repeated halving works), and a
big input residual into the final block.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import QuantizedDropout, TimeEmbedMLP

__all__ = ["UNetConfig", "UNet"]


class WSConv(nn.Module):
    """Weight-standardized conv (reference convs.py:8-31): kernel is
    z-scored per output channel before the convolution."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        eps = 1e-5 if kernel.dtype == jnp.float32 else 1e-3
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class ChanLayerNorm(nn.Module):
    """Channel layer norm with scale only (reference unet.py LayerNorm:27-38)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        g = self.param("g", nn.initializers.ones, (self.dim,))
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


class ConvBlock(nn.Module):
    """WSConv -> GroupNorm -> (time scale-shift) -> SiLU -> dropout
    (reference Block, unet.py:44-67)."""

    features: int
    groups: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, scale_shift=None, deterministic: bool = True):
        x = WSConv(self.features)(x)
        x = nn.GroupNorm(num_groups=self.groups)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        x = nn.silu(x)
        if self.dropout > 0.0:
            x = QuantizedDropout(self.dropout)(x, deterministic=deterministic)
        return x


class ResnetBlock(nn.Module):
    """(reference ResnetBlock, unet.py:70-98)."""

    features: int
    groups: int = 8
    dropout1: float = 0.0
    dropout2: float = 0.0
    double_conv_layer: bool = True
    time_emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, time_emb=None, deterministic: bool = True):
        scale_shift = None
        if self.time_emb_dim is not None and time_emb is not None:
            emb = nn.silu(time_emb)
            emb = nn.Dense(self.features * 2)(emb)[:, None, None, :]
            scale_shift = jnp.split(emb, 2, axis=-1)
        h = ConvBlock(self.features, self.groups, self.dropout1)(
            x, scale_shift, deterministic
        )
        if self.double_conv_layer:
            h = ConvBlock(self.features, self.groups, self.dropout2)(
                h, None, deterministic
            )
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return h + x


def _split_heads(t, heads):
    B, H, W, C = t.shape
    return t.reshape(B, H * W, heads, C // heads)


class LinearAttention(nn.Module):
    """Linear attention (reference modules/attention.py:9-46, rescale='qkv')."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        h_in = x
        if self.dropout > 0.0:
            h_in = QuantizedDropout(self.dropout)(h_in, deterministic=deterministic)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(h_in)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.heads)  # (B, N, h, d)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)
        # rescale_qkv (attention.py:42-46)
        q = jax.nn.softmax(q, axis=-1) * self.dim_head**-0.5
        k = jax.nn.softmax(k, axis=1)
        v = v / (H * W)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        return nn.Conv(self.dim, (1, 1))(out)


class FullAttention(nn.Module):
    """Softmax attention over all pixels (reference Attention, attention.py:53-81)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.heads) * self.dim_head**-0.5
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        if self.dropout > 0.0:
            attn = QuantizedDropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(B, H, W, hidden)
        return nn.Conv(self.dim, (1, 1))(out)


class PreNormResidual(nn.Module):
    dim: int
    fn: nn.Module

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x + self.fn(ChanLayerNorm(self.dim)(x), deterministic=deterministic)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors reference configs/model/unet.yaml + Unet.__init__ kwargs."""

    img_shape: Tuple[int, int] = (180, 360)
    in_chans: int = 35
    out_chans: int = 35
    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    with_time_emb: bool = False
    time_dim_mult: int = 2
    block_dropout: float = 0.1
    block_dropout1: float = 0.1
    attn_dropout: float = 0.1
    input_dropout: float = 0.0
    double_conv_layer: bool = True
    outer_sample_mode: Optional[str] = None  # "nearest" | "bilinear"
    upsample_dims: Optional[Tuple[int, int]] = None
    keep_spatial_dims: bool = False
    init_kernel_size: int = 7
    dim_head: int = 32
    num_heads: int = 4
    debug_mode: bool = False

    def resolved(self) -> "UNetConfig":
        if self.debug_mode:
            return dataclasses.replace(self, dim=8, dim_mults=(1, 1, 1), debug_mode=False)
        return self


class UNet(nn.Module):
    """Call signature matches SFNO/BaseModel: (inputs, time, condition,
    static_condition) -> outputs, channels-last."""

    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        time: Optional[jax.Array] = None,
        condition: Optional[jax.Array] = None,
        static_condition: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg.resolved()
        conds = [c for c in (condition, static_condition) if c is not None]
        x = jnp.concatenate([inputs] + conds, axis=-1) if conds else inputs
        orig_shape = x.shape[1:3]

        if cfg.outer_sample_mode is not None and cfg.upsample_dims is not None:
            method = "nearest" if cfg.outer_sample_mode == "nearest" else "bilinear"
            x = jax.image.resize(
                x, (x.shape[0],) + tuple(cfg.upsample_dims) + (x.shape[-1],), method
            )

        k = cfg.init_kernel_size
        x = nn.Conv(cfg.dim, (k, k), padding="SAME", name="init_conv")(x)
        r = x
        if cfg.input_dropout > 0.0:
            x = QuantizedDropout(cfg.input_dropout)(x, deterministic=deterministic)
            r = QuantizedDropout(cfg.input_dropout)(r, deterministic=deterministic)

        t = None
        if cfg.with_time_emb:
            if time is None:
                raise ValueError("with_time_emb=True but no time given")
            t = TimeEmbedMLP(time_dim=cfg.dim * cfg.time_dim_mult, pos_emb_dim=cfg.dim,
                             name="time_emb")(time.astype(jnp.float32))

        dims = [cfg.dim] + [cfg.dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        block = lambda feats, name: ResnetBlock(  # noqa: E731
            feats, cfg.resnet_block_groups, cfg.block_dropout1, cfg.block_dropout,
            cfg.double_conv_layer, cfg.dim * cfg.time_dim_mult if cfg.with_time_emb else None,
            name=name,
        )

        hs = []
        for i, (dim_in, dim_out) in enumerate(in_out):
            is_last = i == len(in_out) - 1
            x = block(dim_in, f"down{i}_block1")(x, t, deterministic)
            hs.append(x)
            x = block(dim_in, f"down{i}_block2")(x, t, deterministic)
            x = PreNormResidual(
                dim_in,
                LinearAttention(dim_in, cfg.num_heads, cfg.dim_head, cfg.attn_dropout),
                name=f"down{i}_attn",
            )(x, deterministic)
            hs.append(x)
            if not is_last and not cfg.keep_spatial_dims:
                x = nn.Conv(dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                            name=f"down{i}_downsample")(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding="SAME", name=f"down{i}_conv")(x)

        mid = dims[-1]
        x = block(mid, "mid_block1")(x, t, deterministic)
        x = PreNormResidual(
            mid, FullAttention(mid, cfg.num_heads, cfg.dim_head, cfg.attn_dropout),
            name="mid_attn",
        )(x, deterministic)
        x = block(mid, "mid_block2")(x, t, deterministic)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block(dim_out, f"up{i}_block1")(x, t, deterministic)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = block(dim_out, f"up{i}_block2")(x, t, deterministic)
            x = PreNormResidual(
                dim_out,
                LinearAttention(dim_out, cfg.num_heads, cfg.dim_head, cfg.attn_dropout),
                name=f"up{i}_attn",
            )(x, deterministic)
            if not is_last and not cfg.keep_spatial_dims:
                B, Hc, Wc, Cc = x.shape
                x = jax.image.resize(x, (B, Hc * 2, Wc * 2, Cc), "nearest")
                x = nn.Conv(dim_in, (3, 3), padding="SAME", name=f"up{i}_upsample")(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding="SAME", name=f"up{i}_conv")(x)

        x = jnp.concatenate([x, r], axis=-1)
        if cfg.outer_sample_mode is not None and cfg.upsample_dims is not None:
            method = "nearest" if cfg.outer_sample_mode == "nearest" else "bilinear"
            x = jax.image.resize(
                x, (x.shape[0],) + tuple(orig_shape) + (x.shape[-1],), method
            )
        x = block(cfg.dim, "final_res_block")(x, t, deterministic)
        return nn.Conv(cfg.out_chans, (1, 1), name="final_conv")(x)
