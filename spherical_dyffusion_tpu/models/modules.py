"""Shared neural-net building blocks (channels-last, TPU layout).

TPU-native equivalents of the reference's src/models/modules/* and the
norm/MLP pieces of src/models/sfno/layers.py. All "1x1 convolutions" are
``nn.Dense`` over the trailing channel axis — on TPU that is a single MXU
matmul with channels in the lane dimension.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "InstanceNorm2d",
    "SpatialLayerNorm",
    "MLP2d",
    "SinusoidalTimeEmbedding",
    "TimeEmbedMLP",
    "DropPath",
    "get_activation",
]


def _gelu_exact(x: jax.Array) -> jax.Array:
    # torch nn.GELU() defaults to the EXACT erf form; flax nn.gelu defaults to
    # the tanh approximation, which differs at the ~1e-3 level — enough to
    # break checkpoint parity with the reference. The erf lowering is 30%
    # SLOWER end-to-end on TPU v5e (674 vs 970 sim-yr/day measured), so the
    # exact form is opt-in via activation_function="gelu_exact" — selected
    # automatically when loading reference-format checkpoints
    # (torch_convert.translate_reference_hparams).
    return nn.gelu(x, approximate=False)


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    acts = {
        "gelu": lambda x: nn.gelu(x, approximate=True),
        "gelu_exact": _gelu_exact,
        "relu": nn.relu,
        "silu": nn.silu,
        "tanh": jnp.tanh,
    }
    if name not in acts:
        raise ValueError(f"Unknown activation {name!r}")
    return acts[name]


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over the spatial dims.

    Equivalent of the reference's ``nn.InstanceNorm2d(affine=True, eps=1e-6,
    track_running_stats=False)`` (sfnonet.py:640-647), in (B, H, W, C) layout.
    Under spatial (h/w mesh-axis) sharding the mean/var reductions become XLA
    partial reductions + psum automatically via pjit — no DistributedInstanceNorm
    class is needed.
    """

    features: int
    eps: float = 1e-6
    affine: bool = True
    # exact=False: one-pass statistics — mean(x) and mean(x^2) are sibling
    # reductions XLA fuses into a single sweep over HBM, and dropping the
    # sequential mean->var dependency lets the per-layer pipeline fuse
    # (+15% end-to-end measured). Cancellation error grows as
    # (mean/std)^2 * eps_f32 — negligible for |mean|/std < ~30, which covers
    # trained activations; exact=True restores the two-pass
    # mean(square(x - mean)) form, bit-matching torch for loaded reference
    # checkpoints (auto-selected by the ckpt translator, like gelu_exact).
    exact: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, fold: bool = False):
        """``fold=True`` returns the per-(batch, channel) affine pair
        ``(A, B)`` with ``norm(x) == x * A + B`` (f32, shape (B, 1, 1, C))
        instead of the normalized tensor — one stats sweep over x, no
        materialized output. Consumed by the fused block-tail kernel
        (ops/fused_mlp.py:fused_block_tail), which applies the fold
        in-register; param tree identical to the standard path."""
        dtype = x.dtype
        xf = x.astype(jnp.float32)  # fp32 statistics under mixed precision
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        if self.exact:
            # biased variance, matching torch InstanceNorm
            var = jnp.mean(jnp.square(xf - mean), axis=(-3, -2), keepdims=True)
        else:
            mean_sq = jnp.mean(jnp.square(xf), axis=(-3, -2), keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
        else:
            scale, bias = jnp.ones(self.features), jnp.zeros(self.features)
        if fold:
            return rstd * scale, bias - mean * rstd * scale
        y = (xf - mean) * rstd
        if self.affine:
            y = y * scale + bias
        return y.astype(dtype)


class SpatialLayerNorm(nn.Module):
    """LayerNorm over the spatial dims with per-pixel affine params.

    Equivalent of the reference's ``nn.LayerNorm(normalized_shape=(H, W))``
    option (sfnonet.py:625-631): normalizes each (H, W) slice jointly and
    applies per-(H, W) learned scale/bias shared across channels.
    """

    spatial_shape: Sequence[int]
    eps: float = 1e-6
    exact: bool = False  # see InstanceNorm2d.exact

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (..., H, W, C) — normalize jointly over (H, W) per channel slice.
        # One-pass sibling reductions by default (see InstanceNorm2d note);
        # f32 statistics under mixed precision (one-pass cancellation in
        # bf16 would clamp var to 0 for even modest |mean|/std).
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        if self.exact:
            var = jnp.mean(jnp.square(xf - mean), axis=(-3, -2), keepdims=True)
        else:
            mean_sq = jnp.mean(jnp.square(xf), axis=(-3, -2), keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        h, w = self.spatial_shape
        scale = self.param("scale", nn.initializers.ones, (h, w, 1))
        bias = self.param("bias", nn.initializers.zeros, (h, w, 1))
        return (y * scale + bias).astype(dtype)


class QuantizedDropout(nn.Module):
    """Inverted dropout drawing 8 random bits per element instead of 32.

    ``nn.Dropout`` -> ``jax.random.bernoulli`` draws a float32 uniform (32
    RNG bits) per element; at (B, 180, 360, 512) the mask generation alone is
    ~10% of the inference window program's device time (measured — the
    rng-bit-generator category). Comparing uint8 bits against
    ``round(keep * 256)`` needs a quarter of the RNG bytes. The keep
    probability is quantized to 1/256 steps and the rescale uses the exact
    quantized keep (t/256), so E[output] == input exactly (standard inverted
    dropout). Reference analog: plain ``nn.Dropout(p)`` (s2convolutions /
    layers) — random streams differ across frameworks anyway; only the rate
    matters, and the quantization error is < 0.4% relative.
    """

    rate: float
    # exact=True restores float-bernoulli dropout at the EXACT rate (no
    # 1/256 quantization) — auto-selected by translate_reference_hparams for
    # loaded reference checkpoints, whose operative spread mechanism is
    # inference-time interpolator dropout (reference dyffusion.py:226-240):
    # ensemble statistics with real ckpts must not see a <=0.4% rate shift.
    exact: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate <= 0.0:
            return x
        if self.exact:
            return nn.Dropout(self.rate)(x, deterministic=False)
        t = int(round((1.0 - self.rate) * 256))
        if t >= 256:  # rate < 1/512 rounds to keep-everything
            return x
        if t <= 0 or x.shape[-1] % 4:
            return nn.Dropout(self.rate)(x, deterministic=False)
        key = self.make_rng("dropout")
        bits8 = jax.random.bits(key, x.shape, jnp.uint8)
        keep = t / 256.0
        return jnp.where(bits8 < jnp.uint8(t), x / keep, jnp.zeros_like(x))


class _DenseParams(nn.Module):
    """Parameter-only twin of ``nn.Dense``: declares kernel/bias with the
    SAME names/shapes/inits so the fused-MLP kernel path shares checkpoints
    with the standard path bit-for-bit."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.truncated_normal(0.02),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MLP2d(nn.Module):
    """Pointwise 2-layer MLP (the reference's MLP of 1x1 convs, layers.py:53).

    ``fused=True`` routes through the Pallas VMEM-resident kernel
    (ops/fused_mlp.py): one pass instead of GEMM / materialize hidden to HBM
    / GEMM, with QuantizedDropout's exact math in-kernel. Inference-only (no
    AD rule) and incompatible with ``exact_dropout``; params are identical
    either way (``_DenseParams`` mirrors ``nn.Dense``'s tree)."""

    hidden_features: int
    out_features: int
    activation: str = "gelu"
    drop_rate: float = 0.0
    dtype: Any = None  # compute dtype (params stay float32)
    exact_dropout: bool = False  # see QuantizedDropout.exact
    fused: bool = False
    fused_tile_rows: int = 1024  # rows per Pallas block of the fused kernel

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 residual: Optional[jax.Array] = None,
                 affine: Optional[tuple] = None) -> jax.Array:
        """``affine``: optional per-(batch, channel) ``(A, B)`` pair — x is
        then the PRE-norm tensor and the kernel applies ``x * A + B``
        in-register before the first GEMM (the boundary-corrected block tail,
        ops/fused_mlp.py:fused_block_tail). On the non-fused fallback the
        fold is applied by XLA first (numerically equivalent)."""
        drop_active = self.drop_rate > 0.0 and not deterministic
        t = int(round((1.0 - self.drop_rate) * 256))
        interpret = jax.default_backend() == "cpu"
        use_fused = (self.fused and not self.exact_dropout
                     and self.activation in ("gelu", "gelu_exact")
                     and (not drop_active or 0 < t)
                     # in-kernel PRNG has no CPU interpreter; use the
                     # standard path there (params are shared, so safe)
                     and not (interpret and drop_active))
        if use_fused:
            from ..ops.fused_mlp import (
                FUSED_MLP_AVAILABLE,
                fused_block_tail,
                fused_mlp,
            )
        if use_fused and FUSED_MLP_AVAILABLE:
            w1, b1 = _DenseParams(self.hidden_features,
                                  name="Dense_0")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_features,
                                  name="Dense_1")(self.hidden_features)
            rng = self.make_rng("dropout") if drop_active else None
            if affine is not None:
                return fused_block_tail(
                    x.astype(self.dtype or x.dtype), affine[0], affine[1],
                    w1, b1, w2, b2, residual=residual, rng=rng,
                    drop_rate=self.drop_rate if drop_active else 0.0,
                    exact_gelu=self.activation == "gelu_exact",
                    tile_rows=self.fused_tile_rows,
                    interpret=interpret,
                )
            return fused_mlp(
                x.astype(self.dtype or x.dtype), w1, b1, w2, b2,
                residual=residual, rng=rng,
                drop_rate=self.drop_rate if drop_active else 0.0,
                exact_gelu=self.activation == "gelu_exact",
                tile_rows=self.fused_tile_rows,
                interpret=interpret,
            )
        if affine is not None:
            x = (x.astype(jnp.float32) * affine[0] + affine[1]).astype(
                self.dtype or x.dtype)
        act = get_activation(self.activation)
        y = nn.Dense(self.hidden_features, dtype=self.dtype, name="Dense_0",
                     kernel_init=nn.initializers.truncated_normal(0.02))(x)
        y = act(y)
        if self.drop_rate > 0.0:
            y = QuantizedDropout(self.drop_rate, exact=self.exact_dropout)(
                y, deterministic=deterministic)
        y = nn.Dense(self.out_features, dtype=self.dtype, name="Dense_1",
                     kernel_init=nn.initializers.truncated_normal(0.02))(y)
        if self.drop_rate > 0.0:
            y = QuantizedDropout(self.drop_rate, exact=self.exact_dropout)(
                y, deterministic=deterministic)
        return y + residual if residual is not None else y


class SinusoidalTimeEmbedding(nn.Module):
    """Transformer-style sinusoidal embedding of a scalar time.

    Matches the reference SinusoidalPosEmb (modules/misc.py:21-33):
    frequencies exp(-log(10000) * i / (half_dim - 1)).
    """

    dim: int

    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1))
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbedMLP(nn.Module):
    """Sinusoidal embedding followed by a 2-layer MLP.

    Matches reference ``get_time_embedder`` (modules/misc.py:132-147):
    SinusoidalPosEmb(dim) -> Linear(dim, time_dim) -> GELU -> Linear(time_dim, time_dim).
    """

    time_dim: int
    pos_emb_dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = SinusoidalTimeEmbedding(self.pos_emb_dim)(t)
        emb = nn.Dense(self.time_dim, kernel_init=nn.initializers.truncated_normal(0.02))(emb)
        emb = _gelu_exact(emb)
        emb = nn.Dense(self.time_dim, kernel_init=nn.initializers.truncated_normal(0.02))(emb)
        return emb


class DropPath(nn.Module):
    """Stochastic depth (reference modules/drop_path.py:25): drops the entire
    residual branch per sample with probability ``rate``."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 rate: Optional[jax.Array] = None) -> jax.Array:
        """``rate`` (a traced scalar) overrides the static attribute — used
        by the scan-layers path where each scanned iteration carries its own
        stochastic-depth rate as a lax.scan input."""
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        keep = 1.0 - (self.rate if rate is None else rate)
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        # rescale in x.dtype: a traced `rate` (scan-layers xs) is a strong f32
        # scalar and `x / keep` would promote bf16 activations to f32 —
        # breaking the blocks_mid scan's carry dtype under mixed precision
        scale = jnp.asarray(1.0 / keep, x.dtype)
        return jnp.where(mask, x * scale, jnp.zeros_like(x))
