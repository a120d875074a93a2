"""Spherical Fourier Neural Operator — TPU-native, channels-last Flax model.

Re-design of the reference SFNO (src/models/sfno/sfnonet.py:340-841 and
s2convolutions.py:45-193) for JAX/XLA on TPU:

* layout is (B, H, W, C): every pointwise conv is an MXU matmul over the lane
  (channel) dimension; the SHT Legendre stage is a batched MXU matmul;
* transforms (SHT/FFT) are precomputed constants, run in float32 (the
  reference likewise pins fp32 around the transforms);
* the spectral dhconv/diagonal contraction is an explicit real-decomposed
  batched matmul (ops/contractions.py);
* gradient checkpointing maps to ``nn.remat`` over blocks;
* no "Distributed*" twin classes: spatial/channel sharding is applied from the
  outside via pjit sharding constraints (see parallel/).

Structure parity with the reference (sfnonet.py):
  encoder (1x1 MLP) -> +pos_embed -> N x FNO block -> big-skip concat -> decoder
with each block = norm0 -> (time scale-shift) -> spectral filter -> inner skip
-> act -> norm1 -> MLP -> drop-path -> outer skip (on the filter residual).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import InverseRealSHT, RealSHT, RealFFT2, InverseRealFFT2, contract
from ..ops.contractions import (
    contract_dhconv_cp,
    contract_dhconv_stacked,
    contract_dhconv_stacked4,
    contract_dhconv_tt,
    contract_dhconv_tucker,
    cp_spatial_expand,
    cp_spatial_project,
    cp_spectral_scale_stacked,
    tucker_rank_kernel,
    tucker_spectral_mix_stacked,
)
from .modules import (
    DropPath,
    InstanceNorm2d,
    MLP2d,
    QuantizedDropout,
    SpatialLayerNorm,
    TimeEmbedMLP,
    get_activation,
)

__all__ = ["SFNOConfig", "SFNO"]


@dataclasses.dataclass(frozen=True)
class SFNOConfig:
    """Static configuration of the SFNO (mirrors reference configs/model/sfno.yaml)."""

    img_shape: Tuple[int, int] = (180, 360)
    in_chans: int = 35
    out_chans: int = 35
    embed_dim: int = 256
    num_layers: int = 8
    scale_factor: int = 1
    spectral_transform: str = "sht"  # "sht" | "fft"
    filter_type: str = "linear"  # "linear" | "non-linear"
    # "dhconv" | "diagonal" (linear filter); "l-dependant" additionally valid
    # with filter_type="non-linear" (per-degree spectral-attention weights)
    operator_type: str = "dhconv"
    separable: bool = False
    mlp_ratio: float = 2.0
    use_mlp: bool = True
    activation_function: str = "gelu"
    encoder_layers: int = 1
    pos_embed: bool = True
    big_skip: bool = True
    normalization_layer: str = "instance_norm"  # "instance_norm" | "layer_norm" | "none"
    # exact two-pass norm statistics (torch-bit-matching) instead of the
    # one-pass fused form (+15% end-to-end); auto-selected True for loaded
    # reference checkpoints by the ckpt translator, like gelu_exact
    exact_norm: bool = False
    # exact float-bernoulli dropout (no 1/256 rate quantization); auto-selected
    # True for loaded reference checkpoints — dropout is the reference's
    # operative ensemble-spread mechanism (dyffusion.py:226-240), so real-ckpt
    # ensemble statistics must see the exact rate (gelu_exact pattern)
    exact_dropout: bool = False
    hard_thresholding_fraction: float = 1.0
    # route the block MLP through the Pallas VMEM-resident fused kernel
    # (ops/fused_mlp.py): removes the hidden tensor's HBM round trip and the
    # outer-skip read-modify-write. Inference-only (no AD rule; the trainer
    # keeps the standard path); incompatible with exact_dropout.
    fused_mlp: bool = False
    # row-tile size of the fused kernel's grid (B*H*W rows per Pallas block)
    fused_mlp_tile_rows: int = 1024
    # round-5 boundary-corrected variant: extend the fused kernel UPSTREAM to
    # norm1-apply + time-scale-shift (folded to one per-(batch,channel)
    # affine by InstanceNorm2d(fold=True)) so the kernel's entry sits at a
    # fusion-natural point and the normalized tensor never exists in HBM —
    # addresses loss mechanism #2 of results/fused_mlp/README.md. Implies the
    # MLP+skip fusion of fused_mlp; requires instance_norm. Inference-only.
    fused_tail: bool = False
    # compile the homogeneous MIDDLE blocks (1..num_layers-2; first/last keep
    # the data-grid transforms and stay unrolled) as ONE lax.scan body with
    # stacked params: the compiled program carries one block body instead of
    # num_layers-2, shrinking compile time and remote-compile payloads
    # roughly linearly in depth. Param layout changes (block_1..block_{L-2}
    # fold into blocks_mid/block with a leading layer axis);
    # utils/params.py:{stack,unstack}_block_params convert existing
    # checkpoints both ways. Per-layer stochastic-depth rates ride as scan
    # inputs, so drop_path_rate > 0 is supported.
    scan_layers: bool = False
    dropout_mlp: float = 0.0
    dropout_filter: float = 0.0
    pos_emb_dropout: float = 0.0
    drop_path_rate: float = 0.0
    checkpointing: int = 0  # 0: none, >=1: remat encoder/decoder, >=3: remat blocks
    data_grid: str = "equiangular"  # grid of the data; model grid is legendre-gauss
    # time conditioning (used when SFNO is a diffusion backbone)
    with_time_emb: bool = False
    time_dim_mult: int = 2
    time_rescale: bool = False
    time_scale_shift_before_filter: bool = True
    min_time: float = 0.0
    max_time: float = 1000.0
    # factorized spectral weights (reference tltorch, s2convolutions.py:133-143)
    factorization: Optional[str] = None  # None | "cp" | "tucker" | "tt"
    rank: float = 1.0
    # CP/Tucker rank-space spectral pipeline (SpectralConvS2.rank_pipeline):
    # run the SHT/ISHT at 2R channels with the factor projections moved to
    # grid space — mathematically identical, ~half the transform bytes/FLOPs
    # at R = c/4 (measured +14.8% at CP rank 0.25, embed 256, v5e)
    rank_pipeline: bool = True
    # spectral attention (filter_type == "non-linear")
    spectral_layers: int = 3
    complex_activation: str = "real"
    # mixed precision: activations/matmuls in this dtype, SHT pinned to fp32
    # (matching the reference's fp32-forced transforms under autocast,
    # s2convolutions.py:164-191); params stay float32
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # SHT/contraction matmul input dtype: float32 is reference-faithful;
    # bfloat16 gives ~8x MXU throughput with fp32 accumulation
    sht_matmul_dtype: str = "float32"
    # spectral-pipeline IO dtype: "" materializes every spectral intermediate
    # at float32 (complex64 pairs); "bfloat16" routes the dense dhconv through
    # the stacked real layout and emits every SHT/dhconv/ISHT stage in bf16 —
    # numerically identical on the main path under sht_matmul_dtype=bfloat16
    # (each GEMM already rounds its inputs to bf16) while halving the HBM
    # bytes of the dominant (l, m, c, 2) intermediates (results/roofline)
    spectral_io_dtype: str = ""
    # longitude stage of the SHT: "matmul" (explicit DFT on the MXU, ~2x
    # faster than XLA's TPU FFT lowering at climate grids) or "fft" (jnp.fft
    # — preferable on CPU where the DFT matmul is the FLOP hot spot)
    lon_method: str = "matmul"
    # even/odd latitude symmetry folding in the Legendre stage (2x fewer FLOPs)
    sht_fold_symmetry: bool = False
    # route dense dhconv contractions through the fused Pallas kernel
    # (ops/pallas_contractions.py); interpret mode off-TPU
    use_pallas: bool = False
    # merged single-GEMM dhconv on the stacked real layout (see
    # SpectralConvS2.merged_dhconv — measured ~3% slower at paper scale,
    # opt-in for other shapes)
    merged_dhconv: bool = False
    # debug mode shrinks the model like the reference (sfnonet.py:468-471)
    debug_mode: bool = False

    def resolved(self) -> "SFNOConfig":
        if self.debug_mode:
            return dataclasses.replace(self, embed_dim=16, num_layers=2, debug_mode=False)
        return self

    @property
    def model_shape(self) -> Tuple[int, int]:
        return (
            self.img_shape[0] // self.scale_factor,
            self.img_shape[1] // self.scale_factor,
        )

    @property
    def modes(self) -> Tuple[int, int]:
        h, w = self.model_shape
        return (
            int(h * self.hard_thresholding_fraction),
            int((w // 2 + 1) * self.hard_thresholding_fraction),
        )


def _build_transforms(cfg: SFNOConfig):
    """Build (trans_down, itrans_up, trans, itrans): data-grid transforms for the
    first/last block and model-grid (legendre-gauss) transforms for the inner
    blocks, mirroring sfnonet.py:551-554."""
    lmax, mmax = cfg.modes
    H, W = cfg.img_shape
    h, w = cfg.model_shape
    if cfg.spectral_transform == "sht":
        import dataclasses as _dc

        md = cfg.sht_matmul_dtype
        lm = cfg.lon_method
        trans_down = RealSHT.create(H, W, lmax, mmax, grid=cfg.data_grid,
                                    matmul_dtype=md, lon_method=lm)
        itrans_up = InverseRealSHT.create(H, W, lmax, mmax, grid=cfg.data_grid,
                                          matmul_dtype=md, lon_method=lm)
        trans = RealSHT.create(h, w, lmax, mmax, grid="legendre-gauss",
                               matmul_dtype=md, lon_method=lm)
        itrans = InverseRealSHT.create(h, w, lmax, mmax, grid="legendre-gauss",
                                       matmul_dtype=md, lon_method=lm)
        if cfg.sht_fold_symmetry:
            trans_down = _dc.replace(trans_down, fold_symmetry=True)
            itrans_up = _dc.replace(itrans_up, fold_symmetry=True)
            trans = _dc.replace(trans, fold_symmetry=True)
            itrans = _dc.replace(itrans, fold_symmetry=True)
    elif cfg.spectral_transform == "fft":
        trans_down = RealFFT2.create(H, W, lmax, mmax)
        itrans_up = InverseRealFFT2.create(H, W, lmax, mmax)
        trans = RealFFT2.create(h, w, lmax, mmax)
        itrans = InverseRealFFT2.create(h, w, lmax, mmax)
    else:
        raise ValueError(f"Unknown spectral transform {cfg.spectral_transform!r}")
    return trans_down, itrans_up, trans, itrans


class SpectralConvS2(nn.Module):
    """Linear spectral filter: SHT -> per-mode weight -> ISHT (+ bias).

    Mirrors reference SpectralConvS2 (s2convolutions.py:45-193). Returns
    ``(filtered, residual)`` where residual is the input regridded through
    ISHT(SHT(x)) when in/out grids differ, else the input itself.
    """

    forward_transform: Any
    inverse_transform: Any
    in_channels: int
    out_channels: int
    operator_type: str = "dhconv"
    separable: bool = False
    use_bias: bool = True
    fwd_key: str = ""  # "data" | "model" | "" (no external matrices)
    inv_key: str = ""
    matmul_dtype: str = ""  # "" -> float32 contraction
    factorization: str = ""  # "" (dense) | "cp" | "tucker" | "tt"
    rank: float = 1.0  # factorization rank as a fraction of min(ci, co)
    use_pallas: bool = False  # fused Pallas dhconv kernel (dense, non-separable)
    # single merged batched GEMM for the dhconv on the stacked (..., c, 2)
    # layout (contract_dhconv_stacked). Measured ~3% SLOWER end-to-end than
    # the four-GEMM decomposition at 180x360/embed-256 on v5e (window 5.6s vs
    # 5.4-5.5s): XLA overlaps the four smaller GEMMs better than it tiles the
    # one big one. Kept opt-in for other shapes/hardware.
    merged_dhconv: bool = False
    # spectral-pipeline IO dtype (see SFNOConfig.spectral_io_dtype)
    io_dtype: str = ""
    # rank-space spectral pipeline for CP/Tucker weights: the factor channel
    # projections commute with the SHT, so the whole SHT -> per-l rank op ->
    # ISHT runs at 2R channels instead of ci/co (half the transform
    # bytes/FLOPs at R=c/4) and the per-l dhconv GEMM shrinks to an
    # elementwise scale (CP) or a tiny R->R GEMM (Tucker). Mathematically
    # identical to the spectral-space contraction (equivalence-tested);
    # measured +14.8% end-to-end at CP rank 0.25 / embed 256 on v5e. Falls
    # back when the in/out grids differ (the residual regrid needs
    # full-channel transforms anyway) or when 2R > min(ci, co).
    rank_pipeline: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mats=None) -> tuple[jax.Array, jax.Array]:
        dtype = x.dtype
        fwd_m = mats[f"analysis_{self.fwd_key}"] if (mats and self.fwd_key) else None
        inv_m = mats[f"synthesis_{self.inv_key}"] if (mats and self.inv_key) else None
        fwd_d = mats.get(f"dft_fwd_{self.fwd_key}") if (mats and self.fwd_key) else None
        inv_d = mats.get(f"dft_inv_{self.inv_key}") if (mats and self.inv_key) else None
        lmax, mmax = self.forward_transform.lmax, self.forward_transform.mmax
        scale = 1.0 / (self.in_channels * self.out_channels)
        if self.factorization:
            if self.operator_type != "dhconv":
                raise NotImplementedError("factorizations implemented for dhconv")
            R = max(1, int(self.rank * min(self.in_channels, self.out_channels)))
            init = nn.initializers.normal(stddev=scale ** (1.0 / 3.0))
            if self.factorization == "cp":
                weight = {
                    "A": self.param("cp_A", init, (self.in_channels, R, 2)),
                    "B": self.param("cp_B", init, (self.out_channels, R, 2)),
                    "C": self.param("cp_C", init, (lmax, R, 2)),
                }
            elif self.factorization == "tucker":
                weight = {
                    "A": self.param("tucker_A", init, (self.in_channels, R, 2)),
                    "B": self.param("tucker_B", init, (self.out_channels, R, 2)),
                    "C": self.param("tucker_C", init, (lmax, R, 2)),
                    "core": self.param("tucker_core", init, (R, R, R, 2)),
                }
            elif self.factorization == "tt":
                weight = {
                    "G1": self.param("tt_G1", init, (self.in_channels, R, 2)),
                    "G2": self.param("tt_G2", init, (R, self.out_channels, R, 2)),
                    "G3": self.param("tt_G3", init, (R, lmax, 2)),
                }
            else:
                raise ValueError(f"Unknown factorization {self.factorization!r}")
        else:
            wshape = [self.in_channels]
            if not self.separable:
                wshape.append(self.out_channels)
            wshape.append(lmax)
            if self.operator_type == "diagonal":
                wshape.append(mmax)
            weight = self.param(
                "weight",
                nn.initializers.normal(stddev=scale),
                tuple(wshape) + (2,),
            )

        residual = x
        scale_residual = (
            self.forward_transform.nlat != self.inverse_transform.nlat
            or self.forward_transform.nlon != self.inverse_transform.nlon
            or self.forward_transform.grid != self.inverse_transform.grid
        )

        # rank-space pipeline (see the field docstring): project channels to
        # rank in grid space, transform 2R channels, per-l rank-space op
        # (elementwise scale for CP, tiny R->R GEMM for Tucker),
        # inverse-transform 2R channels, expand in grid space
        if (
            self.rank_pipeline
            and self.factorization in ("cp", "tucker")
            and self.operator_type == "dhconv"
            and not self.separable
            and not scale_residual
            and isinstance(self.forward_transform, RealSHT)
            and isinstance(self.inverse_transform, InverseRealSHT)
            # transforms run at 2R channels: only cheaper than the ci/co
            # spectral-space form when the rank is below half the width
            and 2 * R <= min(self.in_channels, self.out_channels)
        ):
            md = self.matmul_dtype or None
            io = jnp.dtype(self.io_dtype) if self.io_dtype else None
            z = cp_spatial_project(x.astype(jnp.float32), weight["A"], md,
                                   out_dtype=io)
            zs = self.forward_transform(z, fwd_m, fwd_d, stacked=True,
                                        out_dtype=io)
            if self.factorization == "cp":
                t = cp_spectral_scale_stacked(zs, weight["C"])
            else:
                K = tucker_rank_kernel(weight["core"], weight["C"])
                t = tucker_spectral_mix_stacked(zs, K, md, out_dtype=io)
            g = self.inverse_transform(t, inv_m, inv_d, out_dtype=io)
            out = cp_spatial_expand(g, weight["B"], md, out_dtype=io)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
                out = out + bias
            return out.astype(dtype), residual

        # fused stacked pipeline: for the dense dhconv the SHT emits the
        # (..., l, m, c, 2) real layout, the contraction stays on real pairs
        # (merged single GEMM, or four GEMMs under spectral_io_dtype — the
        # four-GEMM schedule measured faster at paper scale), and the ISHT
        # consumes the stacked result — no complex values anywhere
        stackable = (
            not self.factorization
            and self.operator_type == "dhconv"
            and not self.separable
            and not self.use_pallas
            and isinstance(self.forward_transform, RealSHT)
            and isinstance(self.inverse_transform, InverseRealSHT)
        )
        use_stacked = stackable and (self.merged_dhconv or bool(self.io_dtype))
        io = jnp.dtype(self.io_dtype) if (self.io_dtype and use_stacked) else None
        xs = self.forward_transform(x.astype(jnp.float32), fwd_m, fwd_d,
                                    stacked=True, out_dtype=io) if use_stacked \
            else self.forward_transform(x.astype(jnp.float32), fwd_m, fwd_d)
        if scale_residual:
            residual = self.inverse_transform(xs, inv_m, inv_d).astype(dtype)

        if use_stacked and self.merged_dhconv:
            xs = contract_dhconv_stacked(xs, weight,
                                         matmul_dtype=self.matmul_dtype or None,
                                         out_dtype=io)
        elif use_stacked:
            xs = contract_dhconv_stacked4(xs, weight,
                                          matmul_dtype=self.matmul_dtype or None,
                                          out_dtype=io)
        elif self.factorization == "cp":
            xs = contract_dhconv_cp(xs, weight, matmul_dtype=self.matmul_dtype or None)
        elif self.factorization == "tucker":
            xs = contract_dhconv_tucker(xs, weight)
        elif self.factorization == "tt":
            xs = contract_dhconv_tt(xs, weight)
        else:
            xs = contract(xs, weight, self.operator_type, self.separable,
                          matmul_dtype=self.matmul_dtype or None,
                          use_pallas=self.use_pallas)
        out = self.inverse_transform(xs, inv_m, inv_d, out_dtype=io)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + bias
        return out.astype(dtype), residual


class SpectralAttentionS2(nn.Module):
    """Non-linear spectral filter: complex MLP acting per spectral mode.

    TPU-native counterpart of reference SpectralAttentionS2
    (s2convolutions.py:279-436): an N-layer complex MLP with residual and a
    complex activation, applied in SHT space, followed by ISHT.

    ``operator_type``: "diagonal" shares one complex MLP across all modes;
    "l-dependant" gives every spherical-harmonic degree l its own weight
    matrices (reference s2convolutions.py:352-378 — weights gain a leading
    modes_lat axis; the contraction becomes a per-l batched GEMM, which XLA
    tiles onto the MXU as one einsum).
    """

    forward_transform: Any
    inverse_transform: Any
    embed_dim: int
    hidden_size_factor: float = 2.0
    spectral_layers: int = 3
    complex_activation: str = "real"
    operator_type: str = "diagonal"
    drop_rate: float = 0.0
    fwd_key: str = ""
    inv_key: str = ""

    def _complex_act(self, zr: jax.Array, zi: jax.Array):
        # "real"/"cartesian" are the reference ComplexReLU semantics
        # (activations.py:40-61: LeakyReLU(0)=ReLU on the real part resp. on
        # both parts) — checkpoint-conversion parity depends on this.
        # "complex" (gelu on both parts) is this repo's smooth extension.
        if self.complex_activation == "real":
            return nn.relu(zr), zi
        if self.complex_activation == "cartesian":
            return nn.relu(zr), nn.relu(zi)
        if self.complex_activation == "complex":
            return nn.gelu(zr, approximate=False), nn.gelu(zi, approximate=False)
        raise ValueError(f"Unknown complex activation {self.complex_activation!r}")

    @nn.compact
    def __call__(self, x: jax.Array, mats=None) -> tuple[jax.Array, jax.Array]:
        dtype = x.dtype
        fwd_m = mats[f"analysis_{self.fwd_key}"] if (mats and self.fwd_key) else None
        inv_m = mats[f"synthesis_{self.inv_key}"] if (mats and self.inv_key) else None
        fwd_d = mats.get(f"dft_fwd_{self.fwd_key}") if (mats and self.fwd_key) else None
        inv_d = mats.get(f"dft_inv_{self.inv_key}") if (mats and self.inv_key) else None
        hidden = int(self.embed_dim * self.hidden_size_factor)
        residual = x
        xs = self.forward_transform(x.astype(jnp.float32), fwd_m, fwd_d)
        scale_residual = (
            self.forward_transform.nlat != self.inverse_transform.nlat
            or self.forward_transform.nlon != self.inverse_transform.nlon
            or self.forward_transform.grid != self.inverse_transform.grid
        )
        if scale_residual:
            residual = self.inverse_transform(xs, inv_m, inv_d).astype(dtype)

        zr, zi = xs.real, xs.imag
        scale = 1.0 / (self.embed_dim * hidden) ** 0.5
        dims = [self.embed_dim] + [hidden] * self.spectral_layers
        if self.operator_type == "l-dependant":
            # per-degree weights (leading lmax axis); zr is (..., l, m, C)
            lmax = zr.shape[-3]
            wshape = lambda i, o: (lmax, i, o)  # noqa: E731

            def mul(z, w):
                return jnp.einsum("...lmi,lio->...lmo", z, w)
        elif self.operator_type == "diagonal":
            wshape = lambda i, o: (i, o)  # noqa: E731

            def mul(z, w):
                return z @ w
        else:
            raise ValueError(
                f"Unknown non-linear operator type {self.operator_type!r}")
        for i in range(self.spectral_layers):
            wr = self.param(f"w{i}_re", nn.initializers.normal(scale), wshape(dims[i], dims[i + 1]))
            wi = self.param(f"w{i}_im", nn.initializers.normal(scale), wshape(dims[i], dims[i + 1]))
            br = self.param(f"b{i}_re", nn.initializers.zeros, (dims[i + 1],))
            bi = self.param(f"b{i}_im", nn.initializers.zeros, (dims[i + 1],))
            zr, zi = (
                mul(zr, wr) - mul(zi, wi) + br,
                mul(zr, wi) + mul(zi, wr) + bi,
            )
            zr, zi = self._complex_act(zr, zi)
        wr = self.param("wout_re", nn.initializers.normal(scale), wshape(dims[-1], self.embed_dim))
        wi = self.param("wout_im", nn.initializers.normal(scale), wshape(dims[-1], self.embed_dim))
        zr, zi = mul(zr, wr) - mul(zi, wi), mul(zr, wi) + mul(zi, wr)
        out = self.inverse_transform(jax.lax.complex(zr, zi), inv_m, inv_d)
        return out.astype(dtype), residual


class FNOBlock(nn.Module):
    """One Fourier Neural Operator block (reference sfnonet.py:158-337)."""

    cfg: SFNOConfig
    forward_transform: Any
    inverse_transform: Any
    input_shape: Tuple[int, int]
    output_shape: Tuple[int, int]
    drop_path: float = 0.0
    fwd_key: str = ""
    inv_key: str = ""

    def _norm(self, name: str, shape: Tuple[int, int]):
        cfg = self.cfg
        if cfg.normalization_layer == "instance_norm":
            return InstanceNorm2d(cfg.embed_dim, exact=cfg.exact_norm, name=name)
        if cfg.normalization_layer == "layer_norm":
            return SpatialLayerNorm(shape, exact=cfg.exact_norm, name=name)
        if cfg.normalization_layer == "none":
            return lambda x: x
        raise ValueError(f"Unknown normalization {cfg.normalization_layer!r}")

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
        mats=None,
        drop_path_rate: Optional[jax.Array] = None,
    ) -> jax.Array:
        # drop_path_rate: traced per-layer stochastic-depth rate (scan-layers
        # path); overrides the static self.drop_path when given
        cfg = self.cfg
        act = get_activation(cfg.activation_function)

        x_norm = self._norm("norm0", self.input_shape)(x)

        def time_scale_shift(h: jax.Array) -> jax.Array:
            # reference FourierNeuralOperatorBlock.time_scale_shift (sfnonet.py:280-287)
            emb = nn.silu(time_emb)
            emb = nn.Dense(2 * cfg.embed_dim, name="time_mlp",
                           kernel_init=nn.initializers.truncated_normal(0.02))(emb)
            scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
            return h * (scale + 1.0) + shift

        if time_emb is not None and cfg.time_scale_shift_before_filter:
            x_norm = time_scale_shift(x_norm)

        if cfg.filter_type == "linear":
            filt = SpectralConvS2(
                self.forward_transform,
                self.inverse_transform,
                cfg.embed_dim,
                cfg.embed_dim,
                operator_type=cfg.operator_type,
                separable=cfg.separable,
                use_bias=True,
                fwd_key=self.fwd_key,
                inv_key=self.inv_key,
                matmul_dtype="" if cfg.sht_matmul_dtype == "float32" else cfg.sht_matmul_dtype,
                io_dtype=cfg.spectral_io_dtype,
                factorization=cfg.factorization or "",
                rank=cfg.rank,
                use_pallas=cfg.use_pallas,
                merged_dhconv=cfg.merged_dhconv,
                rank_pipeline=cfg.rank_pipeline,
                name="filter",
            )
        elif cfg.filter_type == "non-linear":
            filt = SpectralAttentionS2(
                self.forward_transform,
                self.inverse_transform,
                cfg.embed_dim,
                hidden_size_factor=cfg.mlp_ratio,
                spectral_layers=cfg.spectral_layers,
                complex_activation=cfg.complex_activation,
                # the linear-family operator names (dhconv/diagonal) both map
                # to the shared-MLP variant here; "l-dependant" selects
                # per-degree weights (reference s2convolutions.py:352-378)
                operator_type=("l-dependant"
                               if cfg.operator_type == "l-dependant"
                               else "diagonal"),
                drop_rate=cfg.dropout_filter,
                fwd_key=self.fwd_key,
                inv_key=self.inv_key,
                name="filter",
            )
        else:
            raise ValueError(f"Unknown filter type {cfg.filter_type!r}")

        x_f, residual = filt(x_norm, mats)

        # inner skip: 1x1 conv on the filter residual (reference inner_skip="linear")
        inner = nn.Dense(cfg.embed_dim, name="inner_skip", dtype=jnp.dtype(cfg.compute_dtype),
                         kernel_init=nn.initializers.truncated_normal(0.02))(residual)
        x = x_f + inner

        if cfg.filter_type == "linear":
            x = act(x)

        # boundary-corrected fused tail: fold norm1 stats+affine and the time
        # scale-shift into one per-(batch,channel) (A, B) pair (tiny XLA
        # pre-pass: one stats sweep over x), then run
        # norm-apply -> tss -> GEMM -> gelu -> dropout -> GEMM -> outer-skip
        # as ONE VMEM-resident kernel (ops/fused_mlp.py:fused_block_tail)
        use_tail = (cfg.fused_tail and cfg.use_mlp
                    and cfg.normalization_layer == "instance_norm"
                    and cfg.activation_function in ("gelu", "gelu_exact"))
        if use_tail:
            A, Bc = self._norm("norm1", self.output_shape)(x, fold=True)
            if time_emb is not None and not cfg.time_scale_shift_before_filter:
                emb = nn.silu(time_emb)
                emb = nn.Dense(2 * cfg.embed_dim, name="time_mlp",
                               kernel_init=nn.initializers.truncated_normal(0.02))(emb)
                scale, shift = jnp.split(emb[:, None, None, :], 2, axis=-1)
                A = A * (scale + 1.0)
                Bc = Bc * (scale + 1.0) + shift
            dp_active = ((self.drop_path > 0.0 or drop_path_rate is not None)
                         and not deterministic)
            fuse_res = not dp_active
            x = MLP2d(
                hidden_features=int(cfg.embed_dim * cfg.mlp_ratio),
                out_features=cfg.embed_dim,
                activation=cfg.activation_function,
                drop_rate=cfg.dropout_mlp,
                dtype=jnp.dtype(cfg.compute_dtype),
                exact_dropout=cfg.exact_dropout,
                fused=True,
                fused_tile_rows=cfg.fused_mlp_tile_rows,
                name="mlp",
            )(x, deterministic=deterministic,
              residual=residual if fuse_res else None, affine=(A, Bc))
            if dp_active:
                x = DropPath(self.drop_path)(x, deterministic=deterministic,
                                             rate=drop_path_rate)
            return x if fuse_res else x + residual

        x = self._norm("norm1", self.output_shape)(x)

        if time_emb is not None and not cfg.time_scale_shift_before_filter:
            x = time_scale_shift(x)

        if cfg.use_mlp:
            # with the fused kernel and no live DropPath, the outer skip
            # (reference outer_skip="identity", sfnonet.py:330-335) is added
            # INSIDE the MLP kernel — saves a read-modify-write HBM pass
            dp_active = ((self.drop_path > 0.0 or drop_path_rate is not None)
                         and not deterministic)
            fuse_res = cfg.fused_mlp and not dp_active
            x = MLP2d(
                hidden_features=int(cfg.embed_dim * cfg.mlp_ratio),
                out_features=cfg.embed_dim,
                activation=cfg.activation_function,
                drop_rate=cfg.dropout_mlp,
                dtype=jnp.dtype(cfg.compute_dtype),
                exact_dropout=cfg.exact_dropout,
                fused=cfg.fused_mlp,
                fused_tile_rows=cfg.fused_mlp_tile_rows,
                name="mlp",
            )(x, deterministic=deterministic,
              residual=residual if fuse_res else None)
            if dp_active:
                x = DropPath(self.drop_path)(x, deterministic=deterministic,
                                              rate=drop_path_rate)
            return x if fuse_res else x + residual

        if self.drop_path > 0.0 or drop_path_rate is not None:
            x = DropPath(self.drop_path)(x, deterministic=deterministic,
                                         rate=drop_path_rate)

        # outer skip: identity on the filter residual (reference outer_skip="identity")
        return x + residual


class _MidBlockStep(nn.Module):
    """lax.scan body for one homogeneous middle block: (carry, _) ->
    (carry', None). Params live under name 'block' so the stacked layout is
    blocks_mid/block/<same subtree as an unrolled block_i>."""

    cfg: SFNOConfig
    forward_transform: Any
    inverse_transform: Any
    deterministic: bool

    @nn.compact
    def __call__(self, carry, dp_rate):
        x, t_repr, mats = carry
        y = FNOBlock(
            self.cfg,
            self.forward_transform,
            self.inverse_transform,
            input_shape=self.cfg.model_shape,
            output_shape=self.cfg.model_shape,
            fwd_key="model",
            inv_key="model",
            name="block",
        )(x, t_repr, self.deterministic, mats, drop_path_rate=dp_rate)
        return (y, t_repr, mats), None


def _scanned_mid_blocks(cfg, trans, itrans, deterministic, length):
    """The num_layers-2 identical middle FNO blocks as ONE scan body with
    stacked params under ``blocks_mid/block`` (see SFNOConfig.scan_layers).
    t_repr/mats ride in the carry unchanged (loop-invariant; XLA hoists
    their reads), so the traced body is exactly one block."""
    step = _MidBlockStep
    if cfg.checkpointing >= 3:
        step = nn.remat(_MidBlockStep)
    return nn.scan(
        step,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=length,
    )(cfg, trans, itrans, deterministic, name="blocks_mid")


class SFNO(nn.Module):
    """The full Spherical FNO backbone.

    Call signature matches the reference BaseModel interface
    ``(inputs, time, condition, static_condition) -> outputs`` with
    channels-last tensors (B, H, W, C).
    """

    cfg: SFNOConfig

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
        act = get_activation(cfg.activation_function)
        trans_down, itrans_up, trans, itrans = _build_transforms(cfg)
        compute = jnp.dtype(cfg.compute_dtype)

        # condition concat (reference _base_model.py:166-192)
        conds = [c for c in (condition, static_condition) if c is not None]
        x = jnp.concatenate([inputs] + conds, axis=-1) if conds else inputs
        x = x.astype(compute)
        in_chans = x.shape[-1]

        big_skip = x if cfg.big_skip else None

        # encoder: Dense(+bias) -> act -> ... -> Dense(no bias)
        for i in range(cfg.encoder_layers):
            x = nn.Dense(cfg.embed_dim, name=f"encoder_{i}", dtype=compute,
                         kernel_init=nn.initializers.truncated_normal(0.02))(x)
            x = act(x)
        x = nn.Dense(cfg.embed_dim, use_bias=False, name="encoder_out", dtype=compute,
                     kernel_init=nn.initializers.truncated_normal(0.02))(x)

        if cfg.pos_embed:
            H, W = cfg.img_shape
            pe = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02), (1, H, W, cfg.embed_dim)
            )
            x = x + pe
            if cfg.pos_emb_dropout > 0.0:
                x = QuantizedDropout(cfg.pos_emb_dropout, exact=cfg.exact_dropout)(
                    x, deterministic=deterministic)

        # time embedding (reference sfnonet.py:654-666, 775-785)
        t_repr = None
        if cfg.with_time_emb:
            if time is None:
                raise ValueError("cfg.with_time_emb=True but no time passed")
            t = time.astype(jnp.float32)
            if cfg.time_rescale:
                scaler = 1000.0 / (cfg.max_time - cfg.min_time)
                t = (t - cfg.min_time) * scaler
            t_repr = TimeEmbedMLP(
                time_dim=cfg.embed_dim * cfg.time_dim_mult,
                pos_emb_dim=cfg.embed_dim,
                name="time_emb",
            )(t)

        # spherical-harmonic matrices live in the "constants" collection so
        # they enter compiled programs as runtime ARGUMENTS, not embedded
        # literals (embedded ~100MB constants break remote compilation and
        # bloat executables). They are shared across all blocks.
        mats = None
        if cfg.spectral_transform == "sht":
            mats = {
                "analysis_data": self.variable(
                    "constants", "sht_analysis_data", lambda: trans_down.matrix).value,
                "synthesis_data": self.variable(
                    "constants", "sht_synthesis_data", lambda: itrans_up.matrix).value,
                "analysis_model": self.variable(
                    "constants", "sht_analysis_model", lambda: trans.matrix).value,
                "synthesis_model": self.variable(
                    "constants", "sht_synthesis_model", lambda: itrans.matrix).value,
                "dft_fwd_data": self.variable(
                    "constants", "dft_fwd_data", lambda: trans_down._dft).value,
                "dft_inv_data": self.variable(
                    "constants", "dft_inv_data", lambda: itrans_up._dft).value,
                "dft_fwd_model": self.variable(
                    "constants", "dft_fwd_model", lambda: trans._dft).value,
                "dft_inv_model": self.variable(
                    "constants", "dft_inv_model", lambda: itrans._dft).value,
            }

        drop_rates = [
            cfg.drop_path_rate * i / max(cfg.num_layers - 1, 1) for i in range(cfg.num_layers)
        ]
        use_scan = cfg.scan_layers and cfg.num_layers >= 3
        for i in range(cfg.num_layers):
            first = i == 0
            last = i == cfg.num_layers - 1
            if use_scan and not (first or last):
                if i > 1:
                    continue  # middle blocks all ride the single scan below
                # per-layer stochastic-depth rates ride as scan inputs
                # (None when globally disabled: no bernoulli in the body)
                dp_xs = (jnp.asarray(drop_rates[1:-1], jnp.float32)
                         if cfg.drop_path_rate > 0.0 else None)
                scanned = _scanned_mid_blocks(
                    cfg, trans, itrans, deterministic, cfg.num_layers - 2)
                (x, _, _), _ = scanned((x, t_repr, mats), dp_xs)
                continue
            block_cls = FNOBlock
            if cfg.checkpointing >= 3:
                block_cls = nn.remat(FNOBlock, static_argnums=(3,))
            block = block_cls(
                cfg,
                trans_down if first else trans,
                itrans_up if last else itrans,
                input_shape=cfg.img_shape if first else cfg.model_shape,
                output_shape=cfg.img_shape if last else cfg.model_shape,
                drop_path=drop_rates[i],
                fwd_key="data" if first else "model",
                inv_key="data" if last else "model",
                name=f"block_{i}",
            )
            x = block(x, t_repr, deterministic, mats)

        if cfg.big_skip:
            x = jnp.concatenate([x, big_skip], axis=-1)

        # decoder head (reference get_head, sfnonet.py:734-744)
        for i in range(cfg.encoder_layers):
            x = nn.Dense(cfg.embed_dim, name=f"decoder_{i}", dtype=compute,
                         kernel_init=nn.initializers.truncated_normal(0.02))(x)
            x = act(x)
        x = nn.Dense(cfg.out_chans, use_bias=False, name="decoder_out", dtype=compute,
                     kernel_init=nn.initializers.truncated_normal(0.02))(x)
        return x.astype(jnp.float32)
