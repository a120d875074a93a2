"""Pallas TPU kernel: the block MLP as ONE VMEM-resident pass.

The per-layer pointwise MLP (reference modulus ``MLP`` of 1x1 convs,
layers.py:53; our ``models.modules.MLP2d``) is two GEMMs with an activation
and (optionally) dropout between them. XLA cannot fuse two matmuls into one
kernel, so the hidden tensor — (B*H*W, embed*mlp_ratio), 66 MB bf16 at the
paper config — makes a full HBM round trip per layer per forward
(write + read = 133 MB), and the post-MLP ``+ residual`` costs another
read-modify-write of the 33 MB activation. The window program is
HBM-bandwidth bound (results/roofline: ~27 GB/step at 640-820 GB/s), so
those bytes are wall-clock.

This kernel tiles the fused rows (B*H*W is row-independent: every output row
depends only on its own input row) and keeps everything between the two
GEMMs in VMEM:

    y[tile] = dropout(gelu(x[tile] @ W1 + b1) @ W2 + b2) (+ residual[tile])

* Weights/biases ride constant block indices, so Pallas keeps them resident
  in VMEM across the whole grid (W1+W2 bf16 at embed 256 / ratio 2 = 0.5 MB).
* GEMMs accumulate in f32 (``preferred_element_type``); the inter-GEMM cast
  matches the standard path's flax ``Dense(dtype=bfloat16)`` behavior.
* Dropout reproduces ``QuantizedDropout``'s math exactly — keep
  ``t = round((1-rate)*256)``, mask ``bits8 < t``, rescale ``256/t`` — from
  the on-core hardware PRNG (``pltpu.prng_random_bits``), seeded per grid
  tile. Random STREAMS differ from the XLA path (as they already do across
  backends/rng_impls); only the rate and independence matter.
* The optional fused residual add absorbs the block's outer skip
  (reference sfnonet.py:330-335, outer_skip="identity") when DropPath is
  inactive, saving the separate y-read/modify/write pass.

Rows beyond N in the final partial tile read garbage and compute garbage,
but rows are independent and Pallas masks out-of-bounds writes, so the
padding never escapes.

No AD rule is defined: differentiating through the kernel fails loudly.
``SFNOConfig.fused_mlp`` is an inference-path flag (the training step keeps
the standard MLP2d path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    PALLAS_AVAILABLE = False

__all__ = ["fused_mlp", "fused_block_tail", "FUSED_MLP_AVAILABLE"]

FUSED_MLP_AVAILABLE = PALLAS_AVAILABLE


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
            t: int, exact_gelu: bool, has_residual: bool):
    """rest = [res_ref,] [seed_ref,] y_ref (seed present iff t > 0)."""
    refs = list(rest)
    y_ref = refs.pop()
    seed_ref = refs.pop() if t > 0 else None
    res_ref = refs.pop() if has_residual else None

    if t > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=not exact_gelu)
    if t > 0:
        bits = pltpu.prng_random_bits(h.shape)  # uint32
        keep = (bits & jnp.uint32(255)) < jnp.uint32(t)
        h = jnp.where(keep, h * (256.0 / t), 0.0)
    h = h.astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if t > 0:
        bits2 = pltpu.prng_random_bits(y.shape)
        keep2 = (bits2 & jnp.uint32(255)) < jnp.uint32(t)
        y = jnp.where(keep2, y * (256.0 / t), 0.0)
    if has_residual:
        y = y + res_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("t", "exact_gelu", "tile_rows", "interpret", "out_dtype"),
)
def _fused_mlp_2d(x2, w1, b1, w2, b2, residual2, seed, *, t: int,
                  exact_gelu: bool, tile_rows: int, interpret: bool,
                  out_dtype=None):
    N, C = x2.shape
    H = w1.shape[1]
    C2 = w2.shape[1]
    tn = min(tile_rows, N)
    grid = (pl.cdiv(N, tn),)
    in_specs = [
        pl.BlockSpec((tn, C), lambda i: (i, 0)),
        pl.BlockSpec((C, H), lambda i: (0, 0)),
        pl.BlockSpec((1, H), lambda i: (0, 0)),
        pl.BlockSpec((H, C2), lambda i: (0, 0)),
        pl.BlockSpec((1, C2), lambda i: (0, 0)),
    ]
    args = [x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1)]
    if residual2 is not None:
        in_specs.append(pl.BlockSpec((tn, C2), lambda i: (i, 0)))
        args.append(residual2)
    if t > 0:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if hasattr(pltpu, "SMEM")
            else pl.BlockSpec((1,), lambda i: (0,))
        )
        args.append(seed)
    kern = functools.partial(
        _kernel, t=t, exact_gelu=exact_gelu,
        has_residual=residual2 is not None,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, C2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, C2), out_dtype or x2.dtype),
        interpret=interpret,
    )(*args)


def _tail_kernel(x_ref, a_ref, c_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
                 t: int, exact_gelu: bool, compute_dtype):
    """Boundary-corrected block tail (round-5 kernel shot): the fused-MLP
    kernel EXTENDED upstream so its entry sits at a fusion-natural point.
    Reads the PRE-norm activation tile and applies the whole
    norm1 -> time-scale-shift chain as one per-(batch, channel) affine
    ``x * A + C`` (stats + affine folded outside by ``InstanceNorm2d(fold=
    True)``) before the two GEMMs — the normalized tensor never exists in
    HBM, which was loss mechanism #1 of the round-4 negative result
    (results/fused_mlp/README.md "Why" §2).

    rest = [res_ref,] [seed_ref,] y_ref."""
    refs = list(rest)
    y_ref = refs.pop()
    seed_ref = refs.pop() if t > 0 else None
    res_ref = refs.pop() if refs else None

    if t > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                        + pl.program_id(1))

    xn = x_ref[0].astype(jnp.float32) * a_ref[0, 0] + c_ref[0, 0]
    h = jnp.dot(xn.astype(compute_dtype), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=not exact_gelu)
    if t > 0:
        bits = pltpu.prng_random_bits(h.shape)
        keep = (bits & jnp.uint32(255)) < jnp.uint32(t)
        h = jnp.where(keep, h * (256.0 / t), 0.0)
    h = h.astype(compute_dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    if t > 0:
        bits2 = pltpu.prng_random_bits(y.shape)
        keep2 = (bits2 & jnp.uint32(255)) < jnp.uint32(t)
        y = jnp.where(keep2, y * (256.0 / t), 0.0)
    if res_ref is not None:
        y = y + res_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("t", "exact_gelu", "tile_rows", "interpret", "out_dtype"),
)
def _fused_tail_3d(x3, a2, c2, w1, b1, w2, b2, res3, seed, *, t: int,
                   exact_gelu: bool, tile_rows: int, interpret: bool,
                   out_dtype=None):
    B, N, C = x3.shape
    H = w1.shape[1]
    C2 = w2.shape[1]
    tn = min(tile_rows, N)
    grid = (B, pl.cdiv(N, tn))
    in_specs = [
        pl.BlockSpec((1, tn, C), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((C, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, C2), lambda b, i: (0, 0)),
        pl.BlockSpec((1, C2), lambda b, i: (0, 0)),
    ]
    args = [x3, a2, c2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1)]
    if res3 is not None:
        in_specs.append(pl.BlockSpec((1, tn, C2), lambda b, i: (b, i, 0)))
        args.append(res3)
    if t > 0:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if hasattr(pltpu, "SMEM")
            else pl.BlockSpec((1,), lambda b, i: (0,))
        )
        args.append(seed)
    kern = functools.partial(
        _tail_kernel, t=t, exact_gelu=exact_gelu, compute_dtype=x3.dtype,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn, C2), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C2), out_dtype or x3.dtype),
        interpret=interpret,
    )(*args)


def fused_block_tail(x, affine_a, affine_c, w1, b1, w2, b2, residual=None,
                     rng=None, *, drop_rate: float = 0.0,
                     exact_gelu: bool = False, tile_rows: int = 1024,
                     interpret: bool = False):
    """Fused norm-apply + time-scale-shift + MLP + outer-skip.

    x: (B, ..., C) PRE-norm activations; ``affine_a``/``affine_c``: f32
    per-(batch, channel) fold of instance-norm statistics + affine + time
    scale-shift, broadcastable as (B, 1, ..., 1, C) — the kernel computes
    ``x * A + C`` per tile and never materializes the normalized tensor.
    residual: optional (B, ..., C2) outer skip added in-kernel; the output
    dtype is then ``promote_types(x, residual)`` to match the standard
    path's ``y + residual`` (the block residual stream rides f32 under
    mixed precision — fp32-pinned spectral transforms — and the blocks_mid
    scan carry requires a dtype-stable block output).
    """
    t_raw = int(round((1.0 - drop_rate) * 256)) if drop_rate > 0.0 else 256
    if t_raw <= 0:
        raise ValueError(f"fused_block_tail: drop_rate {drop_rate} quantizes "
                         "to keep-nothing; use the standard path")
    t = 0 if t_raw >= 256 else t_raw
    B = x.shape[0]
    lead = x.shape[:-1]
    x3 = x.reshape(B, -1, x.shape[-1])
    a2 = jnp.reshape(affine_a.astype(jnp.float32), (B, 1, x.shape[-1]))
    c2 = jnp.reshape(affine_c.astype(jnp.float32), (B, 1, x.shape[-1]))
    res3 = (residual.reshape(B, -1, residual.shape[-1])
            if residual is not None else None)
    if t > 0:
        if rng is None:
            raise ValueError("fused_block_tail: drop_rate > 0 requires rng")
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out_dtype = (jnp.promote_types(x.dtype, residual.dtype)
                 if residual is not None else x.dtype)
    y3 = _fused_tail_3d(
        x3, a2, c2, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, res3,
        seed, t=t, exact_gelu=exact_gelu, tile_rows=tile_rows,
        interpret=interpret, out_dtype=jnp.dtype(out_dtype),
    )
    return y3.reshape(*lead, y3.shape[-1])


def fused_mlp(x, w1, b1, w2, b2, residual=None, rng=None, *,
              drop_rate: float = 0.0, exact_gelu: bool = False,
              tile_rows: int = 1024, interpret: bool = False):
    """Fused pointwise MLP over the trailing channel axis.

    x: (..., C); w1: (C, H); w2: (H, C2); residual: optional (..., C2) added
    inside the kernel (the block's outer skip). ``rng`` (a JAX PRNG key) is
    required when ``drop_rate > 0`` — it seeds the in-kernel hardware PRNG.
    Returns (..., C2) in x.dtype.
    """
    t_raw = int(round((1.0 - drop_rate) * 256)) if drop_rate > 0.0 else 256
    if t_raw <= 0:
        raise ValueError(f"fused_mlp: drop_rate {drop_rate} quantizes to "
                         "keep-nothing; use the standard MLP path")
    t = 0 if t_raw >= 256 else t_raw  # t==0 means "dropout off" in-kernel
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    res2 = residual.reshape(-1, residual.shape[-1]) if residual is not None else None
    if t > 0:
        if rng is None:
            raise ValueError("fused_mlp: drop_rate > 0 requires rng")
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out_dtype = (jnp.promote_types(x.dtype, residual.dtype)
                 if residual is not None else x.dtype)
    y2 = _fused_mlp_2d(
        x2, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, res2, seed,
        t=t, exact_gelu=exact_gelu, tile_rows=tile_rows, interpret=interpret,
        out_dtype=jnp.dtype(out_dtype),
    )
    return y2.reshape(*lead, y2.shape[-1])
