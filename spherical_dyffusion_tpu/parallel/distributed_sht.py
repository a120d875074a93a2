"""Explicitly-sharded spherical harmonic transforms over the device mesh.

TPU-native counterpart of torch_harmonics.distributed
(thd.DistributedRealSHT, used by the reference at sfnonet.py:543-548, built on
all-to-all transposes in distributed/layers.py:34-222). The decomposition:

* grid space is sharded (lat over mesh axis "h", lon over "w");
* the longitude rFFT needs full longitudes -> ``lax.all_to_all`` trades the
  lon shard for a channel shard (the reference's distributed_transpose_w);
* the Legendre contraction reduces over latitude -> each shard contracts its
  local rows with its slice of the analysis matrix, then ``lax.psum`` over
  "h" (the reference gathers instead; a psum keeps l replicated for the
  following per-l spectral weighting);
* spectral space comes out (l, m) full with channels sharded over "w" —
  exactly the layout the tensor-parallel spectral convolution wants
  (contract over channels = partial matmul + psum over "w").

The inverse applies the adjoint pipeline. ``jit``-with-shardings reaches the
same numerics automatically (tests/test_parallel.py); these shard_map versions
make the collective schedule explicit and deterministic for pod-scale tuning.

Restrictions: lat, lon, and channels must divide by their mesh axis sizes,
and the full (untruncated) m spectrum is used internally.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.sht import InverseRealSHT, RealSHT

__all__ = ["distributed_sht", "distributed_isht", "distributed_dhconv"]


def distributed_sht(x: jax.Array, sht: RealSHT, mesh: Mesh,
                    axis_h: str = "h", axis_w: str = "w") -> jax.Array:
    """x: (B, H, W, C) sharded P(None, 'h', 'w', None) ->
    spectral (B, L, M_full, C) sharded P(None, None, None, 'w')."""
    nh = mesh.shape[axis_h]
    nw = mesh.shape[axis_w]
    B, H, W, C = x.shape
    assert H % nh == 0 and W % nw == 0 and C % max(nw, 1) == 0, (H, W, C, nh, nw)
    analysis = sht.matrix  # (H, L, M)

    def fn(x_blk, a_blk):
        # x_blk: (B, H/nh, W/nw, C); a_blk: (H/nh, L, M)
        if nw > 1:
            # lon shard -> channel shard (reference distributed_transpose_w)
            x_blk = lax.all_to_all(x_blk, axis_w, split_axis=3, concat_axis=2,
                                  tiled=True)
        xf = jnp.fft.rfft(x_blk, axis=-2, norm="forward")  # (B, H/nh, Mfull, C/nw)
        xf = xf[..., : a_blk.shape[-1], :]
        part = jnp.einsum("bhmc,hlm->blmc", xf.real, a_blk) + 1j * jnp.einsum(
            "bhmc,hlm->blmc", xf.imag, a_blk
        )
        # reduce the latitude contraction across lat shards
        return lax.psum(part, axis_h)

    out = shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, axis_h, axis_w, None), P(axis_h, None, None)),
        out_specs=P(None, None, None, axis_w),
    )(x, analysis)
    return out


def distributed_isht(xs: jax.Array, isht: InverseRealSHT, mesh: Mesh,
                     axis_h: str = "h", axis_w: str = "w") -> jax.Array:
    """spectral (B, L, M, C) sharded P(None, None, None, 'w') ->
    grid (B, H, W, C) sharded P(None, 'h', 'w', None)."""
    nh = mesh.shape[axis_h]
    nw = mesh.shape[axis_w]
    synthesis = isht.matrix  # (H, L, M)
    W = isht.nlon
    Mfull = W // 2 + 1

    def fn(xs_blk, s_blk):
        # xs_blk: (B, L, M, C/nw); s_blk: (H/nh, L, M)
        m_have = xs_blk.shape[2]
        xf = jnp.einsum("blmc,hlm->bhmc", xs_blk.real, s_blk[..., :m_have]) + 1j * \
            jnp.einsum("blmc,hlm->bhmc", xs_blk.imag, s_blk[..., :m_have])
        if m_have < Mfull:
            xf = jnp.pad(xf, [(0, 0), (0, 0), (0, Mfull - m_have), (0, 0)])
        out = jnp.fft.irfft(xf, n=W, axis=-2, norm="forward")  # (B, H/nh, W, C/nw)
        if nw > 1:
            # channel shard -> lon shard (reference inverse transpose)
            out = lax.all_to_all(out, axis_w, split_axis=2, concat_axis=3,
                                 tiled=True)
        return out

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, None, axis_w), P(axis_h, None, None)),
        out_specs=P(None, axis_h, axis_w, None),
    )(xs, synthesis)


def distributed_dhconv(xs: jax.Array, w: jax.Array, mesh: Mesh,
                       axis_w: str = "w", scatter_output: bool = True) -> jax.Array:
    """Tensor-parallel Driscoll-Healy contraction: spectral input channels
    sharded over 'w' (the layout distributed_sht produces), weight
    (ci, co, l, 2) ci-sharded; partial per-l matmuls reduced over 'w'
    (the reference's DistributedMLP allreduce pattern, distributed/layers.py:
    226-315, applied to the spectral weighting).

    With ``scatter_output`` (default) the reduction is a ``psum_scatter``
    over the OUTPUT channel dim, so the result comes back with channels
    sharded over 'w' — exactly the layout :func:`distributed_isht` consumes.
    That is a reduce_scatter (half the ICI traffic of an all-reduce) and a
    zero-copy hand-off to the next pipeline stage; pass False to get the
    fully-replicated output of a plain psum."""

    def fn(x_blk, w_blk):
        wr, wi = w_blk[..., 0], w_blk[..., 1]
        yr = jnp.einsum("blmi,iol->blmo", x_blk.real, wr) - jnp.einsum(
            "blmi,iol->blmo", x_blk.imag, wi
        )
        yi = jnp.einsum("blmi,iol->blmo", x_blk.real, wi) + jnp.einsum(
            "blmi,iol->blmo", x_blk.imag, wr
        )
        y = yr + 1j * yi
        if scatter_output:
            return lax.psum_scatter(y, axis_w, scatter_dimension=3, tiled=True)
        return lax.psum(y, axis_w)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, None, axis_w), P(axis_w, None, None, None)),
        out_specs=P(None, None, None, axis_w) if scatter_output else P(),
    )(xs, w)
