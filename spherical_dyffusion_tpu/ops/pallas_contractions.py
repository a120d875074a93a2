"""Pallas TPU kernel for the dhconv spectral contraction.

The Driscoll-Healy convolution y[b,l,m,co] = sum_ci x[b,l,m,ci] * w[ci,co,l]
(complex) is the MXU hot spot of the SFNO spectral filter. XLA's batched
einsum handles it well; this Pallas version fuses the four real matmuls of the
complex product into one kernel invocation per (batch, l) grid cell, keeping
x's real/imag tiles resident in VMEM across both output components and
avoiding two of the four HBM reads of x.

    yr = xr @ wr - xi @ wi
    yi = xr @ wi + xi @ wr

Layout per grid cell: x tile (M, CI), w tile (CI, CO) -> y tile (M, CO).
M (=mmax, e.g. 181) rides the sublane dim; CI/CO (embed, e.g. 256) ride lanes.

Usage is opt-in via ``SFNOConfig`` / ``contract(..., use_pallas=True)``;
correctness is pinned against the einsum path in tests (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    PALLAS_AVAILABLE = False

__all__ = ["dhconv_pallas", "PALLAS_AVAILABLE"]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dhconv_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (B, L, M, CI) complex64; w: (CI, CO, L, 2) real -> (B, L, M, CO) complex64."""
    B, L, M, CI = x.shape
    CO = w.shape[1]
    xr, xi = x.real, x.imag
    # weights to (L, CI, CO) so the l axis is the grid dim
    wr = jnp.transpose(w[..., 0], (2, 0, 1))
    wi = jnp.transpose(w[..., 1], (2, 0, 1))

    grid = (B, L)
    x_spec = pl.BlockSpec((1, 1, M, CI), lambda b, l: (b, l, 0, 0))
    w_spec = pl.BlockSpec((1, CI, CO), lambda b, l: (l, 0, 0))
    y_spec = pl.BlockSpec((1, 1, M, CO), lambda b, l: (b, l, 0, 0))

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        xr_t = xr_ref[0, 0]
        xi_t = xi_ref[0, 0]
        wr_t = wr_ref[0]
        wi_t = wi_ref[0]
        yr_ref[0, 0] = (
            jnp.dot(xr_t, wr_t, preferred_element_type=jnp.float32)
            - jnp.dot(xi_t, wi_t, preferred_element_type=jnp.float32)
        )
        yi_ref[0, 0] = (
            jnp.dot(xr_t, wi_t, preferred_element_type=jnp.float32)
            + jnp.dot(xi_t, wr_t, preferred_element_type=jnp.float32)
        )

    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, M, CO), jnp.float32),
            jax.ShapeDtypeStruct((B, L, M, CO), jnp.float32),
        ],
        interpret=interpret,
    )(xr, xi, wr, wi)
    return jax.lax.complex(yr, yi)
