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

Usage is opt-in via ``SFNOConfig(use_pallas=True)`` (which routes every dense
non-separable dhconv contraction in the model through this kernel via
``contract(..., use_pallas=True)``); correctness is pinned against the einsum
path in tests (interpret mode on CPU, compiled on TPU). The kernel carries a
``custom_vjp`` (the backward pass is the standard pair of transposed per-l
matmuls, left to XLA) so the flag is valid in training as well as inference.

MEASURED on TPU v5e (full bench, embed 256 x 8 layers @ 180x360): the XLA
einsum path wins — 954 sim-yr/day vs 837 with this kernel (12% slower), and
bf16 MXU passes inside the kernel change nothing (837 either way). The
pallas_call boundary costs more (broken fusions around the complex
re-assembly) than the saved HBM reads; XLA's batched-matmul schedule for
dhconv is already near-optimal. Kept opt-in as the template for future
kernels where XLA's schedule is NOT optimal.
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


def _pallas_forward(xr, xi, wr, wi, interpret: bool):
    """xr/xi: (B, L, M, CI); wr/wi: (L, CI, CO) -> yr/yi (B, L, M, CO)."""
    B, L, M, CI = xr.shape
    CO = wr.shape[-1]
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

    return pl.pallas_call(
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _dhconv_rr(xr, xi, wr, wi, interpret: bool):
    return _pallas_forward(xr, xi, wr, wi, interpret)


def _dhconv_rr_fwd(xr, xi, wr, wi, interpret):
    return _pallas_forward(xr, xi, wr, wi, interpret), (xr, xi, wr, wi)


def _dhconv_rr_bwd(interpret, res, g):
    xr, xi, wr, wi = res
    gr, gi = g
    # y = x W (complex, per-l): dx = g W^T with the complex-conjugate pattern,
    # dW = x^T g summed over (batch, m). These are the same MXU-shaped batched
    # matmuls as the forward; XLA handles them.
    mm = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    dxr = mm("blmo,lio->blmi", gr, wr) + mm("blmo,lio->blmi", gi, wi)
    dxi = mm("blmo,lio->blmi", gi, wr) - mm("blmo,lio->blmi", gr, wi)
    dwr = mm("blmi,blmo->lio", xr, gr) + mm("blmi,blmo->lio", xi, gi)
    dwi = mm("blmi,blmo->lio", xr, gi) - mm("blmi,blmo->lio", xi, gr)
    return dxr, dxi, dwr, dwi


_dhconv_rr.defvjp(_dhconv_rr_fwd, _dhconv_rr_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dhconv_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: (..., L, M, CI) complex64; w: (CI, CO, L, 2) real -> (..., L, M, CO).

    Leading dims are flattened into the kernel's batch grid dim. Differentiable
    (custom VJP) so it can sit on the training path.
    """
    lead = x.shape[:-3]
    L, M, CI = x.shape[-3:]
    CO = w.shape[1]
    xr = x.real.reshape((-1, L, M, CI))
    xi = x.imag.reshape((-1, L, M, CI))
    # weights to (L, CI, CO) so the l axis is the grid dim
    wr = jnp.transpose(w[..., 0], (2, 0, 1))
    wi = jnp.transpose(w[..., 1], (2, 0, 1))
    yr, yi = _dhconv_rr(xr, xi, wr, wi, interpret)
    y = jax.lax.complex(yr, yi)
    return y.reshape(lead + (L, M, CO))
