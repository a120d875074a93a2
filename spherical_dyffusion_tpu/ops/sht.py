"""Real spherical harmonic transforms (SHT) for TPU, channels-last.

TPU-native replacement for torch_harmonics' ``RealSHT``/``InverseRealSHT``
(used by the reference at src/models/sfno/sfnonet.py:537-554). The transform
is expressed as XLA-friendly primitives that map straight onto the hardware:

* longitude stage: an explicit real-DFT matmul on the MXU (default; profiling
  showed XLA's TPU FFT lowering dominated the model's runtime — the matmul
  form is ~2x faster end-to-end and rides bf16), with ``jnp.fft`` retained
  via ``lon_method="fft"``;
* latitude stage: associated-Legendre contraction, an einsum that lowers to
  one batched MXU matmul per azimuthal order m.

Layout is channels-last ``(..., nlat, nlon, C)`` so that the surrounding
model's 1x1 convolutions/MLPs keep channels in the minor (lane) dimension;
spectral space is ``(..., lmax, mmax, C)`` complex64.

All transforms are performed in float32 (the reference likewise forces fp32
around the transforms under autocast, s2convolutions.py:164-191).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .quadrature import dft_matrices, sht_matrices

__all__ = ["RealSHT", "InverseRealSHT"]


def _effective_matmul_dtype(requested: str) -> str:
    """bf16 x bf16 -> f32 dots are unsupported by the XLA-CPU DotThunk (the
    virtual test mesh); fall back to f32 there. Resolved at trace time."""
    if requested != "float32" and jax.default_backend() == "cpu":
        return "float32"
    return requested


def _emit(y: jax.Array, out_dtype) -> jax.Array:
    """Round a spectral-stage output to ``out_dtype`` (the spectral-pipeline
    IO dtype). Under ``sht_matmul_dtype=bfloat16`` every downstream GEMM
    rounds its inputs to bf16 anyway, so emitting bf16 here is numerically
    identical on the main path while halving the HBM bytes of the
    materialized (l, m, c, 2) intermediates — the dominant traffic of the
    window program (results/roofline). XLA folds the convert into the dot's
    epilogue so the narrow tensor is what crosses HBM."""
    if out_dtype is None:
        return y
    return y.astype(out_dtype)


def _analysis_folded(x: jax.Array, A: jax.Array, nlat: int, lmax: int) -> jax.Array:
    """Even/odd-folded Legendre analysis.

    Uses P_l^m(-cos th) = (-1)^(l+m) P_l^m(cos th) on symmetric nodes:
    out[l, m] = sum_{h < H/2} A[h, l, m] * (e if (l+m) even else o)[h, m]
    with e/o the symmetric/antisymmetric halves of x — two half-size matmuls
    instead of one full-size one (2x fewer FLOPs).

    x: (..., H, M, C); A: (H, L, M) analysis matrix (incl. quadrature).
    """
    H2, L2 = nlat // 2, lmax // 2
    top = x[..., :H2, :, :]
    bot = jnp.flip(x[..., H2:, :, :], axis=-3)
    e = top + bot
    o = top - bot
    m_even = (jnp.arange(A.shape[-1]) % 2 == 0)[:, None]  # (M, 1)
    # inputs for even-l rows take e when m even (l+m even) else o, and
    # conversely for odd-l rows
    in_el = jnp.where(m_even, e, o)
    in_ol = jnp.where(m_even, o, e)
    A_el = A[:H2, 0::2, :]
    A_ol = A[:H2, 1::2, :]
    out_e = jnp.einsum("...hmc,hjm->...jmc", in_el, A_el,
                       preferred_element_type=jnp.float32)
    out_o = jnp.einsum("...hmc,hjm->...jmc", in_ol, A_ol,
                       preferred_element_type=jnp.float32)
    inter = jnp.stack([out_e, out_o], axis=-3)  # (..., L/2, 2, M, C)
    shape = inter.shape[:-4] + (lmax,) + inter.shape[-2:]
    return inter.reshape(shape)


def _synthesis_folded(cr: jax.Array, S: jax.Array, nlat: int, lmax: int) -> jax.Array:
    """Even/odd-folded Legendre synthesis (adjoint of _analysis_folded).

    xf[h] = E + O and xf[H-1-h] = (-1)^m (E - O), where E/O are the even-/odd-l
    partial syntheses over the top half of the latitudes.
    cr: (..., L, M, C) real part; S: (H, L, M) synthesis matrix.
    """
    H2 = nlat // 2
    S_el = S[:H2, 0::2, :]
    S_ol = S[:H2, 1::2, :]
    E = jnp.einsum("...jmc,hjm->...hmc", cr[..., 0::2, :, :], S_el,
                   preferred_element_type=jnp.float32)
    O = jnp.einsum("...jmc,hjm->...hmc", cr[..., 1::2, :, :], S_ol,
                   preferred_element_type=jnp.float32)
    sign_m = jnp.where(jnp.arange(S.shape[-1]) % 2 == 0, 1.0, -1.0)[:, None]
    top = E + O
    bottom = jnp.flip((E - O) * sign_m, axis=-3)
    return jnp.concatenate([top, bottom], axis=-3)



@dataclasses.dataclass(frozen=True)
class RealSHT:
    """Forward (analysis) real SHT: grid -> spectral.

    Parameters mirror torch_harmonics: ``nlat, nlon`` grid size, optional
    ``lmax/mmax`` truncation, ``grid`` in {"equiangular", "legendre-gauss",
    "equiangular-cell-centered"}.
    """

    nlat: int
    nlon: int
    lmax: int
    mmax: int
    grid: str = "equiangular"
    # matmul input dtype: float32 (reference-faithful) or bfloat16 (8x MXU
    # throughput, fp32 accumulation)
    matmul_dtype: str = "float32"
    # longitude stage: "matmul" (explicit DFT on the MXU; much faster than
    # XLA's TPU FFT lowering at climate grid sizes) or "fft" (jnp.fft)
    lon_method: str = "matmul"
    # even/odd latitude symmetry folding (SHTns-style): P_l^m(-x) =
    # (-1)^(l+m) P_l^m(x) on the symmetric node sets halves the Legendre
    # contraction FLOPs. Requires even nlat and even lmax. Measured SLOWER at
    # 180x360/embed-256 on v5e (half-size matmul padding outweighs the FLOP
    # savings: 814 vs 966 sim-yr/day) — intended for higher resolutions
    # (e.g. 721x1440) where the matmuls stay MXU-saturated after halving.
    fold_symmetry: bool = False

    # populated in __post_init__; excluded from equality/hash
    _analysis: jax.Array = dataclasses.field(default=None, compare=False, repr=False)
    _dft: jax.Array = dataclasses.field(default=None, compare=False, repr=False)

    def __post_init__(self):
        analysis, _ = sht_matrices(self.nlat, self.grid, self.lmax, self.mmax)
        object.__setattr__(self, "_analysis", jnp.asarray(analysis, dtype=jnp.float32))
        fwd, _ = dft_matrices(self.nlon, self.mmax)
        object.__setattr__(self, "_dft", jnp.asarray(fwd, dtype=jnp.float32))

    @staticmethod
    def create(nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None,
               grid: str = "equiangular", matmul_dtype: str = "float32",
               lon_method: str = "matmul") -> "RealSHT":
        lmax = lmax if lmax is not None else nlat
        mmax = mmax if mmax is not None else nlon // 2 + 1
        return RealSHT(nlat, nlon, lmax, mmax, grid, matmul_dtype, lon_method)

    @property
    def matrix(self) -> jax.Array:
        return self._analysis

    def __call__(self, x: jax.Array, matrix: jax.Array | None = None,
                 dft: jax.Array | None = None, stacked: bool = False,
                 out_dtype=None) -> jax.Array:
        """x: (..., nlat, nlon, C) real -> (..., lmax, mmax, C) complex64.

        ``matrix``/``dft`` let callers pass the (possibly traced) Legendre /
        DFT matrices as runtime arguments instead of baked-in constants —
        large embedded literals blow up remotely-compiled program payloads.

        ``stacked=True`` returns the real/imag pair as a trailing axis
        ``(..., lmax, mmax, C, 2)`` float32 instead of complex64 — the native
        output layout of the fused formulation, consumed directly by the
        merged dhconv GEMM and ``InverseRealSHT`` without complex round-trips.

        ``out_dtype`` (stacked only): emit the longitude-stage and spectral
        outputs in this dtype (see ``_emit``) — the spectral-IO bytes lever.
        """
        m = self._analysis if matrix is None else matrix
        if out_dtype is not None and not stacked:
            raise ValueError("out_dtype requires stacked=True (complex64 "
                             "has no narrow variant)")
        x = x.astype(jnp.float32)
        mmd = _effective_matmul_dtype(self.matmul_dtype)
        md = m.astype(mmd)
        if self.fold_symmetry and self.nlat % 2 == 0 and self.lmax % 2 == 0:
            # opt-in high-resolution path keeps the split re/im formulation
            if self.lon_method == "matmul":
                d = (self._dft if dft is None else dft).astype(mmd)
                xd = x.astype(mmd)
                xr = jnp.einsum("...hwc,wm->...hmc", xd, d[..., 0],
                                preferred_element_type=jnp.float32)
                xi = jnp.einsum("...hwc,wm->...hmc", xd, d[..., 1],
                                preferred_element_type=jnp.float32)
            else:
                xf = jnp.fft.rfft(x, axis=-2, norm="forward")[..., : self.mmax, :]
                xr, xi = xf.real, xf.imag
            re = _analysis_folded(xr.astype(mmd), md, self.nlat, self.lmax)
            im = _analysis_folded(xi.astype(mmd), md, self.nlat, self.lmax)
            if stacked:
                return _emit(jnp.stack([re, im], axis=-1), out_dtype)
            return jax.lax.complex(re, im)
        # fused real/imag formulation: the cos/sin DFT components ride as a
        # trailing r axis INSIDE the dot_generals — one DFT GEMM instead of
        # two, and the m-batched Legendre GEMM runs with N = 2C columns
        # (half the batched-GEMM launches, half the layout copies, better MXU
        # tiles at embed 256)
        if self.lon_method == "matmul":
            d = (self._dft if dft is None else dft).astype(mmd)  # (w, m, 2)
            xd = x.astype(mmd)
            xf2 = _emit(jnp.einsum("...hwc,wmr->...hmcr", xd, d,
                                   preferred_element_type=jnp.float32),
                        out_dtype)
        else:
            # longitude FFT with 1/nlon (norm="forward"), truncate to mmax
            xf = jnp.fft.rfft(x, axis=-2, norm="forward")[..., : self.mmax, :]
            xf2 = jnp.stack([xf.real, xf.imag], axis=-1)
        # latitude Legendre analysis batched over m:
        # (..., h, m, c, r) x (h, l, m) -> (..., l, m, c, r)
        z = jnp.einsum("...hmcr,hlm->...lmcr", xf2.astype(mmd), md,
                       preferred_element_type=jnp.float32)
        if stacked:
            return _emit(z, out_dtype)
        return jax.lax.complex(z[..., 0], z[..., 1])


@dataclasses.dataclass(frozen=True)
class InverseRealSHT:
    """Inverse (synthesis) real SHT: spectral -> grid."""

    nlat: int
    nlon: int
    lmax: int
    mmax: int
    grid: str = "equiangular"
    matmul_dtype: str = "float32"
    lon_method: str = "matmul"
    fold_symmetry: bool = False

    _synthesis: jax.Array = dataclasses.field(default=None, compare=False, repr=False)
    _dft: jax.Array = dataclasses.field(default=None, compare=False, repr=False)

    def __post_init__(self):
        _, synthesis = sht_matrices(self.nlat, self.grid, self.lmax, self.mmax)
        object.__setattr__(self, "_synthesis", jnp.asarray(synthesis, dtype=jnp.float32))
        _, inv = dft_matrices(self.nlon, self.mmax)
        object.__setattr__(self, "_dft", jnp.asarray(inv, dtype=jnp.float32))

    @staticmethod
    def create(nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None,
               grid: str = "equiangular", matmul_dtype: str = "float32",
               lon_method: str = "matmul") -> "InverseRealSHT":
        lmax = lmax if lmax is not None else nlat
        mmax = mmax if mmax is not None else nlon // 2 + 1
        return InverseRealSHT(nlat, nlon, lmax, mmax, grid, matmul_dtype, lon_method)

    @property
    def matrix(self) -> jax.Array:
        return self._synthesis

    def __call__(self, x: jax.Array, matrix: jax.Array | None = None,
                 dft: jax.Array | None = None, out_dtype=None) -> jax.Array:
        """x: (..., lmax, mmax, C) complex -> (..., nlat, nlon, C) real float32.

        Also accepts the stacked real layout ``(..., lmax, mmax, C, 2)``
        (see ``RealSHT.__call__(stacked=True)``) — the fused spectral
        pipeline hands that through SHT -> dhconv -> ISHT without ever
        materializing complex values.

        ``out_dtype``: emit the latitude-synthesis intermediate and the grid
        output in this dtype (see ``_emit``); matmul longitude path only.
        """
        m = self._synthesis if matrix is None else matrix
        is_stacked = not jnp.issubdtype(x.dtype, jnp.complexfloating)
        if not is_stacked:
            x = x.astype(jnp.complex64)
        # latitude synthesis (real/imag decomposed; see RealSHT.__call__)
        mmd = _effective_matmul_dtype(self.matmul_dtype)
        md = m.astype(mmd)
        if self.fold_symmetry and self.nlat % 2 == 0 and self.lmax % 2 == 0:
            xr = x[..., 0] if is_stacked else x.real
            xi = x[..., 1] if is_stacked else x.imag
            re = _synthesis_folded(xr.astype(mmd), md, self.nlat, self.lmax)
            im = _synthesis_folded(xi.astype(mmd), md, self.nlat, self.lmax)
            if self.lon_method == "matmul":
                d = (self._dft if dft is None else dft).astype(mmd)
                out = jnp.einsum("...hmc,mw->...hwc", re.astype(mmd),
                                 d[..., 0], preferred_element_type=jnp.float32)
                out = out + jnp.einsum("...hmc,mw->...hwc", im.astype(mmd),
                                       d[..., 1], preferred_element_type=jnp.float32)
                return out
            xf = jax.lax.complex(re, im)
        elif self.lon_method == "matmul":
            # fused real/imag: the r axis rides inside both GEMMs; the
            # Hermitian inverse DFT contracts (m, r) jointly in ONE dot
            xs = (x if is_stacked
                  else jnp.stack([x.real, x.imag], axis=-1)).astype(mmd)
            y = _emit(jnp.einsum("...lmcr,hlm->...hmcr", xs, md,
                                 preferred_element_type=jnp.float32),
                      out_dtype)
            d = (self._dft if dft is None else dft).astype(mmd)  # (m, w, 2)
            return _emit(jnp.einsum("...hmcr,mwr->...hwc", y.astype(mmd), d,
                                    preferred_element_type=jnp.float32),
                         out_dtype)
        else:
            xs = (x if is_stacked
                  else jnp.stack([x.real, x.imag], axis=-1)).astype(mmd)
            y = jnp.einsum("...lmcr,hlm->...hmcr", xs, md,
                           preferred_element_type=jnp.float32)
            xf = jax.lax.complex(y[..., 0], y[..., 1])
        # pad azimuthal modes up to nlon//2+1 if truncated, then Hermitian inverse FFT
        full_m = self.nlon // 2 + 1
        if self.mmax < full_m:
            pad = [(0, 0)] * (xf.ndim - 2) + [(0, full_m - self.mmax), (0, 0)]
            xf = jnp.pad(xf, pad)
        out = jnp.fft.irfft(xf, n=self.nlon, axis=-2, norm="forward")
        return out
