"""Planar real FFT transforms matching the SHT interface.

TPU-native equivalent of the reference's ``RealFFT2``/``InverseRealFFT2``
wrappers (src/models/sfno/layers.py:96-155), used when the SFNO is configured
with ``spectral_transform="fft"`` for periodic (non-spherical) domains.
Channels-last layout ``(..., H, W, C)``; spectral space ``(..., lmax, mmax, C)``
complex64 where lmax truncates the (signed) meridional frequencies and mmax the
non-negative zonal frequencies.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["RealFFT2", "InverseRealFFT2"]


@dataclasses.dataclass(frozen=True)
class RealFFT2:
    nlat: int
    nlon: int
    lmax: int
    mmax: int
    grid: str = "fft"  # interface parity with the SHT classes

    @staticmethod
    def create(nlat, nlon, lmax=None, mmax=None):
        lmax = lmax if lmax is not None else nlat
        mmax = mmax if mmax is not None else nlon // 2 + 1
        return RealFFT2(nlat, nlon, lmax, mmax)

    @property
    def _lmax_half(self) -> tuple[int, int]:
        # keep the lowest |frequencies|: ceil(lmax/2) non-negative, floor(lmax/2) negative
        lpos = (self.lmax + 1) // 2
        lneg = self.lmax // 2
        return lpos, lneg

    def __call__(self, x: jax.Array, matrix=None, dft=None) -> jax.Array:  # matrix/dft unused (API parity with SHT)
        x = x.astype(jnp.float32)
        xf = jnp.fft.rfft(x, axis=-2, norm="ortho")[..., : self.mmax, :]
        xf = jnp.fft.fft(xf, axis=-3, norm="ortho")
        lpos, lneg = self._lmax_half
        parts = [xf[..., :lpos, :, :]]
        if lneg > 0:
            parts.append(xf[..., -lneg:, :, :])
        return jnp.concatenate(parts, axis=-3)


@dataclasses.dataclass(frozen=True)
class InverseRealFFT2:
    nlat: int
    nlon: int
    lmax: int
    mmax: int
    grid: str = "fft"

    @staticmethod
    def create(nlat, nlon, lmax=None, mmax=None):
        lmax = lmax if lmax is not None else nlat
        mmax = mmax if mmax is not None else nlon // 2 + 1
        return InverseRealFFT2(nlat, nlon, lmax, mmax)

    def __call__(self, x: jax.Array, matrix=None, dft=None,
                 out_dtype=None) -> jax.Array:  # matrix/dft/out_dtype unused (API parity with SHT)
        x = x.astype(jnp.complex64)
        lpos = (self.lmax + 1) // 2
        lneg = self.lmax // 2
        full_m = self.nlon // 2 + 1
        # scatter truncated freqs back into the full spectrum
        shape = x.shape[:-3] + (self.nlat, full_m) + x.shape[-1:]
        xf = jnp.zeros(shape, dtype=jnp.complex64)
        xf = xf.at[..., :lpos, : self.mmax, :].set(x[..., :lpos, :, :])
        if lneg > 0:
            xf = xf.at[..., -lneg:, : self.mmax, :].set(x[..., lpos:, :, :])
        out = jnp.fft.ifft(xf, axis=-3, norm="ortho")
        out = jnp.fft.irfft(out, n=self.nlon, axis=-2, norm="ortho")
        return out.real
