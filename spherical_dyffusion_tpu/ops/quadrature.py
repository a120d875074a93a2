"""Quadrature rules and associated-Legendre precomputation for spherical transforms.

TPU-native reimplementation of the numerical foundations that the reference
delegates to torch_harmonics (see reference sfnonet.py:537-554 for usage).
Everything here runs once at model-build time on the host in float64 and is
then frozen into device constants, so precision is maximal and there is no
runtime cost.

Conventions
-----------
* Colatitude theta in [0, pi], index 0 = north pole side (theta ascending).
* Orthonormal spherical harmonics with Condon-Shortley phase:
    Y_l^m(theta, phi) = Pbar_l^m(cos theta) * exp(i m phi)
  with  integral_{S^2} |Y_l^m|^2 dOmega = 1, i.e.
    Pbar_l^m(x) = (-1)^m sqrt((2l+1)/(4 pi) * (l-m)!/(l+m)!) P_l^m(x).
* Forward transform (analysis):
    fhat_{l,m} = 2*pi * sum_k w_k Pbar_l^m(cos theta_k) * F_m(theta_k)
  where F_m = rfft(f, axis=lon) / nlon  and w_k are quadrature weights on
  x = cos(theta) over [-1, 1].
* Inverse transform (synthesis):
    f(theta_k, phi_j) = irfft_hermitian( sum_l fhat_{l,m} Pbar_l^m(cos theta_k) )
  (irfft without 1/n; the 1/n lives in the forward rfft).

This pair is exactly self-inverse on band-limited functions for the
legendre-gauss grid, and matches torch_harmonics' behavior structurally; any
diagonal per-(l,m) rescaling relative to torch_harmonics cancels in the
SHT -> per-mode-weight -> ISHT sandwich used by the SFNO spectral convolution
(reference s2convolutions.py:158-193), so converted checkpoints remain valid.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "legendre_gauss_nodes_weights",
    "clenshaw_curtiss_nodes_weights",
    "grid_nodes_weights",
    "precompute_legendre",
    "sht_matrices",
]


def legendre_gauss_nodes_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on x = cos(theta) in [-1, 1].

    Returned sorted by ascending colatitude (descending x).
    """
    x, w = np.polynomial.legendre.leggauss(n)
    # leggauss returns ascending x == descending theta; flip for theta ascending
    return x[::-1].copy(), w[::-1].copy()


def clenshaw_curtiss_nodes_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Clenshaw-Curtis nodes/weights (endpoints included), Waldvogel's method.

    Nodes are x_j = cos(pi * j / (n-1)), j = 0..n-1 — the "equiangular" grid of
    torch_harmonics (poles included). Returned with theta ascending.

    Reference: J. Waldvogel, "Fast Construction of the Fejer and Clenshaw-Curtis
    Quadrature Rules", BIT Numer. Math. 43 (2003).
    """
    assert n > 1
    j = np.arange(n)
    theta = np.pi * j / (n - 1)
    x = np.cos(theta)

    # Waldvogel: weights via inverse FFT of the modified moments
    n1 = n - 1
    N = np.arange(1, n1, 2)
    length = len(N)
    m = n1 - length
    v0 = np.concatenate([2.0 / N / (N - 2), [1.0 / N[-1]], np.zeros(m)])
    v2 = -v0[:-1] - v0[-1:0:-1]
    g0 = -np.ones(n1)
    g0[length] += n1
    g0[m] += n1
    g = g0 / (n1**2 - 1 + (n1 % 2))
    wcc = np.fft.ifft(v2 + g).real
    w = np.concatenate([wcc, wcc[:1]])
    # x descends (theta ascends) already: theta = 0 .. pi
    return x, w


def equiangular_cell_centered_nodes_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-centered equiangular nodes theta_j = pi (j + 1/2)/n with
    Fejer-like weights computed by exact projection (least-squares dual).

    Not used by default (torch_harmonics 'equiangular' = clenshaw-curtiss),
    provided for data grids whose latitudes are cell centers (e.g. 1-degree
    FV3GFS with lats -89.5..89.5)."""
    theta = np.pi * (np.arange(n) + 0.5) / n
    x = np.cos(theta)
    # Fejer quadrature rule of the first kind via DFT (Waldvogel 2003, eq. for w_f1)
    k = np.arange(1, n // 2 + 1)
    w = np.zeros(n)
    for jj in range(n):
        w[jj] = (2.0 / n) * (1 - 2 * np.sum(np.cos(2 * k * theta[jj]) / (4 * k**2 - 1)))
    return x, w


_GRID_FNS = {
    "legendre-gauss": legendre_gauss_nodes_weights,
    "equiangular": clenshaw_curtiss_nodes_weights,
    "equiangular-cell-centered": equiangular_cell_centered_nodes_weights,
}


def grid_nodes_weights(grid: str, nlat: int) -> tuple[np.ndarray, np.ndarray]:
    if grid not in _GRID_FNS:
        raise ValueError(f"Unknown grid {grid!r}; expected one of {sorted(_GRID_FNS)}")
    return _GRID_FNS[grid](nlat)


@functools.lru_cache(maxsize=32)
def _precompute_legendre_cached(lmax: int, mmax: int, x_key: tuple) -> np.ndarray:
    x = np.asarray(x_key, dtype=np.float64)
    return _precompute_legendre_impl(lmax, mmax, x)


def _precompute_legendre_impl(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormal associated Legendre functions Pbar_l^m(x) with CS phase.

    Returns array of shape (nlat, lmax, mmax): pct[k, l, m] = Pbar_l^m(x_k);
    zero for m > l. Uses the standard stable three-term recurrence in fully
    normalized form (no overflow up to very high degree).
    """
    nlat = x.shape[0]
    sin_t = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    pct = np.zeros((nlat, lmax, mmax), dtype=np.float64)

    # Pbar_m^m by upward recurrence in m
    pmm = np.full(nlat, np.sqrt(1.0 / (4.0 * np.pi)))  # Pbar_0^0
    for m in range(0, min(lmax, mmax)):
        if m > 0:
            # Condon-Shortley: factor -1 per unit m
            pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sin_t * pmm
        pct[:, m, m] = pmm
        if m + 1 < lmax:
            # Pbar_{m+1}^m
            plm_prev = pmm
            plm = np.sqrt(2.0 * m + 3.0) * x * pmm
            pct[:, m + 1, m] = plm
            for l in range(m + 2, lmax):
                a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
                b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
                plm, plm_prev = a * (x * plm - b * plm_prev), plm
                pct[:, l, m] = plm
    return pct


def precompute_legendre(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Cached wrapper for :func:`_precompute_legendre_impl`."""
    return _precompute_legendre_cached(lmax, mmax, tuple(np.asarray(x, np.float64).tolist()))


@functools.lru_cache(maxsize=32)
def dft_matrices(nlon: int, mmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Real DFT matrices for the longitude stage as MXU matmuls.

    On TPU, XLA lowers ``jnp.fft`` to slow windowed fusions; for climate-size
    nlon (360) an explicit DFT matmul in bf16 is several times faster and
    fuses with the Legendre stage.

    Returns
    -------
    fwd : (nlon, mmax, 2) — rfft with norm="forward":
          X_m = sum_w x_w [cos - i sin](2 pi w m / W) / W
    inv : (mmax, nlon, 2) — irfft with norm="forward" (Hermitian doubling):
          x_w = sum_m c_m [Re X_m cos + Im X_m (-sin)](2 pi w m / W),
          c_0 = 1, c_Nyquist = 1 (even W), else 2.
    """
    w = np.arange(nlon)[:, None]
    m = np.arange(mmax)[None, :]
    ang = 2.0 * np.pi * w * m / nlon
    fwd = np.stack([np.cos(ang) / nlon, -np.sin(ang) / nlon], axis=-1)
    c = np.full(mmax, 2.0)
    c[0] = 1.0
    if nlon % 2 == 0 and mmax == nlon // 2 + 1:
        c[-1] = 1.0
    inv = np.stack([(c[:, None]) * np.cos(ang.T), -(c[:, None]) * np.sin(ang.T)], axis=-1)
    return fwd, inv


def sht_matrices(
    nlat: int,
    grid: str,
    lmax: int,
    mmax: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Build the analysis and synthesis Legendre matrices.

    Returns
    -------
    analysis : (nlat, lmax, mmax) float64 — includes 2*pi * w_k quadrature.
    synthesis : (nlat, lmax, mmax) float64 — plain Pbar values.
    """
    x, w = grid_nodes_weights(grid, nlat)
    pct = precompute_legendre(lmax, mmax, x)
    analysis = (2.0 * np.pi) * w[:, None, None] * pct
    return analysis, pct
