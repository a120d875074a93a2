"""Golden tests for the spherical harmonic transform core.

The reference has no tests (SURVEY.md §4); we pin numerics via:
1. exact round-trip on the legendre-gauss grid (quadrature-exact),
2. near-exact round-trip on the equiangular (clenshaw-curtiss) grid,
3. analysis of analytic spherical harmonics built with scipy,
4. quadrature sanity (weights integrate polynomials exactly).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from spherical_dyffusion_tpu.ops import InverseRealSHT, RealSHT
from spherical_dyffusion_tpu.ops.quadrature import (
    clenshaw_curtiss_nodes_weights,
    grid_nodes_weights,
    legendre_gauss_nodes_weights,
    precompute_legendre,
)


def test_legendre_gauss_weights_integrate_polynomials():
    x, w = legendre_gauss_nodes_weights(8)
    # exact for degree <= 2n-1
    for deg in range(0, 16):
        est = np.sum(w * x**deg)
        exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
        assert abs(est - exact) < 1e-12, deg


def test_clenshaw_curtiss_weights_integrate_polynomials():
    n = 9
    x, w = clenshaw_curtiss_nodes_weights(n)
    assert abs(np.sum(w) - 2.0) < 1e-12
    # CC with n points is exact for degree <= n-1
    for deg in range(0, n):
        est = np.sum(w * x**deg)
        exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
        assert abs(est - exact) < 1e-10, deg


def test_normalized_legendre_matches_scipy():
    nlat, lmax, mmax = 16, 8, 8
    x, _ = legendre_gauss_nodes_weights(nlat)
    pct = precompute_legendre(lmax, mmax, x)
    for l in range(lmax):
        for m in range(min(l + 1, mmax)):
            # scipy lpmv includes Condon-Shortley phase
            norm = np.sqrt((2 * l + 1) / (4 * np.pi) * sps.gamma(l - m + 1) / sps.gamma(l + m + 1))
            expected = norm * sps.lpmv(m, l, x)
            np.testing.assert_allclose(pct[:, l, m], expected, atol=1e-10, err_msg=f"l={l} m={m}")


def test_orthonormality_on_gauss_grid():
    nlat = 32
    x, w = legendre_gauss_nodes_weights(nlat)
    pct = precompute_legendre(nlat, nlat, x)
    for m in [0, 1, 5]:
        P = pct[:, :, m]  # (nlat, lmax)
        gram = 2 * np.pi * (P * w[:, None]).T @ P
        ls = np.arange(m, nlat)
        np.testing.assert_allclose(gram[np.ix_(ls, ls)], np.eye(len(ls)), atol=1e-10)


@pytest.mark.parametrize(
    "grid,lmax,tol",
    [
        # gauss quadrature: exact at full band
        ("legendre-gauss", None, 5e-6),
        # clenshaw-curtiss: exact only when truncated to lmax <= nlat/2
        # (full-band aliasing into high l is inherent to the grid and matches
        # torch_harmonics behavior)
        ("equiangular", 12, 5e-6),
        ("equiangular", None, 1e-1),
    ],
)
def test_roundtrip_grid_to_grid(grid, lmax, tol):
    nlat, nlon = 24, 48
    sht = RealSHT.create(nlat, nlon, lmax=lmax, grid=grid)
    isht = InverseRealSHT.create(nlat, nlon, lmax=lmax, grid=grid)
    rng = np.random.default_rng(0)
    # band-limited random field: synthesize from random coefficients first
    coeffs = rng.standard_normal((sht.lmax, sht.mmax, 3)) + 1j * rng.standard_normal((sht.lmax, sht.mmax, 3))
    # only l >= m nonzero; m=0 must be real for a real field
    l_idx = np.arange(sht.lmax)[:, None]
    m_idx = np.arange(sht.mmax)[None, :]
    coeffs = np.where((m_idx > l_idx)[..., None], 0.0, coeffs)
    coeffs[:, 0, :] = coeffs[:, 0, :].real
    # keep away from the very highest degrees where equiangular quadrature is inexact
    coeffs[nlat - 4 :] = 0.0
    f = np.asarray(isht(jnp.asarray(coeffs, jnp.complex64)))
    f2 = np.asarray(isht(sht(jnp.asarray(f))))
    assert np.max(np.abs(f - f2)) < tol * max(1.0, np.max(np.abs(f)))


def test_analysis_of_analytic_harmonic():
    """SHT of Y_l^m must give a delta at (l, m)."""
    nlat, nlon = 32, 64
    sht = RealSHT.create(nlat, nlon, grid="legendre-gauss")
    x, _ = grid_nodes_weights("legendre-gauss", nlat)
    theta = np.arccos(x)
    phi = 2 * np.pi * np.arange(nlon) / nlon
    for l, m in [(0, 0), (3, 0), (5, 2), (10, 7)]:
        norm = np.sqrt((2 * l + 1) / (4 * np.pi) * sps.gamma(l - m + 1) / sps.gamma(l + m + 1))
        plm = norm * sps.lpmv(m, l, x)
        if m == 0:
            f = plm[:, None] * np.ones_like(phi)[None, :]
        else:
            # real field: Y + conj(Y) = 2 Re(Y)
            f = 2 * plm[:, None] * np.cos(m * phi)[None, :]
        out = np.asarray(sht(jnp.asarray(f[..., None], jnp.float32)))[..., 0]
        expected = np.zeros_like(out)
        expected[l, m] = 1.0 if m == 0 else 1.0  # coefficient of the m>=0 half-spectrum
        np.testing.assert_allclose(out.real, expected, atol=2e-5)
        np.testing.assert_allclose(out.imag, 0.0, atol=2e-5)


def test_sht_shapes_and_truncation():
    sht = RealSHT.create(12, 24, lmax=8, mmax=9, grid="equiangular")
    isht = InverseRealSHT.create(12, 24, lmax=8, mmax=9, grid="equiangular")
    x = jnp.ones((2, 12, 24, 5))
    spec = sht(x)
    assert spec.shape == (2, 8, 9, 5)
    assert spec.dtype == jnp.complex64
    out = isht(spec)
    assert out.shape == (2, 12, 24, 5)
    assert out.dtype == jnp.float32


def test_pallas_dhconv_matches_einsum():
    """Pallas dhconv kernel (interpret mode on CPU) must match the einsum
    contraction path exactly."""
    import jax

    from spherical_dyffusion_tpu.ops.contractions import contract_dhconv
    from spherical_dyffusion_tpu.ops.pallas_contractions import (
        PALLAS_AVAILABLE,
        dhconv_pallas,
    )

    if not PALLAS_AVAILABLE:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(0)
    B, L, M, CI, CO = 2, 6, 8, 8, 8
    x = jnp.asarray(
        rng.standard_normal((B, L, M, CI)) + 1j * rng.standard_normal((B, L, M, CI)),
        jnp.complex64,
    )
    w = jnp.asarray(rng.standard_normal((CI, CO, L, 2)), jnp.float32)
    want = contract_dhconv(x, w)  # (..., l, m, co) with einsum path
    got = dhconv_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got.real), np.asarray(want.real), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.imag), np.asarray(want.imag), atol=1e-4)

    # gradients (custom VJP) must match the einsum path's autodiff so the
    # kernel is valid on the training path
    def loss_pallas(w_):
        y = dhconv_pallas(x, w_, interpret=True)
        return jnp.sum(jnp.abs(y.real)) + jnp.sum(jnp.abs(y.imag))

    def loss_einsum(w_):
        y = contract_dhconv(x, w_)
        return jnp.sum(jnp.abs(y.real)) + jnp.sum(jnp.abs(y.imag))

    gp = jax.grad(loss_pallas)(w)
    ge = jax.grad(loss_einsum)(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(ge), atol=1e-3)

    # leading-dims flattening + vmap (the ensemble-eval path)
    x5 = jnp.stack([x, 2.0 * x])
    got5 = dhconv_pallas(x5, w, interpret=True)
    want5 = contract_dhconv(x5, w)
    np.testing.assert_allclose(np.asarray(got5.real), np.asarray(want5.real), atol=1e-4)
    gotv = jax.vmap(lambda a: dhconv_pallas(a, w, interpret=True))(x5)
    np.testing.assert_allclose(np.asarray(gotv.imag), np.asarray(want5.imag), atol=1e-4)


def test_sfno_use_pallas_matches_dense():
    """SFNOConfig(use_pallas=True) must produce the same forward as the einsum
    path (the flag only swaps the contraction kernel)."""
    import jax

    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.ops.pallas_contractions import PALLAS_AVAILABLE

    if not PALLAS_AVAILABLE:
        pytest.skip("pallas unavailable")
    cfg = SFNOConfig(img_shape=(8, 16), in_chans=3, out_chans=3, embed_dim=16,
                     num_layers=2, use_pallas=False)
    model = SFNO(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 16, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    want = model.apply(params, x, deterministic=True)
    model_p = SFNO(dataclasses.replace(cfg, use_pallas=True))
    got = model_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_matmul_dft_matches_fft_path():
    """The MXU matmul-DFT longitude stage must match jnp.fft numerics."""
    nlat, nlon = 16, 32
    for grid in ["legendre-gauss", "equiangular"]:
        s_fft = RealSHT.create(nlat, nlon, grid=grid)
        s_mm = RealSHT.create(nlat, nlon, grid=grid)
        import dataclasses as dc

        s_fft = dc.replace(s_fft, lon_method="fft")
        i_fft = dc.replace(InverseRealSHT.create(nlat, nlon, grid=grid), lon_method="fft")
        i_mm = InverseRealSHT.create(nlat, nlon, grid=grid)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, nlat, nlon, 3)), jnp.float32)
        a, b = s_fft(x), s_mm(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        ya, yb = i_fft(a), i_mm(a)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-5)


def test_symmetry_folded_transforms_match_unfolded():
    """Even/odd latitude folding (2x fewer Legendre FLOPs) is numerically
    identical to the plain contraction on symmetric grids."""
    import dataclasses as dc

    for grid in ["legendre-gauss", "equiangular"]:
        nlat, nlon = 24, 48
        sht = RealSHT.create(nlat, nlon, grid=grid)
        sht_f = dc.replace(sht, fold_symmetry=True)
        isht = InverseRealSHT.create(nlat, nlon, grid=grid)
        isht_f = dc.replace(isht, fold_symmetry=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, nlat, nlon, 3)), jnp.float32)
        a, b = sht(x), sht_f(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=grid)
        ya, yb = isht(a), isht_f(a)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-5,
                                   err_msg=grid)


def test_stacked_pipeline_matches_complex():
    """The fused stacked path (SHT(stacked=True) -> merged-GEMM dhconv ->
    ISHT on the stacked layout) must match the complex-typed path."""
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv,
        contract_dhconv_stacked,
    )

    rng = np.random.default_rng(7)
    H, W, L, M, CI, CO = 12, 24, 8, 9, 5, 6
    sht = RealSHT.create(H, W, lmax=L, mmax=M, grid="equiangular")
    isht = InverseRealSHT.create(H, W, lmax=L, mmax=M, grid="equiangular")
    x = jnp.asarray(rng.standard_normal((2, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((CI, CO, L, 2)) * 0.1, jnp.float32)

    spec_c = sht(x)
    spec_s = sht(x, stacked=True)
    assert spec_s.shape == (2, L, M, CI, 2)
    assert spec_s.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(spec_s[..., 0]), np.asarray(spec_c.real),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(spec_s[..., 1]), np.asarray(spec_c.imag),
                               atol=1e-6)

    y_c = contract_dhconv(spec_c, w)
    y_s = contract_dhconv_stacked(spec_s, w)
    assert y_s.shape == (2, L, M, CO, 2)
    np.testing.assert_allclose(np.asarray(y_s[..., 0]), np.asarray(y_c.real),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_s[..., 1]), np.asarray(y_c.imag),
                               atol=1e-5)

    out_c = isht(y_c)
    out_s = isht(y_s)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_c), atol=1e-5)

    # fft longitude path also supports both layouts
    sht_f = RealSHT.create(H, W, lmax=L, mmax=M, lon_method="fft")
    isht_f = InverseRealSHT.create(H, W, lmax=L, mmax=M, lon_method="fft")
    np.testing.assert_allclose(
        np.asarray(isht_f(sht_f(x, stacked=True))),
        np.asarray(isht_f(sht_f(x))), atol=1e-5)

    # folded-symmetry variant (even nlat/lmax)
    import dataclasses as dc

    sht_fold = dc.replace(sht, fold_symmetry=True)
    isht_fold = dc.replace(isht, fold_symmetry=True)
    np.testing.assert_allclose(
        np.asarray(isht_fold(sht_fold(x, stacked=True))),
        np.asarray(isht_fold(sht_fold(x))), atol=1e-5)


def test_stacked4_contraction_and_out_dtype():
    """contract_dhconv_stacked4 (four-GEMM stacked form used by the
    spectral-IO path) must equal the complex contract_dhconv exactly at f32,
    and the out_dtype emission must round each stage to bf16 without changing
    shapes/layout."""
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv,
        contract_dhconv_stacked4,
    )

    rng = np.random.default_rng(13)
    H, W, L, M, CI, CO = 12, 24, 8, 9, 5, 6
    sht = RealSHT.create(H, W, lmax=L, mmax=M, grid="equiangular")
    isht = InverseRealSHT.create(H, W, lmax=L, mmax=M, grid="equiangular")
    x = jnp.asarray(rng.standard_normal((2, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((CI, CO, L, 2)) * 0.1, jnp.float32)

    spec_c = sht(x)
    spec_s = sht(x, stacked=True)
    y_c = contract_dhconv(spec_c, w)
    y_s = contract_dhconv_stacked4(spec_s, w)
    np.testing.assert_allclose(np.asarray(y_s[..., 0]), np.asarray(y_c.real),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_s[..., 1]), np.asarray(y_c.imag),
                               atol=1e-5)

    # bf16 emission: correct dtypes, values within bf16 rounding of f32 path
    bf16 = jnp.bfloat16
    spec_b = sht(x, stacked=True, out_dtype=bf16)
    assert spec_b.dtype == bf16 and spec_b.shape == spec_s.shape
    y_b = contract_dhconv_stacked4(spec_b, w, out_dtype=bf16)
    assert y_b.dtype == bf16
    out_b = isht(y_b, out_dtype=bf16)
    assert out_b.dtype == bf16
    out_f = isht(y_s)
    scale = np.abs(np.asarray(out_f)).max()
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(out_f), atol=3e-2 * scale)

    # complex output has no narrow variant
    import pytest
    with pytest.raises(ValueError):
        sht(x, stacked=False, out_dtype=bf16)
