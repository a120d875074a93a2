"""SFNO backbone tests: shapes, determinism, time conditioning, grads, remat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.models import SFNO, SFNOConfig


def tiny_cfg(**kw):
    base = dict(
        img_shape=(16, 32),
        in_chans=3,
        out_chans=3,
        embed_dim=8,
        num_layers=2,
        mlp_ratio=2.0,
        pos_embed=True,
        big_skip=True,
    )
    base.update(kw)
    return SFNOConfig(**base)


def test_forward_shape_and_determinism():
    cfg = tiny_cfg()
    model = SFNO(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x)
    y2 = model.apply(params, x)
    assert y1.shape == (2, 16, 32, 3)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(y1)).all()


def test_condition_concat():
    cfg = tiny_cfg(in_chans=3)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    cond = jnp.ones((1, 16, 32, 2))
    params = model.init(jax.random.PRNGKey(0), x, condition=cond)
    y = model.apply(params, x, condition=cond)
    assert y.shape == (1, 16, 32, 3)


def test_time_embedding_changes_output():
    cfg = tiny_cfg(with_time_emb=True)
    model = SFNO(cfg)
    x = jnp.ones((2, 16, 32, 3))
    t = jnp.asarray([1.0, 2.0])
    params = model.init(jax.random.PRNGKey(0), x, time=t)
    y1 = model.apply(params, x, time=jnp.asarray([1.0, 1.0]))
    y2 = model.apply(params, x, time=jnp.asarray([5.0, 5.0]))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_scale_factor_downsampling():
    cfg = tiny_cfg(scale_factor=2)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 3)


def test_grad_flows():
    cfg = tiny_cfg(num_layers=1)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # spectral filter weight must receive gradient
    gw = g["params"]["block_0"]["filter"]["weight"]
    assert float(jnp.abs(gw).sum()) > 0


def test_dropout_stochastic_at_inference():
    """Interpolator-style stochasticity: dropout active w/ deterministic=False."""
    cfg = tiny_cfg(dropout_mlp=0.5, drop_path_rate=0.3)
    model = SFNO(cfg)
    x = jnp.ones((2, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_nonlinear_filter():
    cfg = tiny_cfg(filter_type="non-linear")
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_fft_transform_variant():
    cfg = tiny_cfg(spectral_transform="fft")
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 3)


def test_debug_mode_shrinks():
    cfg = tiny_cfg(embed_dim=64, num_layers=4, debug_mode=True)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    assert "block_3" not in params["params"]
    assert params["params"]["encoder_out"]["kernel"].shape[-1] == 16


def test_bfloat16_compute_close_to_fp32():
    cfg32 = tiny_cfg()
    cfg16 = tiny_cfg(compute_dtype="bfloat16")
    m32, m16 = SFNO(cfg32), SFNO(cfg16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 32, 3)), jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = m32.apply(params, x)
    y16 = m16.apply(params, x)  # same fp32 params, bf16 activations
    assert y16.dtype == jnp.float32  # output cast back
    err = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-8))
    assert err < 0.1, err
    assert np.isfinite(np.asarray(y16)).all()


def test_bf16_sht_matmul_accuracy():
    """bf16 SHT matmuls with fp32 accumulation stay within ~2% of fp32."""
    cfg32 = tiny_cfg()
    cfg16 = tiny_cfg(sht_matmul_dtype="bfloat16", compute_dtype="bfloat16")
    m32, m16 = SFNO(cfg32), SFNO(cfg16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 32, 3)), jnp.float32)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = m32.apply(params, x)
    y16 = m16.apply(params, x)
    err = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-8))
    assert err < 0.15, err


def test_cp_factorized_spectral_weights():
    """CP-factorized filter (reference tltorch ComplexCP path): params shrink,
    forward runs, and rank-full CP can represent the dense op."""
    cfg = tiny_cfg(factorization="cp", rank=0.5)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    blk = params["params"]["block_0"]["filter"]
    assert set(blk) >= {"cp_A", "cp_B", "cp_C"}
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 3)
    assert np.isfinite(np.asarray(y)).all()

    # numerics: CP contraction == dense contraction built from the factors
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv,
        contract_dhconv_cp,
    )

    rng = np.random.default_rng(0)
    ci, co, L, R, M = 4, 4, 6, 8, 5
    f = {k: jnp.asarray(rng.standard_normal(s), jnp.float32)
         for k, s in [("A", (ci, R, 2)), ("B", (co, R, 2)), ("C", (L, R, 2))]}
    Ac = np.asarray(f["A"][..., 0] + 1j * f["A"][..., 1])
    Bc = np.asarray(f["B"][..., 0] + 1j * f["B"][..., 1])
    Cc = np.asarray(f["C"][..., 0] + 1j * f["C"][..., 1])
    dense = np.einsum("ir,or,lr->iol", Ac, Bc, Cc)
    w_dense = jnp.stack([jnp.asarray(dense.real), jnp.asarray(dense.imag)], axis=-1)
    xs = jnp.asarray(rng.standard_normal((2, L, M, ci))
                     + 1j * rng.standard_normal((2, L, M, ci)), jnp.complex64)
    want = contract_dhconv(xs, w_dense)
    got = contract_dhconv_cp(xs, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_cp_rank_pipeline_matches_spectral_cp():
    """Rank-space CP pipeline == spectral-space CP contraction.

    The CP channel projections commute with the SHT (they act on disjoint
    axes), so ISHT(contract_cp(SHT(x))) must equal the grid-space
    project -> 2R-channel SHT -> per-l scale -> 2R-channel ISHT -> expand
    pipeline exactly (up to fp reassociation)."""
    from spherical_dyffusion_tpu.ops import InverseRealSHT, RealSHT
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv_cp,
        cp_spatial_expand,
        cp_spatial_project,
        cp_spectral_scale_stacked,
    )

    rng = np.random.default_rng(1)
    H, W, ci, co, R = 16, 32, 6, 6, 3
    sht = RealSHT.create(H, W, grid="legendre-gauss")
    isht = InverseRealSHT.create(H, W, grid="legendre-gauss")
    L = sht.lmax
    f = {k: jnp.asarray(rng.standard_normal(s), jnp.float32)
         for k, s in [("A", (ci, R, 2)), ("B", (co, R, 2)), ("C", (L, R, 2))]}
    x = jnp.asarray(rng.standard_normal((2, H, W, ci)), jnp.float32)

    want = isht(contract_dhconv_cp(sht(x), f))

    z = cp_spatial_project(x, f["A"])
    t = cp_spectral_scale_stacked(sht(z, stacked=True), f["C"])
    got = cp_spatial_expand(isht(t), f["B"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cp_rank_pipeline_model_forward_matches():
    """SFNO forward with rank_pipeline on == off (same params). num_layers=3
    so the middle block runs same-grid transforms and actually takes the
    rank-space path (first/last blocks regrid and fall back by design)."""
    import dataclasses

    cfg = tiny_cfg(factorization="cp", rank=0.5, num_layers=3,
                   rank_pipeline=True)
    model = SFNO(cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y_rank = model.apply(params, x)
    model_ref = SFNO(dataclasses.replace(cfg, rank_pipeline=False))
    y_spec = model_ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_rank), np.asarray(y_spec),
                               rtol=2e-4, atol=2e-5)


def test_tucker_rank_pipeline_matches_spectral_tucker():
    """Tucker rank-space pipeline == spectral-space Tucker contraction: the
    factor channel projections commute with the SHT, the per-l core mix
    becomes a rank-space GEMM on the stacked layout."""
    from spherical_dyffusion_tpu.ops import InverseRealSHT, RealSHT
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv_tucker,
        cp_spatial_expand,
        cp_spatial_project,
        tucker_rank_kernel,
        tucker_spectral_mix_stacked,
    )

    rng = np.random.default_rng(3)
    H, W, ci, co, R = 16, 32, 8, 8, 3
    sht = RealSHT.create(H, W, grid="legendre-gauss")
    isht = InverseRealSHT.create(H, W, grid="legendre-gauss")
    L = sht.lmax
    f = {k: jnp.asarray(rng.standard_normal(s), jnp.float32)
         for k, s in [("A", (ci, R, 2)), ("B", (co, R, 2)), ("C", (L, R, 2)),
                      ("core", (R, R, R, 2))]}
    x = jnp.asarray(rng.standard_normal((2, H, W, ci)), jnp.float32)

    want = isht(contract_dhconv_tucker(sht(x), f))

    z = cp_spatial_project(x, f["A"])
    K = tucker_rank_kernel(f["core"], f["C"])
    t = tucker_spectral_mix_stacked(sht(z, stacked=True), K)
    got = cp_spatial_expand(isht(t), f["B"])
    # the R^3 core contraction amplifies magnitudes, so reassociation noise
    # is larger than in the CP case
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-5)


def test_tucker_rank_pipeline_model_forward_matches():
    """SFNO forward with Tucker rank_pipeline on == off (same params)."""
    import dataclasses

    cfg = tiny_cfg(factorization="tucker", rank=0.5, num_layers=3,
                   rank_pipeline=True)
    model = SFNO(cfg)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 16, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y_rank = model.apply(params, x)
    model_ref = SFNO(dataclasses.replace(cfg, rank_pipeline=False))
    y_spec = model_ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_rank), np.asarray(y_spec),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fact", ["tucker", "tt"])
def test_tucker_tt_factorized_filters(fact):
    cfg = tiny_cfg(factorization=fact, rank=0.5)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda p: jnp.mean(model.apply(p, x) ** 2))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["params"]))
    assert np.isfinite(total) and total > 0


def test_tucker_tt_match_dense_equivalent():
    from spherical_dyffusion_tpu.ops.contractions import (
        contract_dhconv,
        contract_dhconv_tt,
        contract_dhconv_tucker,
    )

    rng = np.random.default_rng(0)
    ci, co, L, R, M = 3, 4, 5, 6, 7

    def c(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    xs = jnp.asarray(rng.standard_normal((2, L, M, ci))
                     + 1j * rng.standard_normal((2, L, M, ci)), jnp.complex64)

    tuck = {"A": c((ci, R, 2)), "B": c((co, R, 2)), "C": c((L, R, 2)),
            "core": c((R, R, R, 2))}
    Ac, Bc, Cc, Gc = [np.asarray(tuck[k][..., 0] + 1j * tuck[k][..., 1])
                      for k in ["A", "B", "C", "core"]]
    dense_t = np.einsum("pqr,ip,oq,lr->iol", Gc, Ac, Bc, Cc)
    w_t = jnp.stack([jnp.asarray(dense_t.real), jnp.asarray(dense_t.imag)], -1)
    np.testing.assert_allclose(
        np.asarray(contract_dhconv_tucker(xs, tuck)),
        np.asarray(contract_dhconv(xs, w_t)), atol=2e-3,
    )

    tt = {"G1": c((ci, R, 2)), "G2": c((R, co, R, 2)), "G3": c((R, L, 2))}
    G1, G2, G3 = [np.asarray(tt[k][..., 0] + 1j * tt[k][..., 1])
                  for k in ["G1", "G2", "G3"]]
    dense_tt = np.einsum("ia,aob,bl->iol", G1, G2, G3)
    w_tt = jnp.stack([jnp.asarray(dense_tt.real), jnp.asarray(dense_tt.imag)], -1)
    np.testing.assert_allclose(
        np.asarray(contract_dhconv_tt(xs, tt)),
        np.asarray(contract_dhconv(xs, w_tt)), atol=2e-3,
    )


def test_time_rescale():
    """time_rescale maps [min,max] to [0,1000] (reference set_min_max_time,
    sfnonet.py:761-773): outputs differ from the unrescaled model but are
    consistent for equivalent scaled inputs."""
    cfg = tiny_cfg(with_time_emb=True, time_rescale=True, min_time=1.0, max_time=5.0)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, time=jnp.asarray([1.0]))
    y_min = model.apply(params, x, time=jnp.asarray([1.0]))
    y_max = model.apply(params, x, time=jnp.asarray([5.0]))
    assert not np.allclose(np.asarray(y_min), np.asarray(y_max))
    # rescaled t=1 (-> 0) equals an unrescaled model at t=0 given same params
    cfg2 = tiny_cfg(with_time_emb=True, time_rescale=False)
    y0 = SFNO(cfg2).apply(params, x, time=jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(y_min), np.asarray(y0), atol=1e-5)


def test_layer_norm_variant():
    cfg = tiny_cfg(normalization_layer="layer_norm")
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    assert "scale" in params["params"]["block_0"]["norm0"]
    y = model.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()


def test_separable_and_diagonal_operators():
    for op, sep in [("diagonal", False), ("dhconv", True)]:
        cfg = tiny_cfg(operator_type=op, separable=sep)
        model = SFNO(cfg)
        x = jnp.ones((1, 16, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 16, 32, 3), (op, sep)
        assert np.isfinite(np.asarray(y)).all()


def test_merged_dhconv_matches_default():
    """merged_dhconv=True (single merged batched GEMM on the stacked layout)
    must be numerically equivalent to the default four-GEMM dhconv — the flag
    only swaps the contraction formulation (kept opt-in: measured ~3% slower
    at paper scale on v5e, see SpectralConvS2.merged_dhconv)."""
    import dataclasses as dc

    cfg = tiny_cfg()
    model = SFNO(cfg)
    model_m = SFNO(dc.replace(cfg, merged_dhconv=True))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    ym = model_m.apply(params, x)  # same param tree: flag changes no shapes
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y), atol=2e-5)


def test_quantized_dropout_statistics():
    """QuantizedDropout (u8 random bits, +13.9% end-to-end vs f32 bernoulli
    masks) must be exact inverted dropout at the quantized keep rate:
    E[out] == in, keep fraction == round(keep*256)/256, kept values scaled
    by exactly 1/keep_q; deterministic path is identity; odd trailing dims
    fall back to nn.Dropout."""
    from spherical_dyffusion_tpu.models.modules import QuantizedDropout

    m = QuantizedDropout(0.1)
    x = jnp.ones((4, 64, 64, 8))
    y = np.asarray(
        m.apply({}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
    )
    t = int(round(0.9 * 256))
    keep_q = t / 256.0
    assert abs((y != 0).mean() - keep_q) < 0.01
    assert abs(y.mean() - 1.0) < 0.01
    np.testing.assert_allclose(y[y != 0], 1.0 / keep_q, rtol=1e-6)
    # deterministic -> identity
    y2 = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))
    # odd last dim falls back to nn.Dropout (still correct statistics)
    y3 = np.asarray(
        QuantizedDropout(0.5).apply(
            {}, jnp.ones((64, 129)), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)})
    )
    assert abs((y3 != 0).mean() - 0.5) < 0.05


def test_norm_one_pass_vs_exact():
    """The fast one-pass norm (E[x^2]-E[x]^2, +15% end-to-end) must match the
    exact two-pass torch form to f32 rounding in the realistic activation
    regime, and the exact form must stay available for reference-checkpoint
    parity (auto-selected by translate_reference_hparams)."""
    from spherical_dyffusion_tpu.models.modules import InstanceNorm2d

    x = jnp.asarray(
        np.random.default_rng(0).normal(2.0, 1.0, (2, 32, 64, 8)), jnp.float32
    )
    fast = InstanceNorm2d(features=8)
    ex = InstanceNorm2d(features=8, exact=True)
    p = fast.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(fast.apply(p, x)), np.asarray(ex.apply(p, x)), atol=1e-4
    )
    # exact path == f64 two-pass reference even in the cancellation regime
    xs = jnp.asarray(
        np.random.default_rng(1).normal(50.0, 0.5, (1, 32, 64, 4)), jnp.float32
    )
    ex4 = InstanceNorm2d(features=4, exact=True)
    pe = ex4.init(jax.random.PRNGKey(0), xs)
    y = np.asarray(ex4.apply(pe, xs))
    xf = np.asarray(xs, np.float64)
    mu = xf.mean((1, 2), keepdims=True)
    va = ((xf - mu) ** 2).mean((1, 2), keepdims=True)
    np.testing.assert_allclose(y, (xf - mu) / np.sqrt(va + 1e-6), atol=1e-3)
    # ckpt translator opts reference checkpoints into the exact form
    from spherical_dyffusion_tpu.utils.torch_convert import (
        translate_reference_hparams,
    )
    cfg = translate_reference_hparams(
        {"model_config": {"_target_": "x.SFNONet", "embed_dim": 16}}
    )
    assert cfg["model"]["exact_norm"] is True


def test_spectral_io_dtype_matches_default():
    """spectral_io_dtype="bfloat16" (emit every SHT/dhconv/ISHT stage in bf16
    on the stacked layout — the intermediate-HBM-bytes lever, see
    results/roofline) must agree with the f32-materialized default within
    bf16 rounding, for the dense dhconv, the CP rank pipeline, and the
    Tucker rank pipeline. Same param tree: the flag changes no shapes."""
    import dataclasses as dc

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 16, 32, 3)), jnp.float32)
    for extra in (
        {},  # dense dhconv
        {"factorization": "cp", "rank": 0.25, "rank_pipeline": True},
        {"factorization": "tucker", "rank": 0.25, "rank_pipeline": True},
    ):
        cfg = tiny_cfg(embed_dim=16, **extra)
        model = SFNO(cfg)
        model_io = SFNO(dc.replace(cfg, spectral_io_dtype="bfloat16"))
        params = model.init(jax.random.PRNGKey(0), x)
        y = np.asarray(model.apply(params, x))
        y_io = np.asarray(model_io.apply(params, x))
        assert y_io.dtype == np.float32  # model output dtype is unchanged
        scale = np.abs(y).max()
        np.testing.assert_allclose(y_io, y, atol=3e-2 * scale,
                                   err_msg=str(extra))


def test_spectral_io_exact_when_unset():
    """The io plumbing (stacked4 contraction routing) must be bit-exact when
    spectral_io_dtype is unset — the default path is untouched."""
    cfg = tiny_cfg()
    model = SFNO(cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 16, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(model.apply(params, x))
    y2 = np.asarray(model.apply(params, x))
    np.testing.assert_array_equal(y1, y2)


def test_scan_layers_matches_unrolled_and_converts():
    """SFNOConfig.scan_layers compiles the homogeneous middle blocks as one
    lax.scan body with stacked params. Same init rng must give a convertible
    layout: stack_block_params(unrolled) == scan layout structure, with
    forward outputs equal to reassociation noise; the converters roundtrip
    exactly (checkpoint compatibility both ways)."""
    from spherical_dyffusion_tpu.utils.params import (
        stack_block_params,
        unstack_block_params,
    )

    kw = dict(img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=8,
              num_layers=4, mlp_ratio=2.0, with_time_emb=True)
    un = SFNO(SFNOConfig(**kw))
    sc = SFNO(SFNOConfig(**kw, scan_layers=True))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 32, 3)), jnp.float32)
    t = jnp.asarray([1.0, 2.0])
    v_un = un.init(jax.random.PRNGKey(0), x, time=t)
    v_sc = sc.init(jax.random.PRNGKey(0), x, time=t)
    p_conv = {**v_sc, "params": stack_block_params(dict(v_un["params"]))}
    assert (jax.tree_util.tree_structure(v_sc["params"])
            == jax.tree_util.tree_structure(p_conv["params"]))
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(v_sc["params"])[0],
            jax.tree_util.tree_flatten_with_path(p_conv["params"])[0]):
        assert a.shape == b.shape, (k, a.shape, b.shape)
    y_un = un.apply(v_un, x, time=t)
    y_sc = sc.apply(p_conv, x, time=t)
    np.testing.assert_allclose(np.asarray(y_sc), np.asarray(y_un),
                               rtol=0, atol=1e-6)
    rt = unstack_block_params(stack_block_params(dict(v_un["params"])))
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(v_un["params"])[0],
            jax.tree_util.tree_flatten_with_path(rt)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_layers_dropout_and_grads():
    """Under scan_layers, per-layer dropout rngs split (spread still fires)
    and gradients flow into the stacked middle-block params."""
    cfg = SFNOConfig(img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=8,
                     num_layers=3, mlp_ratio=2.0, dropout_mlp=0.3,
                     scan_layers=True)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y1 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)["params"]
    stacked = jax.tree_util.tree_leaves(g["blocks_mid"])
    assert stacked and all(np.isfinite(np.asarray(l)).all() for l in stacked)
    assert any(float(jnp.abs(l).max()) > 0 for l in stacked)


def test_scan_layers_drop_path_rates_ride_scan_inputs():
    """Per-layer stochastic-depth rates are lax.scan inputs: the scanned
    model with drop_path_rate > 0 must (a) equal the unrolled model exactly
    when deterministic, (b) actually drop branches stochastically when not."""
    from spherical_dyffusion_tpu.utils.params import stack_block_params

    kw = dict(img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=8,
              num_layers=4, drop_path_rate=0.4)
    un = SFNO(SFNOConfig(**kw))
    sc = SFNO(SFNOConfig(**kw, scan_layers=True))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 16, 32, 3)), jnp.float32)
    v_un = un.init(jax.random.PRNGKey(0), x)
    v_sc = {**v_un, "params": stack_block_params(dict(v_un["params"]))}
    y_un = un.apply(v_un, x)  # deterministic: drop-path inactive
    y_sc = sc.apply(v_sc, x)
    np.testing.assert_allclose(np.asarray(y_sc), np.asarray(y_un),
                               rtol=0, atol=1e-6)
    y1 = sc.apply(v_sc, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = sc.apply(v_sc, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
