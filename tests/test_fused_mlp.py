"""Fused block-MLP Pallas kernel (ops/fused_mlp.py).

The kernel fuses GEMM+gelu+quantized-dropout+GEMM+outer-skip into one
VMEM-resident pass (reference MLP of 1x1 convs, models/sfno/layers.py:53, and
the outer skip of sfnonet.py:330-335). On CPU the deterministic leg runs
under the Pallas interpreter and must match the plain-jnp math exactly; the
in-kernel hardware PRNG has no CPU interpreter, so the dropout leg is covered
by the module-level fallback guard instead (real-TPU numbers live in
results/BENCHMARKS.md via BENCH_FUSED_MLP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
from spherical_dyffusion_tpu.ops.fused_mlp import FUSED_MLP_AVAILABLE, fused_mlp

pytestmark = pytest.mark.skipif(
    not FUSED_MLP_AVAILABLE, reason="pallas unavailable")


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)


@pytest.mark.parametrize("exact_gelu", [False, True])
@pytest.mark.parametrize("with_residual", [False, True])
def test_kernel_matches_plain_jnp(exact_gelu, with_residual):
    r = np.random.default_rng(0)
    x = _rand(r, 2, 8, 16, 12)
    w1, b1 = _rand(r, 12, 24), _rand(r, 24)
    w2, b2 = _rand(r, 24, 12), _rand(r, 12)
    res = _rand(r, 2, 8, 16, 12) if with_residual else None
    y = fused_mlp(x, w1, b1, w2, b2, residual=res,
                  exact_gelu=exact_gelu, interpret=True)
    ref = jax.nn.gelu(x @ w1 + b1, approximate=not exact_gelu) @ w2 + b2
    if with_residual:
        ref = ref + res
    assert y.shape == ref.shape and y.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_kernel_partial_tile_rows_masked():
    """Rows beyond N in the final partial tile must never escape."""
    r = np.random.default_rng(1)
    x = _rand(r, 1, 3, 5, 8)  # 15 rows, tile_rows 8 -> final tile 7/8 rows
    w1, b1 = _rand(r, 8, 16), _rand(r, 16)
    w2, b2 = _rand(r, 16, 8), _rand(r, 8)
    y = fused_mlp(x, w1, b1, w2, b2, tile_rows=8, interpret=True)
    ref = jax.nn.gelu(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_drop_rate_validation():
    r = np.random.default_rng(2)
    x = _rand(r, 4, 8)
    w1, b1 = _rand(r, 8, 16), _rand(r, 16)
    w2, b2 = _rand(r, 16, 8), _rand(r, 8)
    with pytest.raises(ValueError, match="requires rng"):
        fused_mlp(x, w1, b1, w2, b2, drop_rate=0.5, interpret=True)
    with pytest.raises(ValueError, match="keep-nothing"):
        fused_mlp(x, w1, b1, w2, b2, drop_rate=0.999,
                  rng=jax.random.PRNGKey(0), interpret=True)


def _sfno_cfg(**kw):
    base = dict(img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=8,
                num_layers=2, mlp_ratio=2.0)
    base.update(kw)
    return SFNOConfig(**base)


def test_sfno_fused_shares_param_tree_and_matches():
    """fused_mlp=True must share the checkpoint tree bit-for-bit with the
    standard path (so the flag flips freely on loaded weights) and produce
    the same deterministic forward."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 16, 32, 3)), jnp.float32)
    std = SFNO(_sfno_cfg(fused_mlp=False))
    fus = SFNO(_sfno_cfg(fused_mlp=True))
    p_std = std.init(jax.random.PRNGKey(0), x)
    p_fus = fus.init(jax.random.PRNGKey(0), x)
    flat_s = jax.tree_util.tree_flatten_with_path(p_std)
    flat_f = jax.tree_util.tree_flatten_with_path(p_fus)
    assert [k for k, _ in flat_s[0]] == [k for k, _ in flat_f[0]]
    for (_, a), (_, b) in zip(flat_s[0], flat_f[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_std = std.apply(p_std, x)
    y_fus = fus.apply(p_fus, x)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_std),
                               rtol=0, atol=2e-5)


def test_sfno_fused_dropout_falls_back_on_cpu():
    """drop_active on CPU has no in-kernel PRNG interpreter: the module must
    route to the standard QuantizedDropout path and still run."""
    cfg = _sfno_cfg(fused_mlp=True, dropout_mlp=0.2)
    model = SFNO(cfg)
    x = jnp.ones((1, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(y)).all()
    # dropout actually fired (outputs differ from deterministic)
    y_det = model.apply(params, x)
    assert not np.allclose(np.asarray(y), np.asarray(y_det))


def test_tail_kernel_matches_affine_plus_mlp():
    """fused_block_tail (round-5 boundary-corrected variant): the in-kernel
    per-(batch,channel) affine + GEMM + gelu + GEMM + skip must match the
    plain-jnp composition exactly under the interpreter."""
    from spherical_dyffusion_tpu.ops.fused_mlp import fused_block_tail

    r = np.random.default_rng(7)
    B = 2
    x = _rand(r, B, 8, 16, 12)
    A = _rand(r, B, 1, 1, 12) + 1.0
    C = _rand(r, B, 1, 1, 12)
    w1, b1 = _rand(r, 12, 24), _rand(r, 24)
    w2, b2 = _rand(r, 24, 12), _rand(r, 12)
    res = _rand(r, B, 8, 16, 12)
    y = fused_block_tail(x, A, C, w1, b1, w2, b2, residual=res,
                         tile_rows=64, interpret=True)
    xn = x * A + C
    ref = jax.nn.gelu(xn @ w1 + b1, approximate=True) @ w2 + b2 + res
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_sfno_fused_tail_shares_param_tree_and_matches():
    """fused_tail=True: identical checkpoint tree, and the folded
    norm1+time-scale-shift+MLP+skip forward matches the standard block to
    accumulation noise (fold reassociates the norm affine in f32)."""
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 16, 32, 3)), jnp.float32)
    t = jnp.asarray([1.0, 2.0])
    kw = dict(with_time_emb=True, min_time=0, max_time=3,
              time_scale_shift_before_filter=False)
    std = SFNO(_sfno_cfg(fused_mlp=False, **kw))
    fus = SFNO(_sfno_cfg(fused_tail=True, **kw))
    p_std = std.init(jax.random.PRNGKey(0), x, time=t)
    p_fus = fus.init(jax.random.PRNGKey(0), x, time=t)
    flat_s = jax.tree_util.tree_flatten_with_path(p_std)
    flat_f = jax.tree_util.tree_flatten_with_path(p_fus)
    assert [k for k, _ in flat_s[0]] == [k for k, _ in flat_f[0]]
    for (_, a), (_, b) in zip(flat_s[0], flat_f[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_std = std.apply(p_std, x, time=t)
    y_fus = fus.apply(p_fus, x, time=t)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_std),
                               rtol=0, atol=5e-5)


def test_scan_carry_dtype_stable_mixed_precision_mc_dropout():
    """Regression (round 5): under compute_dtype=bfloat16 the block residual
    stream rides f32 (fp32-pinned spectral transforms), so every FNOBlock
    must emit the same promoted dtype whether the outer skip is added
    in-kernel (fused_tail / fused_mlp with residual) or outside — otherwise
    the blocks_mid lax.scan carry changes dtype between the unrolled first
    block and the scanned body. Reproduces the BENCH_FUSED_TAIL=1 failure:
    scan_layers + bf16 + MC dropout + traced per-layer drop_path rates."""
    import spherical_dyffusion_tpu.models.modules as mod

    orig = jax.default_backend
    try:
        # force the fused (non-interpret) trace path without a TPU: only
        # shapes/dtypes are checked, nothing executes
        jax.default_backend = lambda: "tpu"
        for tail in (False, True):
            cfg = _sfno_cfg(
                embed_dim=16, num_layers=4, with_time_emb=True,
                compute_dtype="bfloat16", scan_layers=True, fused_tail=tail,
                dropout_mlp=0.1, drop_path_rate=0.1, min_time=1, max_time=3)
            model = SFNO(cfg)
            x = jnp.ones((1, 16, 32, 3), jnp.float32)
            t = jnp.asarray([1.0])
            shapes = jax.eval_shape(
                lambda r: model.init(r, x, time=t), jax.random.PRNGKey(0))
            out = jax.eval_shape(
                lambda p, r: model.apply(p, x, time=t, deterministic=False,
                                         rngs={"dropout": r}),
                shapes, jax.random.PRNGKey(1))
            assert out.shape == (1, 16, 32, 3)
    finally:
        jax.default_backend = orig


def test_droppath_preserves_dtype_with_traced_rate():
    """DropPath with a traced f32 rate (scan xs) must not promote bf16
    activations to f32 (regression: x / keep promoted the scan carry)."""
    from spherical_dyffusion_tpu.models.modules import DropPath

    dp = DropPath(0.0)
    x = jnp.ones((2, 4, 4, 8), jnp.bfloat16)
    out = jax.eval_shape(
        lambda x, r, k: dp.apply({}, x, deterministic=False, rate=r,
                                 rngs={"dropout": k}),
        x, jnp.float32(0.05), jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16
