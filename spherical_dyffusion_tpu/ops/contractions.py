"""Complex spectral-weight contractions for the SFNO filter.

TPU-native equivalents of the reference's torch.jit contraction kernels
(src/models/sfno/contractions.py:18-193). Channels-last spectral layout
``(..., l, m, c_in)``; weights are stored as real (..., 2) pairs exactly like
the reference's ``nn.Parameter(torch.randn(*shape, 2))`` so that checkpoint
conversion is a pure reshape.

Operator types (reference s2convolutions.py:126-133):
* ``diagonal``: per-(l, m) full channel mixing  — weight (c_in, c_out, l, m, 2)
* ``dhconv``:   per-l channel mixing (Driscoll-Healy convolution theorem)
                — weight (c_in, c_out, l, 2)
Separable variants drop the c_out axis and multiply elementwise per channel.

The contraction is the MXU hot spot of the whole model: for ``dhconv`` it is a
single batched complex matmul with batch dim l, contracting c_in -> c_out.
Complex arithmetic is decomposed explicitly into real matmuls so that XLA maps
it onto the MXU without materializing complex intermediates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _effective_matmul_dtype(requested):
    """bf16 dots are unsupported by the XLA-CPU DotThunk; f32 there."""
    if requested is not None and jax.default_backend() == "cpu":
        return None
    return requested

__all__ = ["contract_dhconv", "contract_dhconv_stacked",
           "contract_dhconv_stacked4", "contract_diagonal",
           "contract_dhconv_cp", "contract_dhconv_tucker", "contract_dhconv_tt",
           "contract", "cp_spatial_project", "cp_spectral_scale_stacked",
           "cp_spatial_expand", "tucker_rank_kernel",
           "tucker_spectral_mix_stacked"]


def _emit(y, out_dtype):
    """Round a spectral-stage output to the spectral-IO dtype (see
    ops/sht.py:_emit — the bytes lever for the materialized intermediates)."""
    if out_dtype is None:
        return y
    return y.astype(out_dtype)


def _as_complex(w: jax.Array) -> jax.Array:
    """(..., 2) real pair -> complex."""
    return jax.lax.complex(w[..., 0], w[..., 1])


def contract_dhconv(x: jax.Array, w: jax.Array, separable: bool = False,
                    matmul_dtype=None) -> jax.Array:
    """Driscoll-Healy conv: x (..., l, m, ci), w (ci[, co], l, 2) -> (..., l, m, co).

    Equivalent of reference ``_contract_dhconv`` (contractions.py: 'bixl,iol->boxl'
    in NCHW; ours is channels-last). ``matmul_dtype`` (e.g. bfloat16) sets the
    matmul input dtype with fp32 accumulation.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    wr, wi = w[..., 0], w[..., 1]
    xr, xi = x.real, x.imag
    if matmul_dtype is not None:
        wr, wi = wr.astype(matmul_dtype), wi.astype(matmul_dtype)
        xr, xi = xr.astype(matmul_dtype), xi.astype(matmul_dtype)
    if separable:
        # w: (ci, l) -> broadcast over m
        wr_b = jnp.transpose(wr)[..., :, None, :]  # (l, 1, ci)
        wi_b = jnp.transpose(wi)[..., :, None, :]
        yr = xr * wr_b - xi * wi_b
        yi = xr * wi_b + xi * wr_b
    else:
        # batched matmul over l: (..., l, m, ci) x (ci, co, l) -> (..., l, m, co)
        def mm(a, ww):
            return jnp.einsum("...lmi,iol->...lmo", a, ww,
                              preferred_element_type=jnp.float32)
        yr = mm(xr, wr) - mm(xi, wi)
        yi = mm(xr, wi) + mm(xi, wr)
    return jax.lax.complex(yr, yi)


def contract_dhconv_stacked4(x: jax.Array, w: jax.Array, matmul_dtype=None,
                             out_dtype=None) -> jax.Array:
    """Four-GEMM Driscoll-Healy conv on the stacked real layout.

    Same math as ``contract_dhconv`` but consuming/producing the stacked
    ``(..., l, m, c, 2)`` layout of ``RealSHT(stacked=True)`` — no complex64
    (= f32 pair) materialization anywhere, so with ``out_dtype=bfloat16`` the
    whole spectral pipeline's intermediates cross HBM at half width. Keeps
    the four-smaller-GEMMs schedule that measured faster than the merged
    single GEMM (``contract_dhconv_stacked``) at paper scale.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    xr, xi = x[..., 0], x[..., 1]
    wr, wi = w[..., 0], w[..., 1]
    if matmul_dtype is not None:
        wr, wi = wr.astype(matmul_dtype), wi.astype(matmul_dtype)
        xr, xi = xr.astype(matmul_dtype), xi.astype(matmul_dtype)

    def mm(a, ww):
        return jnp.einsum("...lmi,iol->...lmo", a, ww,
                          preferred_element_type=jnp.float32)

    yr = mm(xr, wr) - mm(xi, wi)
    yi = mm(xr, wi) + mm(xi, wr)
    return _emit(jnp.stack([yr, yi], axis=-1), out_dtype)


def contract_dhconv_stacked(x: jax.Array, w: jax.Array,
                            matmul_dtype=None, out_dtype=None) -> jax.Array:
    """Merged-GEMM Driscoll-Healy conv on the stacked real layout.

    x: (..., l, m, ci, 2) real (``RealSHT(..., stacked=True)`` output),
    w: (ci, co, l, 2) — the SAME parameter layout as ``contract_dhconv``.

    All four real products (xr*wr, xr*wi, xi*wr, xi*wi) are computed by ONE
    batched dot_general (batch l, M = m*2, K = ci, N = co*2) instead of four
    (M = m, K = ci, N = co): the weight tensor crosses HBM once per call
    instead of twice, the activations once instead of twice, and the GEMM
    tiles are twice as large on both free dimensions — the same fusion that
    made the SHT's r-axis formulation faster. The complex combine is a cheap
    elementwise epilogue that XLA fuses.

    Returns (..., l, m, co, 2) real — fed straight to ``InverseRealSHT``.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    xd, wd = x, w
    if matmul_dtype is not None:
        xd, wd = x.astype(matmul_dtype), w.astype(matmul_dtype)
    # (..., l, m, i, r) x (i, o, l, q) -> (..., l, m, r, o, q)
    p = jnp.einsum("...lmir,iolq->...lmroq", xd, wd,
                   preferred_element_type=jnp.float32)
    yr = p[..., 0, :, 0] - p[..., 1, :, 1]
    yi = p[..., 0, :, 1] + p[..., 1, :, 0]
    return _emit(jnp.stack([yr, yi], axis=-1), out_dtype)


def contract_diagonal(x: jax.Array, w: jax.Array, separable: bool = False,
                      matmul_dtype=None) -> jax.Array:
    """Per-(l, m) weights: x (..., l, m, ci), w (ci[, co], l, m, 2) -> (..., l, m, co).

    Equivalent of reference ``_contract_diagonal`` ('bixy,ioxy->boxy' in NCHW).
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    wr, wi = w[..., 0], w[..., 1]
    xr, xi = x.real, x.imag
    if matmul_dtype is not None:
        wr, wi = wr.astype(matmul_dtype), wi.astype(matmul_dtype)
        xr, xi = xr.astype(matmul_dtype), xi.astype(matmul_dtype)
    if separable:
        wr_b = jnp.moveaxis(wr, 0, -1)  # (l, m, ci)
        wi_b = jnp.moveaxis(wi, 0, -1)
        yr = xr * wr_b - xi * wi_b
        yi = xr * wi_b + xi * wr_b
    else:
        def mm(a, ww):
            return jnp.einsum("...lmi,iolm->...lmo", a, ww,
                              preferred_element_type=jnp.float32)
        yr = mm(xr, wr) - mm(xi, wi)
        yi = mm(xr, wi) + mm(xi, wr)
    return jax.lax.complex(yr, yi)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def contract_dhconv_cp(x: jax.Array, factors: dict, matmul_dtype=None) -> jax.Array:
    """CP-factorized Driscoll-Healy contraction (the reference's tltorch
    ComplexCP path, s2convolutions.py:133-143 + factorizations.py:_contract_cp).

    weight[ci, co, l] = sum_r A[ci, r] * B[co, r] * C[l, r]  (complex), so

        y = ((x @ A) * C[l]) @ B^T

    — two rank-R matmuls plus a per-l scaling instead of a dense per-l matmul.
    factors: {"A": (ci, R, 2), "B": (co, R, 2), "C": (l, R, 2)}.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    Ar, Ai = factors["A"][..., 0], factors["A"][..., 1]
    Br, Bi = factors["B"][..., 0], factors["B"][..., 1]
    Cr, Ci = factors["C"][..., 0], factors["C"][..., 1]
    xr, xi = x.real, x.imag
    if matmul_dtype is not None:
        cast = lambda *ts: [t.astype(matmul_dtype) for t in ts]  # noqa: E731
        Ar, Ai, Br, Bi, xr, xi = cast(Ar, Ai, Br, Bi, xr, xi)

    def mm(a, b, sub="...lmi,ir->...lmr"):
        return jnp.einsum(sub, a, b, preferred_element_type=jnp.float32)

    # project channels to rank
    pr = mm(xr, Ar) - mm(xi, Ai)
    pi = mm(xr, Ai) + mm(xi, Ar)
    # per-l complex scale: (..., l, m, r) * (l, 1, r)
    sr, si = _cmul(pr, pi, Cr[:, None, :], Ci[:, None, :])
    if matmul_dtype is not None:
        sr, si = sr.astype(matmul_dtype), si.astype(matmul_dtype)
    # expand rank to output channels
    yr = mm(sr, Br.T, "...lmr,ro->...lmo") - mm(si, Bi.T, "...lmr,ro->...lmo")
    yi = mm(sr, Bi.T, "...lmr,ro->...lmo") + mm(si, Br.T, "...lmr,ro->...lmo")
    return jax.lax.complex(yr, yi)


def cp_spatial_project(x: jax.Array, A: jax.Array, matmul_dtype=None,
                       out_dtype=None) -> jax.Array:
    """Rank-space pipeline stage 1: project channels to rank IN GRID SPACE.

    Channel mixing commutes with the (channel-wise) SHT, so the CP input
    projection ``SHT(x) @ A`` with complex ``A = Ar + i*Ai`` can be evaluated
    as two REAL spatial GEMMs before the transform:

        SHT(x) @ A = SHT(x @ Ar) + i * SHT(x @ Ai)

    x: (..., h, w, ci) real; A: (ci, R, 2). Returns (..., h, w, 2R) real with
    channels ``[x@Ar | x@Ai]`` — one SHT over 2R channels then recovers the
    complex rank-space spectrum (see ``cp_spectral_scale_stacked``). With
    R = ci/4 the downstream transform runs on HALF the channels (2R vs ci):
    half the Legendre/DFT bytes and FLOPs, and the dense per-l dhconv GEMM
    disappears entirely.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    Ar2 = jnp.concatenate([A[..., 0], A[..., 1]], axis=-1)  # (ci, 2R)
    xd = x
    if matmul_dtype is not None:
        xd, Ar2 = x.astype(matmul_dtype), Ar2.astype(matmul_dtype)
    return _emit(jnp.einsum("...hwc,cr->...hwr", xd, Ar2,
                            preferred_element_type=jnp.float32), out_dtype)


def cp_spectral_scale_stacked(zs: jax.Array, C: jax.Array) -> jax.Array:
    """Rank-space pipeline stage 2: per-l complex scale on the stacked layout.

    zs: (..., l, m, 2R, 2) — ``RealSHT(stacked=True)`` of the
    ``cp_spatial_project`` output, i.e. channels ``[SHT(x@Ar) | SHT(x@Ai)]``
    as (re, im) pairs. The complex rank spectrum is p = S_r + i*S_i; this
    applies s = p * C[l] and returns the stacked channel pair ``[s | i*s]``
    (..., l, m, 2R, 2) — exactly what the real-linear ISHT needs so that the
    complex output projection B can move AFTER the inverse transform:

        ISHT(s @ B^T)_o = sum_r Br[o,r]*ISHT(s_r) + Bi[o,r]*ISHT(i*s_r)

    C: (l, R, 2). Pure elementwise — fuses into the surrounding GEMMs.
    """
    R = zs.shape[-2] // 2
    Sr, Si = zs[..., :R, :], zs[..., R:, :]
    p_re = Sr[..., 0] - Si[..., 1]
    p_im = Sr[..., 1] + Si[..., 0]
    Cr = C[..., 0][:, None, :]  # (l, 1, R) broadcasting over m
    Ci = C[..., 1][:, None, :]
    s_re = p_re * Cr - p_im * Ci
    s_im = p_re * Ci + p_im * Cr
    return jnp.concatenate(
        [jnp.stack([s_re, s_im], axis=-1), jnp.stack([-s_im, s_re], axis=-1)],
        axis=-2,
    )


def cp_spatial_expand(g: jax.Array, B: jax.Array, matmul_dtype=None,
                      out_dtype=None) -> jax.Array:
    """Rank-space pipeline stage 3: expand rank to output channels IN GRID SPACE.

    g: (..., h, w, 2R) real — ISHT of the ``cp_spectral_scale_stacked`` output,
    channels ``[G | H]`` with G_r = ISHT(s_r), H_r = ISHT(i*s_r).
    B: (co, R, 2). out_o = sum_r Br[o,r] G_r + Bi[o,r] H_r — one real GEMM.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    W2 = jnp.concatenate([B[..., 0], B[..., 1]], axis=-1).T  # (2R, co)
    gd = g
    if matmul_dtype is not None:
        gd, W2 = g.astype(matmul_dtype), W2.astype(matmul_dtype)
    return _emit(jnp.einsum("...hwr,ro->...hwo", gd, W2,
                            preferred_element_type=jnp.float32), out_dtype)


def tucker_rank_kernel(core: jax.Array, C: jax.Array) -> jax.Array:
    """Per-l rank-space mixing kernel for the Tucker rank pipeline.

    K[l, p, q] = sum_r core[p, q, r] * C[l, r]  (complex, stored as (..., 2)
    real pairs). Tiny (l, R, R) tensor computed once per call from the
    factors; the Tucker analog of CP's per-l scale.
    """
    cr, ci = core[..., 0], core[..., 1]
    Cr, Ci = C[..., 0], C[..., 1]
    Kr = jnp.einsum("pqr,lr->lpq", cr, Cr) - jnp.einsum("pqr,lr->lpq", ci, Ci)
    Ki = jnp.einsum("pqr,lr->lpq", cr, Ci) + jnp.einsum("pqr,lr->lpq", ci, Cr)
    return jnp.stack([Kr, Ki], axis=-1)


def tucker_spectral_mix_stacked(zs: jax.Array, K: jax.Array,
                                matmul_dtype=None, out_dtype=None) -> jax.Array:
    """Tucker rank pipeline stage 2: per-l complex R->R mix, stacked layout.

    zs: (..., l, m, 2R, 2) — ``RealSHT(stacked=True)`` of the grid-space
    rank projection (channels ``[SHT(x@Ar) | SHT(x@Ai)]``, see
    ``cp_spatial_project``). K: (l, R, R, 2) from ``tucker_rank_kernel``.
    Applies q = p @ K[l] on the complex rank spectrum p and returns the
    stacked pair ``[q | i*q]`` (..., l, m, 2R, 2) for the real-linear ISHT —
    identical structure to ``cp_spectral_scale_stacked`` but with a per-l
    batched rank-space GEMM (M=m, K=R, N=R — small, l-batched) instead of an
    elementwise scale.
    """
    matmul_dtype = _effective_matmul_dtype(matmul_dtype)
    R = zs.shape[-2] // 2
    Sr, Si = zs[..., :R, :], zs[..., R:, :]
    p_re = Sr[..., 0] - Si[..., 1]
    p_im = Sr[..., 1] + Si[..., 0]
    Kr, Ki = K[..., 0], K[..., 1]
    if matmul_dtype is not None:
        p_re, p_im = p_re.astype(matmul_dtype), p_im.astype(matmul_dtype)
        Kr, Ki = Kr.astype(matmul_dtype), Ki.astype(matmul_dtype)

    def mm(a, k):
        return jnp.einsum("...lmp,lpq->...lmq", a, k,
                          preferred_element_type=jnp.float32)

    q_re = mm(p_re, Kr) - mm(p_im, Ki)
    q_im = mm(p_re, Ki) + mm(p_im, Kr)
    return _emit(jnp.concatenate(
        [jnp.stack([q_re, q_im], axis=-1), jnp.stack([-q_im, q_re], axis=-1)],
        axis=-2,
    ), out_dtype)


def contract_dhconv_tucker(x: jax.Array, factors: dict, matmul_dtype=None) -> jax.Array:
    """Tucker-factorized Driscoll-Healy contraction (reference tltorch
    ComplexTucker path, factorizations.py:_contract_tucker):

        W[i, o, l] = sum_{r1 r2 r3} G[r1, r2, r3] A[i, r1] B[o, r2] C[l, r3]

    evaluated as  project -> per-l core mix -> expand. factors:
    {"A": (ci, R1, 2), "B": (co, R2, 2), "C": (l, R3, 2), "core": (R1, R2, R3, 2)}.
    """
    A = _as_complex(factors["A"])
    B = _as_complex(factors["B"])
    C = _as_complex(factors["C"])
    G = _as_complex(factors["core"])
    # per-l mixing kernel K[l, r1, r2] = sum_r3 G[r1, r2, r3] C[l, r3]
    K = jnp.einsum("pqr,lr->lpq", G, C)
    p = jnp.einsum("...lmi,ip->...lmp", x.astype(jnp.complex64), A)
    q = jnp.einsum("...lmp,lpq->...lmq", p, K)
    return jnp.einsum("...lmq,oq->...lmo", q, B)


def contract_dhconv_tt(x: jax.Array, factors: dict, matmul_dtype=None) -> jax.Array:
    """Tensor-train-factorized Driscoll-Healy contraction (reference tltorch
    ComplexTT path, factorizations.py:_contract_tt):

        W[i, o, l] = sum_{a b} G1[i, a] G2[a, o, b] G3[b, l]

    factors: {"G1": (ci, R1, 2), "G2": (R1, co, R2, 2), "G3": (R2, l, 2)}.
    """
    G1 = _as_complex(factors["G1"])
    G2 = _as_complex(factors["G2"])
    G3 = _as_complex(factors["G3"])
    p = jnp.einsum("...lmi,ia->...lma", x.astype(jnp.complex64), G1)
    q = jnp.einsum("...lma,aob->...lmob", p, G2)
    return jnp.einsum("...lmob,bl->...lmo", q, G3)


def contract(x: jax.Array, w: jax.Array, operator_type: str, separable: bool = False,
             matmul_dtype=None, use_pallas: bool = False) -> jax.Array:
    if use_pallas and operator_type == "dhconv" and not separable:
        from .pallas_contractions import PALLAS_AVAILABLE, dhconv_pallas

        if PALLAS_AVAILABLE:
            # interpret mode off-TPU (the Mosaic backend is TPU-only)
            return dhconv_pallas(x, w, interpret=jax.default_backend() != "tpu")
    if operator_type == "dhconv":
        return contract_dhconv(x, w, separable, matmul_dtype)
    if operator_type == "diagonal":
        return contract_diagonal(x, w, separable, matmul_dtype)
    raise ValueError(f"Unsupported operator_type {operator_type!r}")
