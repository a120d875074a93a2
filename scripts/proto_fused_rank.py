"""Prototype: fused Pallas Legendre->CP-scale->Legendre kernel (rank pipeline).

The CP/Tucker rank-space pipeline (models/sfno.py SpectralConvS2.rank_pipeline)
made a VMEM-resident fused spectral kernel feasible for the first time: the
per-l weight is a tiny (l, R) complex scale (KBs), not the dense dhconv's
(ci, co, l) 95 MB tensor that sank the round-2 megakernel analysis
(NOTES_ROUND2). This prototype fuses the three spectral stages

    t[l,m,c] = sum_h A[h,l,m] xf[h,m,c]      (Legendre analysis)
    s[l,m,:] = cp_scale(t[l,m,:], C[l])      (per-l complex scale, stacked)
    y[h,m,c] = sum_l S[h,l,m] s[l,m,c]       (Legendre synthesis)

into ONE Pallas kernel, grid over m-chunks, so the (l, m, c, 2) spectral
tensors (33 MB each at paper shape) never touch HBM. The XLA form writes t,
reads t, writes s (partially fused), reads s, writes y: the roofline README
attributes ~20 of 33 ms/step to exactly this class of intermediate traffic.

Everything rides an (r-major, channel-minor) real layout: xf is (m, h, 2*2R)
with columns [re(2R) | im(2R)], which keeps every kernel slice lane-contiguous
(the (..., c, 2) interleave would force stride-2 lane gathers).

Usage: python scripts/proto_fused_rank.py [--steps 24] [--chunk 4]
       [--dtype bfloat16|float32] [--platform cpu] (cpu uses interpret mode)
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spherical_dyffusion_tpu.ops.quadrature import dft_matrices, sht_matrices


def _pad_to(x: np.ndarray, axis: int, size: int) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return np.pad(x, pad)


def fused_kernel(A_ref, S_ref, xf_ref, cc_ref, out_ref, *, chunk, rank, dot_dtype):
    """One m-chunk: per-m Legendre GEMM -> CP scale -> synthesis GEMM.

    A_ref/S_ref: (chunk, Hp, Lp) analysis/synthesis for these m
    xf_ref:      (chunk, Hp, 4R) columns [Sr_re|Si_re|Sr_im|Si_im]
    cc_ref:      (Lp, 2R) = [Cr | Ci]
    out_ref:     (chunk, Hp, 4R)
    """
    R = rank
    cr = cc_ref[:, :R]
    ci = cc_ref[:, R : 2 * R]
    for k in range(chunk):
        A_m = A_ref[k].astype(dot_dtype)  # (Hp, Lp)
        xf_m = xf_ref[k].astype(dot_dtype)  # (Hp, 4R)
        # t[l, c] = sum_h A[h, l] xf[h, c]
        t = jax.lax.dot_general(
            A_m, xf_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sr_re = t[:, 0:R]
        si_re = t[:, R : 2 * R]
        sr_im = t[:, 2 * R : 3 * R]
        si_im = t[:, 3 * R : 4 * R]
        p_re = sr_re - si_im
        p_im = sr_im + si_re
        s_re = p_re * cr - p_im * ci
        s_im = p_re * ci + p_im * cr
        # stacked [s | i*s]: re rows [s_re | -s_im], im rows [s_im | s_re]
        s_full = jnp.concatenate([s_re, -s_im, s_im, s_re], axis=-1)
        # y[h, c] = sum_l S[h, l] s[l, c]
        y = jax.lax.dot_general(
            S_ref[k].astype(dot_dtype), s_full.astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[k] = y


def make_fused(Mp, Hp, Lp, R, chunk, dot_dtype, interpret):
    grid = (Mp // chunk,)
    kernel = functools.partial(
        fused_kernel, chunk=chunk, rank=R, dot_dtype=dot_dtype
    )

    def call(A_t, S_t, xf, cc):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk, Hp, Lp), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, Hp, Lp), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, Hp, 4 * R), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lp, 2 * R), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, Hp, 4 * R), lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, Hp, 4 * R), jnp.float32),
            interpret=interpret,
        )(A_t, S_t, xf, cc)

    return call


def xla_spectral(xf, A, S, cc, R, dtype):
    """Production-form XLA chain on the same (m, h, c4) layout: batched
    Legendre GEMMs -> elementwise CP scale -> batched synthesis GEMMs, with
    the (l, m, c) intermediates materialized by XLA as it sees fit."""
    t = jnp.einsum("mhc,mhl->mlc", xf.astype(dtype), A.astype(dtype),
                   preferred_element_type=jnp.float32)
    cr, ci = cc[:, :R], cc[:, R : 2 * R]
    p_re = t[..., 0:R] - t[..., 3 * R : 4 * R]
    p_im = t[..., 2 * R : 3 * R] + t[..., R : 2 * R]
    s_re = p_re * cr - p_im * ci
    s_im = p_re * ci + p_im * cr
    s_full = jnp.concatenate([s_re, -s_im, s_im, s_re], axis=-1)
    return jnp.einsum("mlc,mhl->mhc", s_full.astype(dtype), S.astype(dtype),
                      preferred_element_type=jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--H", type=int, default=180)
    ap.add_argument("--W", type=int, default=360)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16", help="dot input dtype")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    interpret = jax.default_backend() == "cpu"

    H, W, R = args.H, args.W, args.rank
    L, M = H + 1, W // 2 + 1
    dot_dtype = jnp.dtype(args.dtype)
    # pad h/l to the bf16 sublane tile (16) and m to the chunk
    Hp = -(-H // 16) * 16
    Lp = -(-L // 16) * 16
    Mp = -(-M // args.chunk) * args.chunk

    A_np, S_np = sht_matrices(H, "equiangular", L, M)  # (h, l, m)
    A_t = _pad_to(_pad_to(np.transpose(A_np, (2, 0, 1)), 1, Hp), 2, Lp)
    A_t = _pad_to(A_t, 0, Mp)  # (Mp, Hp, Lp)
    S_t = _pad_to(_pad_to(np.transpose(S_np, (2, 0, 1)), 1, Hp), 2, Lp)
    S_t = _pad_to(S_t, 0, Mp)

    rng = np.random.default_rng(0)
    xf_np = rng.standard_normal((M, H, 4 * R)).astype(np.float32)
    xf0 = jnp.asarray(_pad_to(_pad_to(xf_np, 1, Hp), 0, Mp))
    C_np = (rng.standard_normal((L, R, 2)) / np.sqrt(R)).astype(np.float32)
    cc = jnp.asarray(
        _pad_to(np.concatenate([C_np[..., 0], C_np[..., 1]], axis=-1), 0, Lp)
    )
    A_j, S_j = jnp.asarray(A_t, jnp.float32), jnp.asarray(S_t, jnp.float32)

    fused = make_fused(Mp, Hp, Lp, R, args.chunk, dot_dtype, interpret)

    def scan_wrap(op):
        def fn(xf, A, S, cc):
            def body(carry, _):
                out = op(A, S, carry, cc) if op is fused else op(
                    carry, A, S, cc, R, dot_dtype)
                out = out / (jnp.sqrt(jnp.mean(out * out)) + 1e-6)
                return out, ()
            y, _ = jax.lax.scan(body, xf, None, length=args.steps)
            return y, jnp.mean(y)  # scalar fetch forces completion (tunnel)
        return jax.jit(fn)

    results = {}
    for name, op in [("xla", xla_spectral), ("fused", fused)]:
        fn = scan_wrap(op)
        t0 = time.time()
        y, mean = fn(xf0, A_j, S_j, cc)
        _ = float(mean)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            _, mean = fn(xf0, A_j, S_j, cc)
            _ = float(mean)
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        results[name] = (med, np.asarray(y))
        print(f"{name}: median {med*1e3:.1f} ms / {args.steps} steps "
              f"({med/args.steps*1e3:.3f} ms/step), compile {compile_s:.0f}s",
              flush=True)

    ref, got = results["xla"][1], results["fused"][1]
    err = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
    speedup = results["xla"][0] / results["fused"][0]
    print(f"rel-err fused vs xla: {err:.2e}; speedup x{speedup:.2f}", flush=True)


if __name__ == "__main__":
    main()
