"""Prototype: block-triangular spectral pipeline vs dense rectangle.

The real SHT spectrum is triangular (coefficients vanish for l < m), but the
pipeline carries a dense (l, m, c) rectangle — so the Legendre GEMMs, the
dhconv contraction, and every HBM crossing of the spectral tensor spend
~45% of their bytes/FLOPs on structural zeros (sum_m (L-m) ~= L^2/2 vs L*M).
This prototype measures, on the real chip at the paper shape, whether
partitioning m into B blocks (block j only carries l >= l_start(j)) beats
the dense formulation despite fragmenting the batched GEMMs (the
fold_symmetry lesson: half-size matmuls can lose to padding at this scale).

Exactness-preserving: the skipped entries are exactly zero in analysis
(A[h,l,m] = 0 for l < m) and contribute nothing in synthesis.

Usage: python scripts/proto_tri_blocks.py [--blocks 1 2 4 8] [--steps 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spherical_dyffusion_tpu.ops.quadrature import dft_matrices, sht_matrices


def block_bounds(L, M, nblocks):
    """Split m into nblocks contiguous ranges; each block's l starts at its
    lowest m (coefficients with l < m are structurally zero)."""
    edges = np.linspace(0, M, nblocks + 1).astype(int)
    out = []
    for j in range(nblocks):
        m0, m1 = int(edges[j]), int(edges[j + 1])
        if m1 > m0:
            out.append((m0, m1, min(m0, L)))  # l starts at m0
    return out


def make_fns(H, W, C, L, M, nblocks, dtype):
    bounds = block_bounds(L, M, nblocks)

    def pipeline(x, A, S, Wd, d_fwd, d_inv):
        # forward DFT (full-m, shared)
        xf = jnp.einsum("...hwc,wmr->...hmcr", x.astype(dtype),
                        d_fwd.astype(dtype), preferred_element_type=jnp.float32)
        ys = []
        for (m0, m1, l0) in bounds:
            Aj = A[:, l0:, m0:m1].astype(dtype)
            zj = jnp.einsum("...hmcr,hlm->...lmcr", xf[..., m0:m1, :, :].astype(dtype),
                            Aj, preferred_element_type=jnp.float32)
            # dhconv on the l-slice: complex per-l channel mix
            wj = Wd[l0:]
            zr, zi = zj[..., 0], zj[..., 1]
            wr, wi = wj[..., 0].astype(dtype), wj[..., 1].astype(dtype)
            tr = (jnp.einsum("...lmi,lio->...lmo", zr.astype(dtype), wr,
                             preferred_element_type=jnp.float32)
                  - jnp.einsum("...lmi,lio->...lmo", zi.astype(dtype), wi,
                               preferred_element_type=jnp.float32))
            ti = (jnp.einsum("...lmi,lio->...lmo", zr.astype(dtype), wi,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("...lmi,lio->...lmo", zi.astype(dtype), wr,
                               preferred_element_type=jnp.float32))
            tj = jnp.stack([tr, ti], axis=-1)
            Sj = S[:, l0:, m0:m1].astype(dtype)
            yj = jnp.einsum("...lmcr,hlm->...hmcr", tj.astype(dtype), Sj,
                            preferred_element_type=jnp.float32)
            ys.append(yj)
        y = jnp.concatenate(ys, axis=-3)
        return jnp.einsum("...hmcr,mwr->...hwc", y.astype(dtype),
                          d_inv.astype(dtype), preferred_element_type=jnp.float32)

    def scan_fn(x, A, S, Wd, d_fwd, d_inv):
        def body(carry, _):
            out = pipeline(carry, A, S, Wd, d_fwd, d_inv)
            # renorm to keep magnitudes bounded over iterations
            out = out / (jnp.sqrt(jnp.mean(out * out)) + 1e-6)
            return out, ()
        y, _ = jax.lax.scan(body, x, None, length=ARGS.steps)
        # scalar fetched on host forces real completion (block_until_ready
        # through the axon tunnel returns early — CLAUDE.md iron rule 4)
        return y, jnp.mean(y)

    return jax.jit(scan_fn)


def main():
    global ARGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--H", type=int, default=180)
    ap.add_argument("--W", type=int, default=360)
    ap.add_argument("--C", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ARGS = ap.parse_args()
    H, W, C = ARGS.H, ARGS.W, ARGS.C
    L, M = H + 1, W // 2 + 1
    dtype = jnp.dtype(ARGS.dtype)

    A_np, S_np = sht_matrices(H, "equiangular", L, M)
    d_fwd_np, d_inv_np = dft_matrices(W, M)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    A = jnp.asarray(A_np, jnp.float32)
    S = jnp.asarray(S_np, jnp.float32)
    Wd = jnp.asarray(rng.standard_normal((L, C, C, 2)) / C, jnp.float32)
    d_fwd = jnp.asarray(d_fwd_np, jnp.float32)
    d_inv = jnp.asarray(d_inv_np, jnp.float32)

    ref = None
    for nb in ARGS.blocks:
        fn = make_fns(H, W, C, L, M, nb, dtype)
        t0 = time.time()
        y, mean = fn(x, A, S, Wd, d_fwd, d_inv)
        _ = float(mean)
        compile_s = time.time() - t0
        times = []
        for _ in range(ARGS.reps):
            t0 = time.time()
            _, mean = fn(x, A, S, Wd, d_fwd, d_inv)
            _ = float(mean)
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        if ref is None:
            ref = np.asarray(y)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(y) - ref)) / (np.max(np.abs(ref)) + 1e-9))
        print(f"blocks={nb}: median {med*1e3:.1f} ms / {ARGS.steps} steps "
              f"({med/ARGS.steps*1e3:.2f} ms/step), compile {compile_s:.0f}s, "
              f"rel-err vs dense {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
