"""Analytic speed-of-light model for the DYffusion window program on TPU v5e.

Counts the MXU FLOPs and the weight-read bytes of one SFNO forward from the
architecture (no tracing), derives the per-forecast-step compute/bandwidth
lower bounds, and compares them with the measured window time to locate the
remaining headroom. The activation-traffic bound is taken from measured
fusion bandwidths (results in NOTES_ROUND3.md) rather than modeled — XLA's
fusion decisions, not the layer list, determine which intermediates touch
HBM.

Usage: python scripts/roofline.py [--embed 256] [--layers 8]
       [--measured-step-ms 33] (pass the latest bench-derived value)
"""

from __future__ import annotations

import argparse
import json

V5E_BF16_TFLOPS = 197.0  # peak MXU, bf16 inputs / f32 accumulation
V5E_HBM_GBPS = 819.0  # peak HBM bandwidth


def sfno_forward_gflops(embed, layers, H, W, lmax, mmax, in_ch, out_ch,
                        mlp_ratio=2.0):
    D = embed
    gf = 0.0
    enc = 2 * H * W * in_ch * D
    dec = 2 * H * W * D * out_ch
    per_layer = 0.0
    per_layer += 2 * H * mmax * D * 2 * W          # DFT (re+im lanes)
    per_layer += 2 * lmax * mmax * D * 2 * H       # Legendre analysis
    per_layer += 8 * lmax * mmax * D * D           # dhconv (complex MAC = 4 real MACs)
    per_layer += 2 * lmax * mmax * D * 2 * H       # Legendre synthesis
    per_layer += 2 * H * mmax * D * 2 * W          # inverse DFT
    per_layer += 2 * H * W * D * D                 # inner skip 1x1
    per_layer += 2 * 2 * H * W * D * int(mlp_ratio * D)  # MLP (two matmuls)
    gf = enc + dec + layers * per_layer
    return gf / 1e9, per_layer / 1e9


def sfno_weight_bytes(embed, layers, lmax, bytes_per, mlp_ratio=2.0):
    D = embed
    per_layer = D * D * lmax * 2 * bytes_per       # dhconv (re/im)
    per_layer += 2 * D * int(mlp_ratio * D) * bytes_per  # MLP
    per_layer += D * D * bytes_per                 # inner skip
    return layers * per_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--forwards-per-step", type=int, default=3,
                    help="cold sampling: N iterations per horizon-N segment, "
                         "each = 1 forecaster + 2 interpolator applications "
                         "(double-batched) = 3 network forwards per emitted "
                         "forecast step")
    ap.add_argument("--measured-step-ms", type=float, default=33.0,
                    help="measured device ms per forecast step (window "
                         "time / steps; 790ms/24 at bf16, round 3)")
    args = ap.parse_args()

    H, W = args.height, args.width
    # matches SFNOConfig.modes at hard_thresholding_fraction=1.0:
    # lmax = nlat, mmax = nlon//2 + 1
    lmax, mmax = H, W // 2 + 1
    fwd_gf, layer_gf = sfno_forward_gflops(
        args.embed, args.layers, H, W, lmax, mmax, in_ch=37, out_ch=35)
    step_tf = fwd_gf * args.forwards_per_step / 1e3
    t_mxu_ms = step_tf / V5E_BF16_TFLOPS * 1e3

    wb_f32 = sfno_weight_bytes(args.embed, args.layers, lmax, 4)
    wb_bf16 = sfno_weight_bytes(args.embed, args.layers, lmax, 2)
    # weights cross HBM once per forward (XLA streams them per layer)
    t_w_f32_ms = wb_f32 * args.forwards_per_step / (V5E_HBM_GBPS * 1e9) * 1e3
    t_w_bf16_ms = wb_bf16 * args.forwards_per_step / (V5E_HBM_GBPS * 1e9) * 1e3

    meas = args.measured_step_ms
    print(json.dumps({
        "sfno_forward_gflops": round(fwd_gf, 1),
        "per_layer_gflops": round(layer_gf, 1),
        "per_step_tflops": round(step_tf, 3),
        "mxu_bound_ms_per_step": round(t_mxu_ms, 2),
        "weight_bytes_per_forward_f32_mb": round(wb_f32 / 1e6, 1),
        "weight_read_ms_per_step_f32": round(t_w_f32_ms, 2),
        "weight_read_ms_per_step_bf16": round(t_w_bf16_ms, 2),
        "measured_ms_per_step": meas,
        "achieved_tflops": round(step_tf / (meas / 1e3), 1),
        "mxu_fraction": round(t_mxu_ms / meas, 3),
        "note": "gap to the MXU bound = HBM traffic of activations the "
                "fusions spill + weight reads + scan/dispatch overhead; "
                "measured fusion bandwidths sit at 640-820 GB/s (HBM "
                "roofline), so the program is bandwidth-bound, not "
                "compute-bound",
    }, indent=2))


if __name__ == "__main__":
    main()
