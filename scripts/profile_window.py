"""Profile one inference window on the real TPU and print the top device ops.

Captures a jax.profiler trace around a single compiled window program (the
bench configuration), parses the trace-event JSON, aggregates device op
durations by (fusion) name, and prints the top-N — the tool used to find the
DFT hot spot in round 1 and the layout copies in round 2.

Usage: python scripts/profile_window.py [--top 25] [--window 24]
       [--embed 256] [--layers 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_trace(trace_dir: str, top: int = 25):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU"/"Chip"/"device"; fall back to
    # any complete event with args.run_id or long durations on non-python pids
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n.lower() for k in ("tpu", "chip", "device", "xla"))}
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("$") or not name:
            continue
        agg[name][0] += e.get("dur", 0) / 1e3  # us -> ms
        agg[name][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    total = sum(v[0] for v in agg.values())
    print(f"trace: {path}")
    print(f"total device op time: {total:.1f} ms across {len(agg)} op names")
    print(f"{'ms':>10} {'count':>6}  name")
    for name, (ms, cnt) in rows:
        print(f"{ms:10.2f} {cnt:6d}  {name[:110]}")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--window", type=int, default=24)
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--trace-only", default=None,
                    help="skip running; parse this existing trace dir")
    args = ap.parse_args()

    if args.trace_only:
        parse_trace(args.trace_only, args.top)
        return

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    import jax.numpy as jnp
    import numpy as np

    from bench import build
    from spherical_dyffusion_tpu.data import SyntheticTimeSeries

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")  # match bench default
    stepper, in_names, forcing_names = build(
        args.embed, args.layers, dtype,
        params_dtype=os.environ.get("BENCH_PARAM_DTYPE", "") or None,
        preds_dtype=os.environ.get("BENCH_PREDS_DTYPE", "") or None,
        thresh=float(os.environ.get("BENCH_THRESH", "1.0")),
        factorization=os.environ.get("BENCH_FACT", ""),
        rank=float(os.environ.get("BENCH_RANK", "1.0")),
        rank_pipeline=os.environ.get("BENCH_RANKPIPE", "1") == "1",
    )
    W = args.window
    src = SyntheticTimeSeries(in_names + forcing_names + ["ocean_fraction"],
                              n_timesteps=W + 1, spatial_shape=(180, 360))
    forcing = jnp.asarray(np.stack(
        [src.read_window(0, W + 1, forcing_names)[n] for n in forcing_names],
        -1)[None], jnp.float32)
    sst = jnp.asarray(src.read_window(
        0, W + 1, ["surface_temperature"])["surface_temperature"])[None]
    mask = jnp.asarray(src.read_window(
        0, 1, ["ocean_fraction"])["ocean_fraction"][0])[None]
    x = jnp.zeros((1, 180, 360, 35), jnp.float32)
    from bench import mkkey
    # warmup/compile outside the trace
    x, _ = stepper.run_window(x, forcing, sst, mask, mkkey(0), W)
    jax.block_until_ready(x)
    trace_dir = "/tmp/window_trace"
    with jax.profiler.trace(trace_dir):
        x, _ = stepper.run_window(x, forcing, sst, mask, mkkey(1), W)
        jax.block_until_ready(x)
    parse_trace(trace_dir, args.top)


if __name__ == "__main__":
    main()
