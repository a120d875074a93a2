"""Guards the driver-facing entry points: bench.py must import and construct,
__graft_entry__.entry() must build a jittable callable."""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_bench_builds_tiny_stepper(monkeypatch):
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    stepper, in_names, forcing_names = bench.build(embed=8, layers=1)
    assert len(in_names) == 35 and len(forcing_names) == 2
    x = jnp.zeros((1, 180, 360, 35))
    f = jnp.zeros((1, 7, 180, 360, 2))
    sst = jnp.zeros((1, 7, 180, 360))
    mask = jnp.zeros((1, 180, 360))
    xf, preds = stepper.run_window(x, f, sst, mask, jax.random.PRNGKey(0), 6)
    assert preds.shape == (1, 6, 180, 360, 35)
    assert np.isfinite(np.asarray(preds)).all()


def test_bench_builds_with_dtype_narrowing():
    """The BENCH_PARAM_DTYPE / BENCH_PREDS_DTYPE plumbing: bf16 weight
    storage + bf16-emitted preds through the bench builder."""
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    stepper, _, _ = bench.build(embed=8, layers=1, dtype="bfloat16",
                                params_dtype="bfloat16",
                                preds_dtype="bfloat16")
    x = jnp.zeros((1, 180, 360, 35))
    f = jnp.zeros((1, 7, 180, 360, 2))
    sst = jnp.zeros((1, 7, 180, 360))
    mask = jnp.zeros((1, 180, 360))
    xf, preds = stepper.run_window(x, f, sst, mask, jax.random.PRNGKey(0), 6)
    assert preds.dtype == jnp.bfloat16
    assert xf.dtype == x.dtype
    assert np.isfinite(np.asarray(preds, dtype=np.float32)).all()


def test_ace_bench_mode_runs(capsys):
    """BENCH_ACE mode: the ACE single-step stepper bench builds, scans the
    corrector+ocean physics in-program, and reports finite metrics."""
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    bench.ace_bench(embed=8, layers=1, window=2, total_steps=2,
                    dtype="float32")
    out = capsys.readouterr().out
    import json

    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["metric"] == "ace_simulated_years_per_day"
    assert rec["value"] > 0
    assert "finite=True" in rec["unit"]


def test_graft_entry_builds():
    sys.path.insert(0, "/root/repo")
    g = importlib.import_module("__graft_entry__")
    fn, args = g.entry()
    assert callable(fn) and len(args) == 4
