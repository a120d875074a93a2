"""ACE-family skill check for the fast-config spectral knobs (round-5 #5).

The DYffusion-family truncation/factorization studies (results/skill_fast08,
skill_thresh0.9) do NOT automatically transfer to the ACE single-step
stepper: its autoregressive rollout feeds every prediction error straight
back into the next input (reference hot loop
src/ace_inference/core/stepper.py:529-560), so spectral truncation could
compound where DYffusion's interpolator re-anchoring damps it. This script
runs the held-out comparison on the skill-proof system:

* trains an ACE-style SINGLE-STEP model (SimultaneousForecastingExperiment,
  horizon_at_once = 1 — predict x_{t+1} from x_t, the ACE training
  objective) at each spectral config on identical data/seeds,
* rolls each trained model out autoregressively for --rollout-steps and
  scores per-lead area-weighted RMSE vs truth and vs climatology, plus
  boundedness.

Decision rule (mirrors skill_fast08): a config is ACE-skill-neutral when
its per-lead RMSE is within ~1% of dense at the leads before chaos
saturates, and its long rollout stays bounded.

Usage:
  python scripts/ace_skill.py [--system chaotic] [--configs dense,t09,t08]
  python scripts/ace_skill.py --preset mini --platform cpu    (CI size)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    # name -> (factorization, rank, thresh)
    "dense": ("", 1.0, 1.0),
    "t09": ("cp", 0.25, 0.9),   # committed ACE fast config (ec93b72)
    "t08": ("cp", 0.25, 0.8),   # candidate: the DYffusion-family best
}


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--preset", choices=["full", "mini"], default="full")
    ap.add_argument("--system", choices=["ou", "chaotic"], default="chaotic")
    ap.add_argument("--out", default="results/skill_ace_fast")
    ap.add_argument("--configs", default="dense,t09,t08")
    ap.add_argument("--rollout-steps", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--ics", type=int, default=8,
                    help="initial conditions scored per config")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from spherical_dyffusion_tpu.data.datamodule import StochasticDataModule
    from spherical_dyffusion_tpu.evaluation import metrics as M
    from spherical_dyffusion_tpu.models import SFNO, SFNOConfig
    from spherical_dyffusion_tpu.training import (
        ExperimentConfig,
        SimultaneousForecastingExperiment,
        Trainer,
        TrainerConfig,
    )

    if args.preset == "full":
        P = dict(height=64, width=128, channels=2, embed=64, layers=4,
                 batch=16, steps_per_epoch=150, epochs=24, n_timesteps=8192,
                 n_val_timesteps=512, lr=1e-3)
    else:
        P = dict(height=16, width=32, channels=2, embed=16, layers=2,
                 batch=8, steps_per_epoch=40, epochs=4, n_timesteps=512,
                 n_val_timesteps=128, lr=3e-3)
    if args.epochs is not None:
        P["epochs"] = args.epochs
    C = P["channels"]

    dm = StochasticDataModule(
        system=args.system, channels=C, height=P["height"], width=P["width"],
        horizon=1, n_timesteps=P["n_timesteps"],
        n_val_timesteps=P["n_val_timesteps"], batch_size=P["batch"],
    )
    w = jnp.asarray(dm.grid.horizontal.area_weights())
    norm = dm.normalizer
    os.makedirs(args.out, exist_ok=True)

    # held-out truth: args.ics rollout windows from the val source, strided so
    # ICs are decorrelated; climatology from the train mean
    src = dm._val_src
    R = min(args.rollout_steps, src.n_timesteps - 1)
    stride = max(1, (src.n_timesteps - R - 1) // max(args.ics - 1, 1))
    names = dm.cfg.in_names
    truths = []
    for i in range(args.ics):
        win = src.read_window(i * stride, R + 1, names)
        truths.append(np.stack([win[n] for n in names], axis=-1))
    truth = jnp.asarray(np.stack(truths), jnp.float32)  # (I, R+1, H, W, C)
    train_sample = dm._train_src.read_window(
        0, min(512, P["n_timesteps"]), names)
    clim = jnp.asarray(np.stack(
        [train_sample[n].mean(0) for n in names], axis=-1))

    leads = sorted({1, 2, 4, 8, 16, R} & set(range(1, R + 1)))
    report = {"preset": args.preset, "system": args.system, "params": P,
              "rollout_steps": R, "ics": args.ics, "seed": args.seed,
              "configs": {}}
    t_all = time.time()

    for name in args.configs.split(","):
        fact, rank, thresh = CONFIGS[name]
        print(f"== config {name}: factorization={fact or 'dense'} "
              f"rank={rank} thresh={thresh} ==", flush=True)
        model = SFNO(SFNOConfig(
            img_shape=(P["height"], P["width"]), in_chans=C, out_chans=C,
            embed_dim=P["embed"], num_layers=P["layers"],
            compute_dtype="bfloat16", sht_matmul_dtype="bfloat16",
            hard_thresholding_fraction=thresh,
            factorization=fact, rank=rank,
        ))
        exp = SimultaneousForecastingExperiment(
            model, ExperimentConfig(horizon=1, window=1, loss_function="l2"),
            dm.in_packer, dm.out_packer, norm, horizon_at_once=1,
        )
        tr = Trainer(exp, dm, TrainerConfig(
            lr=P["lr"], epochs=P["epochs"], use_ema=True, warmup_steps=50,
            steps_per_epoch=P["steps_per_epoch"], seed=args.seed,
        ))
        t0 = time.time()
        hist = tr.fit_in_memory(verbose=False, val_every=10**9)
        train_s = time.time() - t0
        params = (tr.state.ema.params if tr.state.ema is not None
                  else tr.state.params)

        # autoregressive rollout, whole trajectory as ONE jitted scan
        @jax.jit
        def rollout(p, x0_raw):
            xn = norm.normalize(x0_raw)

            def step(x, _):
                y = model.apply(p, x)
                return y, y

            _, ys = jax.lax.scan(step, xn, None, length=R)
            return norm.denormalize(ys)  # (R, I, H, W, C) raw

        preds = jnp.moveaxis(rollout(params, truth[:, 0]), 0, 1)  # (I,R,...)

        @jax.jit
        def score(preds, truth_tail):
            wc = w[..., None]
            rmse = M.root_mean_squared_error(
                truth_tail, preds, wc, dim=(-3, -2, -1))    # (I, R)
            rmse_clim = M.root_mean_squared_error(
                truth_tail, jnp.broadcast_to(clim, truth_tail.shape), wc,
                dim=(-3, -2, -1))
            mx = jnp.max(jnp.abs(norm.normalize(preds)))
            return rmse.mean(0), rmse_clim.mean(0), mx

        rmse_t, rmse_c, mx = score(preds, truth[:, 1:])
        rmse_t, rmse_c = np.asarray(rmse_t), np.asarray(rmse_c)
        entry = {
            "train_s": round(train_s, 1),
            "final_train_loss": float(hist["train_loss"][-1]),
            "rmse_per_lead": {f"lead{k}": float(rmse_t[k - 1]) for k in leads},
            "rmse_climatology_per_lead": {
                f"lead{k}": float(rmse_c[k - 1]) for k in leads},
            "max_abs_normalized": float(mx),
            "bounded": bool(np.isfinite(rmse_t).all()
                            and float(mx) < 4.0 * float(jnp.max(
                                jnp.abs(norm.normalize(truth))))),
        }
        report["configs"][name] = entry
        print(json.dumps(entry, indent=1), flush=True)

    report["wall_s"] = round(time.time() - t_all, 1)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report written to {args.out}", flush=True)
    return report


if __name__ == "__main__":
    main()
