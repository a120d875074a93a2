"""pjit data-parallel trainer.

Replaces the reference's Lightning + DDP training stack (src/train.py,
_base_experiment.py:738-1230, configs/trainer/ddp.yaml): one jitted train step
over a ``jax.sharding.Mesh``; gradients sync automatically through sharding
propagation (no DDP wrapper, no gradient hooks — compare
mappings.py:199-340 in the reference). Supports:

* AdamW with no-weight-decay parameter groups (norm scales/biases, pos_embed;
  reference _base_experiment.py:1105-1230),
* gradient clipping, linear-warmup-cosine LR,
* EMA of parameters (reference LitEma),
* per-epoch validation with area-weighted ensemble metrics,
* checkpoint save/restore (msgpack via flax.serialization), with the
  experiment/datamodule config embedded like the reference Lightning ckpts so
  inference can rebuild everything from the file (stepper_multistep.py:228-295).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..evaluation import metrics as M
from ..parallel.mesh import make_mesh, replicated, shard_batch
from .ema import EmaState, ema_init, ema_update
from .schedules import get_scheduler

__all__ = ["TrainerConfig", "Trainer", "TrainState"]


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    lr: float = 4e-4  # reference fv3gfs.yaml:21
    weight_decay: float = 5e-3  # reference fv3gfs.yaml:22
    epochs: int = 3
    grad_clip: float = 0.5  # reference fv3gfs.yaml gradient_clip_val
    scheduler: str = "warmup_cosine"
    warmup_steps: int = 100
    use_ema: bool = True
    ema_decay: float = 0.9999
    seed: int = 0
    steps_per_epoch: Optional[int] = None  # set from data if None
    log_every: int = 50
    ckpt_dir: Optional[str] = None
    donate_state: bool = False  # enable on real pods; see _make_train_step
    # effective-batch bookkeeping (reference config_utils.py:644-701): global
    # batch = batch_size * accumulate_grad_batches * data-parallel size
    accumulate_grad_batches: int = 1
    num_predictions: Optional[int] = None  # val ensemble size override
    # autoregressive rollout validation every N epochs (reference
    # inference_val_every_n_epochs, fv3gfs_dyffusion.yaml:26)
    rollout_val_every: Optional[int] = None
    rollout_val_steps: Optional[int] = None  # default: datamodule prediction_horizon
    # bound validation memory: run ensemble members in lax.map'd chunks of
    # this many vmapped members (None = all members in one vmap). E.g. 10
    # members x batch 8 at 64x128 OOMs a v5e in one vmap; chunk=2 fits.
    val_ensemble_chunk: Optional[int] = None
    # --- pod-scale hardening -------------------------------------------------
    # reduce gradients across the data axis in this dtype (e.g. "bfloat16"):
    # halves the gradient all-reduce bytes on ICI. Implemented with an
    # explicit shard_map data-parallel step (the jax analog of the reference's
    # compressed DDP gradient hooks, mappings.py:199-340); requires a mesh
    # whose only >1 axis is "data". None = pjit step with f32 reductions.
    grad_reduce_dtype: Optional[str] = None
    # ZeRO-1 style: shard optimizer-state leaves (adam mu/nu) over the "data"
    # axis instead of replicating them — cuts optimizer memory by the DP
    # degree; XLA gathers shards around the (cheap) update op.
    zero_shard_opt_state: bool = False
    # start a fresh optimizer on resume instead of restoring the checkpoint's
    # (reference reset_optimizer, _base_experiment.py:1256-1259)
    reset_optimizer: bool = False
    # store Adam's first moment (mu) in this dtype (e.g. "bfloat16"): cuts a
    # quarter of optimizer-state HBM at paper scale (the second moment stays
    # f32 — its sqrt is precision-sensitive). Composes with ZeRO sharding.
    adam_mu_dtype: Optional[str] = None
    # --- product training path --------------------------------------------
    # which fit loop the CLI runs (reference: its train.py CLI IS the
    # production entry, src/train.py:21-187):
    #   "fit"           dispatch-per-step host loop (works everywhere)
    #   "fit_in_memory" whole-epoch lax.scan over the HBM-resident dataset
    #                   (the TPU-native fast path: 10x+ epoch wall-time
    #                   through the tunnel; dataset must fit in HBM)
    #   "streaming"     fused epochs over fixed-size segments with
    #                   double-buffered background uploads (datasets > HBM);
    #                   set segment_samples
    fit_mode: str = "fit"
    segment_samples: Optional[int] = None
    # PRNG implementation for every training-time draw (diffusion timesteps,
    # dropout masks, val ensemble keys). "rbg" = the TPU's hardware RNG
    # instruction; software threefry mask generation fuses into the per-layer
    # MLP megafusions and throttles them (measured +10.7% on the inference
    # window program — same mechanism in the train forward). Key derivation
    # (split/fold_in) stays threefry-based either way, so per-shard fold_in
    # independence is unchanged. Set "threefry" for cross-backend stream
    # reproducibility.
    rng_impl: str = "rbg"
    # mirror saved checkpoints to this s3://bucket/prefix (native SigV4
    # client, endpoint via S3_ENDPOINT_URL) with content-hash dedup — the
    # reference's logger-side ckpt upload (wandb_callbacks.py:74-140).
    # Best-effort: a dead endpoint never kills training.
    ckpt_mirror: Optional[str] = None
    # val-metric key (e.g. "val/weighted_mean_generate-mse") tracked for
    # best.ckpt: lower is better; on improvement best.ckpt is saved (and
    # mirrored when ckpt_mirror is set), like the reference's
    # ModelCheckpoint(monitor=...) + upload-on-improvement.
    ckpt_monitor: Optional[str] = None
    # WatchModel analog (reference wandb_callbacks.py:22-33 logs gradient
    # histograms per weight): per-TOP-LEVEL-SUBTREE gradient norms
    # (grad_norm/<subtree>) computed inside the jitted step and emitted at
    # log points — the layer-resolution signal (which block's gradients
    # explode/vanish) at scalar cost instead of per-weight histogram fetches.
    watch_model: bool = False
    # Full WatchModel parity leg: per-top-level-subtree gradient-value
    # HISTOGRAMS (64 bins, edges computed on device from the step's
    # min/max), emitted at log points in the wandb wire format
    # ({"_type": "histogram", "values": counts, "bins": edges}) — what
    # wandb.watch(log="all") records per weight (reference
    # wandb_callbacks.py:22-33). Device cost is one histogram reduction per
    # subtree inside the jitted step; host transfer is 129 floats per
    # subtree per log point. Implies the layer-resolution signal of
    # watch_model at histogram fidelity.
    watch_histograms: bool = False
    # upload saved checkpoints into the wandb run's cloud files through the
    # logger (the reference's MyWandbLogger save_to_wandb leg,
    # wandb_callbacks.py:74-140 via wandb.save); needs a fit(logger=...)
    # whose WandbLogger is live. Best-effort + content-hash dedup.
    save_to_wandb: bool = False
    # write a deterministic code.tar.gz of the package source beside the
    # checkpoints once per fit (the reference's log_code leg,
    # wandb_callbacks.py:118-133), uploaded too when save_to_wandb.
    code_snapshot: bool = True


def _grad_norm_table(grads, per_subtree: bool) -> dict:
    """Global gradient norm, plus per-top-level-subtree norms when
    ``per_subtree`` (TrainerConfig.watch_model — the WatchModel analog,
    reference wandb_callbacks.py:22-33). All scalars, computed inside the
    jitted step: layer-resolution gradient health without per-weight
    histogram fetches through the tunnel."""
    out = {"grad_norm": optax.global_norm(grads)}
    if per_subtree and hasattr(grads, "items"):
        for k, v in grads.items():
            out[f"grad_norm/{k}"] = optax.global_norm(v)
    return out


def _grad_histogram_table(grads, bins: int = 64) -> dict:
    """Per-top-level-subtree gradient-value histograms, computed inside the
    jitted step (TrainerConfig.watch_histograms — the full WatchModel
    fidelity, reference wandb_callbacks.py:22-33 / wandb.watch(log="all")).
    jnp.histogram with integer ``bins`` derives the edges from the step's
    data min/max on device — shapes stay static (bins counts + bins+1
    edges), only values are dynamic, so this jits cleanly."""
    out = {}
    if not hasattr(grads, "items"):
        return out
    for k, v in grads.items():
        flat = jnp.concatenate(
            [jnp.ravel(x) for x in jax.tree_util.tree_leaves(v)])
        counts, edges = jnp.histogram(flat, bins=bins)
        out[f"grad_hist/{k}"] = (counts, edges)
    return out


def _histogram_wire(value) -> dict:
    """Convert a (counts, edges) device pair into the wandb file_stream
    histogram payload ({"_type": "histogram", "values": ..., "bins": ...})
    — the exact dict the SDK writes, so the native client's log_history
    (and the JSONL system of record) carry it unchanged."""
    counts, edges = value
    import numpy as _np

    return {"_type": "histogram",
            "values": [int(c) for c in _np.asarray(counts)],
            "bins": [float(b) for b in _np.asarray(edges)]}


def chunked_vmap(fn: Callable, keys: jnp.ndarray, chunk: Optional[int] = None):
    """vmap ``fn`` over the leading axis of ``keys``, serializing in chunks via
    lax.map to bound peak memory (ensemble members are independent; running
    all of them in one vmap multiplies every activation by E)."""
    E = keys.shape[0]
    if not chunk or chunk >= E:
        return jax.vmap(fn)(keys)
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    if pad:
        keys = jnp.concatenate([keys, keys[:pad]], axis=0)
    ks = keys.reshape((n_chunks, chunk) + keys.shape[1:])
    out = jax.lax.map(lambda k: jax.vmap(fn)(k), ks)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[:E], out
    )


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema: Optional[EmaState]
    step: jnp.ndarray


def _strip_constants(tree):
    got = jax.device_get(tree)
    if isinstance(got, dict) and "constants" in got:
        got = {k: v for k, v in got.items() if k != "constants"}
    return got


def _merge_restored(template, state_dict):
    """Load saved leaves into a template, keeping template 'constants'."""
    if isinstance(template, dict) and "constants" in template:
        out = dict(template)
        out["params"] = serialization.from_state_dict(
            template["params"], state_dict.get("params", state_dict)
        )
        return out
    return serialization.from_state_dict(template, state_dict)


def _wd_mask(params) -> Any:
    """Weight decay only on >=2D kernels, excluding pos_embed
    (reference no-wd param groups, _base_experiment.py:1105-1230)."""

    def mask(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if "pos_embed" in name:
            return False
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(mask, params)


class Trainer:
    def __init__(
        self,
        experiment,
        datamodule,
        cfg: TrainerConfig,
        mesh=None,
        run_config: Optional[Dict[str, Any]] = None,
    ):
        self.exp = experiment
        self.dm = datamodule
        self.cfg = cfg
        # the full run config, embedded into every checkpoint so ANY saved
        # file (including mid-training last.ckpt) is rebuildable by
        # interface.load_experiment_checkpoint (reference embeds hparams in
        # every ckpt, _base_experiment.py:1244-1259)
        self.run_config = run_config
        if mesh is None:
            # default data-parallel mesh sized so the global batch divides it
            import math as _math

            n = len(jax.devices())
            bs = int(getattr(getattr(datamodule, "cfg", None), "batch_size", 1) or 1)
            data = max(1, _math.gcd(bs, n))
            mesh = make_mesh(data=data, devices=jax.devices()[:data])
        self.mesh = mesh
        self._area_weights = None

    def _key(self, seed: int) -> jax.Array:
        if self.cfg.rng_impl == "threefry":
            return jax.random.PRNGKey(seed)
        return jax.random.key(seed, impl=self.cfg.rng_impl)

    # ------------------------------------------------------------------ setup
    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        cfg = self.cfg
        dyn = jnp.asarray(sample_batch["dynamics"][:1])
        dyn = self.exp.normalizer.normalize(dyn)
        rng = self._key(cfg.seed)
        params = self._init_params(rng, dyn, sample_batch)
        restore = getattr(self, "restore_payload", None)
        if restore is not None:
            # auto-resume (reference resume-if-exists, config_utils.py:83);
            # constants are stripped from checkpoints and kept from the template
            params = _merge_restored(params, restore["params"])
        steps_per_epoch = self.cfg.steps_per_epoch
        if steps_per_epoch is None:
            try:
                steps_per_epoch = max(
                    1, len(self.dm.dataset("train")) // self.dm.cfg.batch_size
                )
            except Exception:
                steps_per_epoch = 100
        total = cfg.epochs * steps_per_epoch
        schedule = get_scheduler(cfg.scheduler, cfg.lr, total, cfg.warmup_steps)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(schedule, weight_decay=cfg.weight_decay, mask=_wd_mask,
                        mu_dtype=cfg.adam_mu_dtype),
        )
        if cfg.accumulate_grad_batches > 1:
            self.tx = optax.MultiSteps(self.tx, cfg.accumulate_grad_batches)
        opt_state = self.tx.init(params.get("params", params) if isinstance(params, dict) else params)
        if (restore is not None and restore.get("opt_state") is not None
                and not cfg.reset_optimizer):
            # exact mid-training resume: adam moments + schedule counts
            # continue where the checkpoint left off (reference Lightning
            # ckpts restore optimizer_states the same way)
            try:
                opt_state = serialization.from_state_dict(
                    opt_state, restore["opt_state"]
                )
            except (KeyError, ValueError) as e:  # optimizer config changed
                print(f"[resume] optimizer state incompatible, reinitialized ({e})")
        ema = ema_init(params) if cfg.use_ema else None
        if restore is not None and cfg.use_ema and restore.get("ema_params"):
            ema = EmaState(
                params=_merge_restored(params, restore["ema_params"]),
                count=jnp.asarray(restore.get("step", 0), jnp.int32),
            )
        state = TrainState(
            params=params, opt_state=opt_state, ema=ema,
            step=jnp.asarray(restore.get("step", 0) if restore else 0, jnp.int32),
        )
        if self.mesh.size == 1:
            return state
        # replicate over the mesh; optionally ZeRO-shard the optimizer state
        rep = replicated(self.mesh)
        state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
        if cfg.zero_shard_opt_state:
            state = state.replace(
                opt_state=jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self._zero_sharding(x)),
                    state.opt_state,
                )
            )
        return state

    def _zero_sharding(self, leaf):
        """ZeRO-1 placement for an optimizer-state leaf: shard the largest
        divisible axis over 'data' (adam mu/nu mirror the params, so this
        cuts optimizer memory by the DP degree); scalars stay replicated."""
        from jax.sharding import NamedSharding

        from ..parallel.mesh import AXIS_DATA, P as _P

        dp = self.mesh.shape[AXIS_DATA]
        shape = jnp.shape(leaf)
        if dp <= 1 or not shape:
            return replicated(self.mesh)
        for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
            if shape[ax] % dp == 0:
                spec = [None] * len(shape)
                spec[ax] = AXIS_DATA
                return NamedSharding(self.mesh, _P(*spec))
        return replicated(self.mesh)

    def _init_params(self, rng, dyn_norm, batch):
        """Initialize the experiment's trainable model from a sample batch.
        Always jitted: eager init is orders of magnitude slower through the
        TPU tunnel (see .claude/skills/verify/SKILL.md)."""
        exp = self.exp
        cond = batch.get("dynamical_condition")
        cond = jnp.asarray(cond[:1]) if cond is not None else None
        if hasattr(exp, "get_inputs_from_dynamics"):  # interpolation
            inputs = exp.get_inputs_from_dynamics(dyn_norm)
            t = jnp.ones((inputs.shape[0],), jnp.float32)
            c = exp.slice_condition(cond, 1) if cond is not None else None
            return jax.jit(lambda r: exp.model.init(r, inputs, time=t, condition=c))(rng)
        # forecasting: model sees x_t
        from .experiments import _stack_window

        x_t = _stack_window(dyn_norm[:, : exp.cfg.window])
        t = jnp.zeros((x_t.shape[0],), jnp.float32)
        c = cond[:, 0] if cond is not None else None
        if getattr(exp, "diffusion_cfg", None) is not None:
            if exp.diffusion_cfg.forward_conditioning == "data":
                c = x_t if c is None else jnp.concatenate([x_t, c], axis=-1)
            return jax.jit(lambda r: exp.model.init(r, x_t, time=t, condition=c))(rng)
        return jax.jit(lambda r: exp.model.init(r, x_t, condition=c))(rng)

    # ------------------------------------------------------------- train step
    def _make_train_step(self) -> Callable:
        exp = self.exp
        tx = self.tx
        cfg = self.cfg

        has_aux = getattr(exp, "aux_params", None) is not None

        def train_step(state: TrainState, dynamics, dynamical_condition, rng, aux,
                       random_timestep=None):
            dyn = exp.normalizer.normalize(dynamics)
            variables = state.params
            # non-trainable collections (e.g. SHT matrices in "constants") are
            # carried in the state but excluded from differentiation/updates
            consts = {k: v for k, v in variables.items() if k != "params"}
            trainable = variables.get("params", variables)

            def loss_fn(p):
                full = {**consts, "params": p} if consts or "params" in variables else p
                extra = {"aux_params": aux} if has_aux else {}
                if random_timestep is not None:
                    extra["random_timestep"] = random_timestep
                return exp.train_loss(
                    full, dyn, rng, dynamical_condition=dynamical_condition, **extra
                )

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
            updates, opt_state = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            params = (
                {**consts, "params": new_trainable}
                if consts or "params" in variables else new_trainable
            )
            ema = state.ema
            if ema is not None:
                ema = ema_update(ema, params, cfg.ema_decay)
            metrics = dict(metrics, **_grad_norm_table(grads, cfg.watch_model))
            if cfg.watch_histograms:
                metrics = dict(metrics, **_grad_histogram_table(grads))
            return (
                TrainState(params=params, opt_state=opt_state, ema=ema, step=state.step + 1),
                metrics,
            )

        # buffer donation halves peak training HBM (state is by far the
        # largest input); requires that no caller reuses the passed-in state
        # after the step, which fit() guarantees
        donate = (0,) if cfg.donate_state else ()

        if cfg.grad_reduce_dtype is not None and self.mesh.size > 1:
            return self._wrap_shard_map_step(train_step, donate)
        return jax.jit(train_step, donate_argnums=donate)

    def _wrap_shard_map_step(self, train_step: Callable, donate) -> Callable:
        """Explicit shard_map data-parallel step: each device computes
        gradients on its batch shard, the cross-device mean runs in
        ``cfg.grad_reduce_dtype`` (e.g. bf16 — half the ICI bytes of the
        default f32 psum), and the optimizer update is computed redundantly
        on every device from the replicated reduced grads. This is the
        TPU-native analog of the reference's compressed DDP gradient hooks
        (mappings.py:199-340) — same math, collective precision made
        explicit instead of implicit in XLA's psum placement."""
        from jax import shard_map

        from ..parallel.mesh import AXIS_DATA, P as _P

        cfg = self.cfg
        exp = self.exp
        tx = self.tx
        mesh = self.mesh
        if any(mesh.shape[a] > 1 for a in mesh.axis_names if a != AXIS_DATA):
            raise ValueError(
                "grad_reduce_dtype requires a pure data-parallel mesh "
                f"(got {dict(mesh.shape)}); model-parallel axes need the "
                "pjit step's automatic collectives"
            )
        rd = jnp.dtype(cfg.grad_reduce_dtype)
        has_aux = getattr(exp, "aux_params", None) is not None

        def local_step(state: TrainState, dynamics, dynamical_condition, rng, aux,
                       random_timestep=None):
            # the rng enters replicated (in_specs P()); fold in the data-axis
            # index so every shard draws independent diffusion timesteps and
            # dropout masks (matching the pjit step's independent per-sample
            # draws over the global batch)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS_DATA))
            dyn = exp.normalizer.normalize(dynamics)
            variables = state.params
            consts = {k: v for k, v in variables.items() if k != "params"}
            trainable = variables.get("params", variables)

            def loss_fn(p):
                full = {**consts, "params": p} if consts or "params" in variables else p
                extra = {"aux_params": aux} if has_aux else {}
                if random_timestep is not None:
                    extra["random_timestep"] = random_timestep
                return exp.train_loss(
                    full, dyn, rng, dynamical_condition=dynamical_condition, **extra
                )

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
            # the gradient all-reduce, explicitly in the reduced dtype
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g.astype(rd), AXIS_DATA).astype(jnp.float32),
                grads,
            )
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, AXIS_DATA), metrics
            )
            updates, opt_state = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            params = (
                {**consts, "params": new_trainable}
                if consts or "params" in variables else new_trainable
            )
            ema = state.ema
            if ema is not None:
                ema = ema_update(ema, params, cfg.ema_decay)
            metrics = dict(metrics, **_grad_norm_table(grads, cfg.watch_model))
            if cfg.watch_histograms:
                metrics = dict(metrics, **_grad_histogram_table(grads))
            return (
                TrainState(params=params, opt_state=opt_state, ema=ema,
                           step=state.step + 1),
                metrics,
            )

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(_P(), _P(AXIS_DATA), _P(AXIS_DATA), _P(), _P(),
                      _P(AXIS_DATA)),
            out_specs=_P(),
            check_vma=False,
        )

        # keep the 5-argument call signature working (random_timestep optional)
        def step(state, dynamics, dynamical_condition, rng, aux,
                 random_timestep=None):
            return sharded(state, dynamics, dynamical_condition, rng, aux,
                           random_timestep)

        return jax.jit(step, donate_argnums=donate)

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        epochs: Optional[int] = None,
        val_every: int = 1,
        verbose: bool = True,
        logger=None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        # cfg.fit_mode makes the fused paths first-class product paths: the
        # CLI (train.py) always calls fit(), and this dispatch routes it
        if cfg.fit_mode == "fit_in_memory":
            return self.fit_in_memory(
                epochs=epochs, val_every=val_every, verbose=verbose,
                logger=logger, segment_samples=None,
            )
        if cfg.fit_mode == "streaming":
            if not cfg.segment_samples:
                raise ValueError(
                    "trainer.fit_mode='streaming' requires "
                    "trainer.segment_samples (samples per device segment)"
                )
            return self.fit_in_memory(
                epochs=epochs, val_every=val_every, verbose=verbose,
                logger=logger, segment_samples=cfg.segment_samples,
            )
        if cfg.fit_mode != "fit":
            raise ValueError(f"Unknown fit_mode {cfg.fit_mode!r}")
        self._logger = logger  # for ckpt/code upload in _save_and_mirror
        epochs = epochs if epochs is not None else cfg.epochs
        first = next(iter(self.dm.train_batches(seed=cfg.seed)))
        state = self.init_state(first)
        train_step = self._make_train_step()
        # frozen auxiliary params (e.g. DYffusion's interpolator) enter the
        # jitted step as an ARGUMENT, never as an embedded constant
        aux_params = getattr(self.exp, "aux_params", None)
        rng = self._key(cfg.seed + 1)
        history = {"train_loss": [], "val": []}
        step = 0
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            pending_logs = []
            for batch in self.dm.train_batches(seed=cfg.seed + epoch):
                rng, sub = jax.random.split(rng)
                dyn = shard_batch(self.mesh, batch["dynamics"])
                cond = batch.get("dynamical_condition")
                cond = shard_batch(self.mesh, cond) if cond is not None else None
                # sparse-strategy loaders ('interpolation') pass their drawn
                # timestep through so the experiment trains on the frames the
                # loader actually read (never silently re-drawn)
                rt = batch.get("random_timestep")
                rt = shard_batch(self.mesh, np.asarray(rt, np.int32)) if rt is not None else None
                state, metrics = train_step(state, dyn, cond, sub, aux_params, rt)
                # keep the loss as a DEVICE array: a float() here would block
                # async dispatch every step (~0.5-1s of pure tunnel overhead
                # per step measured); host conversion happens only at log
                # points and at epoch end
                losses.append(metrics["loss"])
                if logger is not None and step % cfg.log_every == 0:
                    # defer host conversion too: float() at the log point
                    # would sync the dispatch pipeline mid-epoch (~0.5-1s
                    # tunnel overhead per log point); the device values are
                    # flushed below together with the epoch's loss list,
                    # keyed by their true step numbers
                    gkeys = {k: v for k, v in metrics.items()
                             if k == "grad_norm" or k.startswith("grad_norm/")
                             or k.startswith("grad_hist/")}
                    pending_logs.append((step, metrics["loss"], gkeys))
                step += 1
            losses = [float(x) for x in losses]
            # the losses sync above IS training time (waiting for the device
            # to drain); the log flush below is not — timestamp between them
            # so epoch_time_s/steps_per_sec exclude logger/network latency
            epoch_s = time.time() - t0
            for s_, l_, g_ in pending_logs:
                logger.log(
                    {"train/loss": float(l_),
                     **{f"train/{k}":
                        (_histogram_wire(v) if k.startswith("grad_hist/")
                         else float(v))
                        for k, v in g_.items()}},
                    step=s_,
                )
            mean_loss = float(np.mean(losses)) if losses else float("nan")
            history["train_loss"].append(mean_loss)
            if logger is not None:
                logger.log(
                    {"train/epoch_loss": mean_loss, "train/epoch_time_s": epoch_s,
                     "train/steps_per_sec": (len(losses) / epoch_s) if epoch_s else 0.0,
                     "epoch": epoch},
                    step=step,
                )
            if verbose:
                print(
                    f"epoch {epoch}: train/loss={mean_loss:.5f} "
                    f"({epoch_s:.1f}s, {step} steps)"
                )
            val = None
            if (epoch + 1) % val_every == 0 and hasattr(self, "validate"):
                val = self.validate(state)
                history["val"].append(val)
                if logger is not None and val:
                    logger.log(val, step=step)
                if verbose and val:
                    head = {k: round(float(v), 5) for k, v in list(val.items())[:4]}
                    print(f"epoch {epoch}: {head}")
            if (cfg.rollout_val_every
                    and (epoch + 1) % cfg.rollout_val_every == 0):
                rv = self.rollout_validate(state)
                if rv:
                    history.setdefault("rollout_val", []).append(rv)
                    if logger is not None:
                        logger.log(rv, step=step)
                    if verbose:
                        head = {k: round(float(v), 5) for k, v in list(rv.items())[:3]}
                        print(f"epoch {epoch} rollout: {head}")
            self._save_and_mirror(state, val)
        self.state = state
        return history

    # ------------------------------------------------------- fused device fit
    def fit_in_memory(
        self,
        epochs: Optional[int] = None,
        val_every: int = 1,
        verbose: bool = True,
        logger=None,
        steps_per_epoch: Optional[int] = None,
        segment_samples: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Whole-epoch training as ONE compiled XLA program per epoch.

        The TPU-native fast path: the windowed dataset is uploaded to HBM and
        each epoch is a single ``lax.scan`` over train steps that gathers its
        shuffled minibatches on device — zero host<->device round trips per
        step. Through the axon tunnel this replaces ~0.5-1s of
        dispatch+transfer per step with pure device time (measured 10x+ epoch
        wall-time reduction at skill-proof scale).

        ``segment_samples``: for datasets LARGER than HBM, stream the epoch
        in fixed-size sample segments instead of uploading everything — a
        background thread reads+uploads segment k+1 (``prefetched`` double
        buffering, all dataset reads on one thread) while segment k's scan
        runs on device; one compiled program serves every segment.

        Semantics match :meth:`fit` (same train_step body, EMA, optimizer,
        per-epoch shuffling by seed); only the batch delivery differs: exact
        epoch semantics (each sample once, drop-last) with a fresh
        permutation per epoch.
        """
        cfg = self.cfg
        self._logger = logger  # for ckpt/code upload in _save_and_mirror
        epochs = epochs if epochs is not None else cfg.epochs
        ds = self.dm.dataset("train")
        bs = self.dm.cfg.batch_size
        n = len(ds)
        if self.dm.cfg.max_train_samples is not None:
            n = min(n, self.dm.cfg.max_train_samples)
        first = ds[0]
        keys = list(first)

        def read_rows(rows) -> Dict[str, np.ndarray]:
            out = {k: np.empty((len(rows),) + first[k].shape, first[k].dtype)
                   for k in keys}
            for j, i in enumerate(rows):
                s = ds[int(i)]
                for k in keys:
                    out[k][j] = s[k]
            return out

        spe = steps_per_epoch or cfg.steps_per_epoch or max(1, n // bs)
        spe = min(spe, n // bs)

        # mesh-aware fused epochs: the dataset rows shard over the "data"
        # axis (HBM scales with the DP degree), and every gathered minibatch
        # is constrained to the same sharding so the step runs data-parallel;
        # XLA partitions the row gather (sharded dynamic-slice + collective)
        use_mesh = self.mesh.size > 1
        if use_mesh:
            from jax.sharding import NamedSharding

            from ..parallel.mesh import AXIS_DATA, P as _P

            def _rows_sharding(ndim):
                return NamedSharding(
                    self.mesh, _P(*([AXIS_DATA] + [None] * (ndim - 1)))
                )

            dp = self.mesh.shape[AXIS_DATA]

            def place_rows(v):
                # pad rows to a multiple of the data-axis size (sharded
                # device_put requires divisibility); padded rows are never
                # gathered — batch indices only cover the real sample range
                v = np.asarray(v)
                pad = (-len(v)) % max(dp, 1)
                if pad:
                    v = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                return jax.device_put(jnp.asarray(v), _rows_sharding(v.ndim))

            def constrain_batch(x):
                return (jax.lax.with_sharding_constraint(
                    x, _rows_sharding(x.ndim)) if x is not None else None)
        else:
            place_rows = jnp.asarray
            constrain_batch = lambda x: x  # noqa: E731

        data_dev = None
        if segment_samples is None:
            # materialize once on host, upload once to HBM
            data_dev = {k: place_rows(v)
                        for k, v in read_rows(range(n)).items()}
            first_batch = {k: np.asarray(v[:bs]) for k, v in data_dev.items()}
        else:
            segment_samples = max(bs, (segment_samples // bs) * bs)
            # never exceed the epoch's sample count: a short final chunk with
            # a full-size idx would make jnp.take clamp out-of-range indices
            # and silently train on duplicated samples
            segment_samples = min(segment_samples, spe * bs)
            first_batch = read_rows(range(bs))
        state = self.init_state(first_batch)
        train_step = self._make_train_step_body()
        aux_params = getattr(self.exp, "aux_params", None)
        has_cond = "dynamical_condition" in keys
        has_rt = "random_timestep" in keys

        def epoch_fn(state, data, idx, rng, aux):
            """idx: (spe, bs) int32 shuffled sample indices."""

            def body(carry, step_ix):
                st, key = carry
                key, sub = jax.random.split(key)
                batch_idx = step_ix
                dyn = constrain_batch(jnp.take(data["dynamics"], batch_idx, axis=0))
                cond = (constrain_batch(
                    jnp.take(data["dynamical_condition"], batch_idx, axis=0))
                        if has_cond else None)
                rt = (constrain_batch(
                    jnp.take(data["random_timestep"], batch_idx, axis=0))
                      if has_rt else None)
                st, metrics = train_step(st, dyn, cond, sub, aux, rt)
                return (st, key), metrics["loss"]

            (state, _), losses = jax.lax.scan(body, (state, rng), idx)
            return state, losses

        epoch_jit = jax.jit(epoch_fn, donate_argnums=(0,) if cfg.donate_state else ())
        history = {"train_loss": [], "val": []}
        step = 0
        for epoch in range(epochs):
            t0 = time.time()
            perm = np.random.default_rng(cfg.seed + epoch).permutation(n)[: spe * bs]
            rng = jax.random.fold_in(self._key(cfg.seed + 1), epoch)
            if segment_samples is None:
                idx = jnp.asarray(perm.reshape(spe, bs), jnp.int32)
                state, losses = epoch_jit(state, data_dev, idx, rng, aux_params)
                losses = np.asarray(losses)
            else:
                # stream the epoch in equal-size segments (drop remainder so
                # every segment reuses ONE compiled program); the producer
                # thread reads + device_puts segment k+1 during segment k
                from ..data.datamodule import prefetched

                n_seg = max(1, (spe * bs) // segment_samples)
                chunks = [perm[s * segment_samples:(s + 1) * segment_samples]
                          for s in range(n_seg)]

                def produce():
                    for ch in chunks:
                        yield {k: place_rows(v)
                               for k, v in read_rows(ch).items()}

                seg_steps = segment_samples // bs
                idx = jnp.arange(seg_steps * bs, dtype=jnp.int32).reshape(
                    seg_steps, bs)
                parts = []
                for si, seg_dev in enumerate(prefetched(produce(), depth=1)):
                    state, seg_losses = epoch_jit(
                        state, seg_dev, idx,
                        jax.random.fold_in(rng, si), aux_params,
                    )
                    parts.append(np.asarray(seg_losses))
                losses = np.concatenate(parts)
            step += len(losses)
            epoch_s = time.time() - t0
            mean_loss = float(losses.mean())
            history["train_loss"].append(mean_loss)
            if logger is not None:
                logger.log({"train/epoch_loss": mean_loss,
                            "train/epoch_time_s": epoch_s,
                            "train/steps_per_sec": len(losses) / epoch_s,
                            "epoch": epoch}, step=step)
            if verbose:
                print(f"epoch {epoch}: train/loss={mean_loss:.5f} "
                      f"({epoch_s:.1f}s, {len(losses)} steps fused)")
            val = None
            if (epoch + 1) % val_every == 0 and hasattr(self, "validate"):
                val = self.validate(state)
                history["val"].append(val)
                if logger is not None and val:
                    logger.log(val, step=step)
                if verbose and val:
                    head = {k: round(float(v), 5) for k, v in list(val.items())[:4]}
                    print(f"epoch {epoch}: {head}")
            self._save_and_mirror(state, val)
        self.state = state
        return history

    def _make_train_step_body(self) -> Callable:
        """The un-jitted train-step body (for embedding inside larger
        programs like fit_in_memory's epoch scan)."""
        jitted = self._make_train_step()
        # _make_train_step returns jax.jit(train_step); calling a jitted fn
        # inside another jit is fine (inlined at trace time)
        return jitted

    # ------------------------------------------------------------ validation
    def validate(self, state: TrainState, max_batches: int = 4) -> Dict[str, float]:
        """Light validation: area-weighted RMSE (+ CRPS/SSR when the experiment
        is stochastic) per horizon step, averaged (metric taxonomy of
        _base_experiment.py:966-1030 is produced by the aggregators in
        evaluation/).

        The whole eval — ensemble members (vmapped), all horizon steps, and
        the metric reductions — is ONE jitted program per batch shape; only
        the scalar metric table crosses back to the host (eager per-member
        loops are seconds-per-op through the TPU tunnel, iron rule #4)."""
        exp = self.exp
        if self._area_weights is None:
            self._area_weights = self.dm.grid.horizontal.area_weights()
        w = jnp.asarray(self._area_weights)
        params = state.ema.params if (state.ema is not None) else state.params
        # validation stays ON the mesh: params remain device/mesh-resident
        # (no full-tree host fetch per epoch) and batches shard over the data
        # axis — the eval step is one jitted program either way (reference
        # analog: eval under DDP without leaving the process group,
        # _base_experiment.py:919-1102)
        aux = getattr(exp, "aux_params", None)
        eval_step = self._get_eval_step()
        rng = self._key(self.cfg.seed + 7)
        from ..parallel.mesh import AXIS_DATA

        dp = self.mesh.shape[AXIS_DATA] if self.mesh.size > 1 else 1

        def put(x):
            # partial final batches (drop_last=False) may not divide the data
            # axis; they run replicated (tiny) instead of sharded
            if x is None:
                return None
            if dp > 1 and np.shape(x)[0] % dp == 0:
                return shard_batch(self.mesh, x)
            if self.mesh.size > 1:
                return jax.device_put(jnp.asarray(x), replicated(self.mesh))
            return jnp.asarray(x)

        rmses = []
        n = 0
        for batch in self.dm.val_batches(horizon=exp.cfg.horizon):
            dyn = put(batch["dynamics"])
            cond = put(batch.get("dynamical_condition"))
            table = eval_step(params, aux, dyn, cond, jax.random.fold_in(rng, n), w)
            rmses.append({k: float(v) for k, v in table.items()})
            n += 1
            if n >= max_batches:
                break
        if not rmses:
            return {}
        out: Dict[str, float] = {}
        for key in rmses[0]:
            out[f"val/avg/{key}"] = float(np.mean([r[key] for r in rmses]))
        return out

    @property
    def _val_ensemble(self) -> int:
        if self.cfg.num_predictions is not None:
            return self.cfg.num_predictions
        return getattr(self.exp.cfg, "num_predictions", 1) or 1

    def _ens_metrics(self, preds_e, target, w) -> Dict[str, jax.Array]:
        """preds_e: (E, B, H, W, C) raw; target: (B, H, W, C)."""
        wc = w[..., None]
        out = {
            "rmse": jnp.mean(M.root_mean_squared_error(
                target, jnp.mean(preds_e, 0), wc, dim=(-3, -2, -1)
            ))
        }
        if preds_e.shape[0] > 1:
            out["crps"] = jnp.mean(M.crps_ensemble(target, preds_e, wc, dim=(-3, -2, -1)))
            out["ssr"] = jnp.mean(M.spread_skill_ratio(target, preds_e, wc, dim=(-3, -2, -1)))
        return out

    def _get_eval_step(self) -> Callable:
        if getattr(self, "_eval_step", None) is None:
            self._eval_step = jax.jit(self._build_eval_step())
        return self._eval_step

    def _build_eval_step(self) -> Callable:
        """One traced program covering the full validation of a batch.

        Interpolation: all horizon steps unrolled (static, small), ensemble
        members via vmap over dropout rngs (reference get_ensemble_inputs
        tiles the batch, _base_experiment.py:851-890 — vmap is the TPU-native
        equivalent). Forecasting: the entire cold-sampling loop per member,
        members vmapped. Frozen interpolator params enter as the ``aux``
        ARGUMENT (never closure — remote-compile payload rule)."""
        exp = self.exp
        out_names = list(exp.out_packer.names)
        out_norm = exp.normalizer.subset(out_names)
        out_idx = jnp.asarray(exp._out_idx)
        ens_metrics = self._ens_metrics
        chunk = self.cfg.val_ensemble_chunk

        in_noise = float(getattr(exp.cfg, "prediction_inputs_noise", 0.0) or 0.0)

        def perturb(inputs, key):
            """Per-member input perturbation (reference get_ensemble_inputs
            adds inputs_noise * randn to every member)."""
            if in_noise <= 0.0:
                return inputs
            return inputs + in_noise * jax.random.normal(
                jax.random.fold_in(key, 17), inputs.shape, inputs.dtype
            )

        if hasattr(exp, "get_inputs_from_dynamics"):  # interpolation
            E = (self._val_ensemble
                 if (exp.cfg.enable_inference_dropout or in_noise > 0) else 1)
            use_do = exp.cfg.enable_inference_dropout

            def eval_step(params, aux, dyn, cond, rng, w):
                dyn_n = exp.normalizer.normalize(dyn)
                inputs = exp.get_inputs_from_dynamics(dyn_n)
                B = inputs.shape[0]
                tables = []
                for t_step in exp.horizon_range:
                    target_time = exp.cfg.window + t_step - 1
                    t = jnp.full((B,), float(t_step), jnp.float32)
                    c = (exp.slice_condition(cond, target_time)
                         if cond is not None else None)

                    def member(key):
                        return exp.predict(
                            params, perturb(inputs, key), time=t, condition=c,
                            rng=key, use_inference_dropout=use_do,
                        )

                    keys = jax.random.split(jax.random.fold_in(rng, t_step), E)
                    preds_e = out_norm.denormalize(chunked_vmap(member, keys, chunk))
                    target = dyn[:, target_time][..., out_idx]
                    tables.append(ens_metrics(preds_e, target, w))
                return {k: jnp.mean(jnp.stack([tb[k] for tb in tables]))
                        for k in tables[0]}

            return eval_step

        # forecasting (DYffusion): vmap the full sampling loop over members
        from .experiments import _stack_window

        E = self._val_ensemble

        def eval_step(params, aux, dyn, cond, rng, w):
            dyn_n = exp.normalizer.normalize(dyn)
            init = _stack_window(dyn_n[:, : exp.cfg.window])
            T = dyn.shape[1]
            valid_h = [h for h in range(1, exp.cfg.horizon + 1)
                       if exp.cfg.window + h - 1 < T]

            def member(key):
                out = exp.predict(params, perturb(init, key), key,
                                  dynamical_condition=cond, aux_params=aux)
                return {h: out.preds[h] for h in valid_h if h in out.preds}

            preds = chunked_vmap(member, jax.random.split(rng, E), chunk)  # h -> (E, B, ...)
            tables = []
            for h in preds:
                preds_e = out_norm.denormalize(preds[h])
                target = dyn[:, exp.cfg.window + h - 1][..., out_idx]
                tables.append(ens_metrics(preds_e, target, w))
            return {k: jnp.mean(jnp.stack([tb[k] for tb in tables]))
                    for k in tables[0]}

        return eval_step

    def rollout_validate(self, state: TrainState) -> Dict[str, float]:
        """Autoregressive rollout validation over the val split (the long-
        horizon eval the reference runs every inference_val_every_n_epochs).
        Only applies to forecasting experiments."""
        exp = self.exp
        if getattr(exp, "diffusion_cfg", None) is None:
            return {}
        from ..evaluation.aggregators import InferenceAggregator
        from ..inference import DYffusionStepper, InferenceConfig, run_inference

        params = state.ema.params if state.ema is not None else state.params
        # mesh-resident rollout validation: params stay on the trainer's mesh
        # (replicated), the IC x ensemble rows shard over its data axis
        stepper = DYffusionStepper(exp, params, mesh=self.mesh)
        src = self.dm._source("val")
        n_steps = self.cfg.rollout_val_steps or min(
            self.dm.cfg.prediction_horizon or 8 * exp.cfg.horizon,
            src.n_timesteps - 1,
        )
        icfg = InferenceConfig(
            n_forward_steps=n_steps,
            forward_steps_in_memory=min(n_steps, 8 * exp.cfg.horizon),
            n_ensemble=1,
        )
        agg = InferenceAggregator(
            list(exp.out_packer.names), self.dm.grid.horizontal.area_weights(),
            log_zonal_mean_images=False,
        )
        run_inference(stepper, src, icfg, aggregator=agg, verbose=False)
        return {f"val/{k.split('/', 1)[1]}": v for k, v in agg.get_logs().items()}

    # ------------------------------------------------------------ checkpoint
    def _save_and_mirror(self, state: TrainState, val: Optional[dict]) -> None:
        """Epoch-end checkpoint trailer shared by every fit loop: save
        last.ckpt, track the monitored val metric (lower is better), save
        best.ckpt on improvement, and mirror saved files to S3 when
        ``ckpt_mirror`` is set. The mirror's hash dedup makes the every-epoch
        last.ckpt re-save cheap when weights are unchanged (reference
        analog: logger-side upload of improved ckpts with hash dedup,
        wandb_callbacks.py:74-140)."""
        cfg = self.cfg
        if not cfg.ckpt_dir:
            return
        last = os.path.join(cfg.ckpt_dir, "last.ckpt")
        self.save_checkpoint(state, last)
        best_path = os.path.join(cfg.ckpt_dir, "best.ckpt")
        improved = False
        if cfg.ckpt_monitor and val and cfg.ckpt_monitor in val:
            v = float(val[cfg.ckpt_monitor])
            best = getattr(self, "_best_monitor", None)
            if best is None or v < best:
                self._best_monitor = v
                self.save_checkpoint(state, best_path)
                improved = True
        # code snapshot beside the ckpts, once per fit (reference log_code,
        # wandb_callbacks.py:118-133; deterministic tar so re-fits that
        # change nothing produce identical bytes)
        code_tar = None
        if cfg.code_snapshot:
            code_tar = os.path.join(cfg.ckpt_dir, "code.tar.gz")
            if not getattr(self, "_code_snapshotted", False):
                from ..utils.code_snapshot import snapshot_code

                snapshot_code(code_tar)
                self._code_snapshotted = True
        if cfg.ckpt_mirror:
            mirror = getattr(self, "_ckpt_mirror", None)
            if mirror is None:
                from ..utils.checkpointing import CheckpointMirror

                mirror = self._ckpt_mirror = CheckpointMirror(cfg.ckpt_mirror)
            mirror.mirror(last)
            if improved:
                mirror.mirror(best_path)
            if code_tar:
                mirror.mirror(code_tar)
        # wandb-side file upload (the reference's save_to_wandb leg via
        # wandb.save, wandb_callbacks.py:74-140): best-effort + hash dedup
        # in the logger, so unchanged re-saves cost one sha256
        logger = getattr(self, "_logger", None)
        if cfg.save_to_wandb and logger is not None \
                and hasattr(logger, "save_file"):
            logger.save_file(last, name="last.ckpt")
            if improved:
                logger.save_file(best_path, name="best.ckpt")
            if code_tar:
                logger.save_file(code_tar, name="code.tar.gz")

    def save_checkpoint(self, state: TrainState, path: str, extra_config: dict = None):
        """Single checkpoint format: the config-embedding one (there used to be
        a sidecar-JSON variant, which left mid-training last.ckpt files that
        load_experiment_checkpoint could not rebuild)."""
        from ..interface import save_experiment_checkpoint

        save_experiment_checkpoint(
            path, state, extra_config or self.run_config or {}
        )

    @staticmethod
    def load_checkpoint(path: str) -> dict:
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
