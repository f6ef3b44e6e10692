"""SPMD training loop: jitted train step over a data-parallel mesh.

TPU-native redesign of the reference train path (reference
core/estimator.py:490-619 _train_model_{default,distributed} +
core/models.py:224-281 model_fn + core/solver.py:221-243):

- ONE compiled train step: forward (bf16 activations) → loss (wsce/dice
  composition, ops/losses.py) → grads → optimizer update at lr(step)*lr_scale.
  Under pjit the batch is sharded over the mesh and XLA inserts the gradient
  all-reduce over ICI (replacing MirroredStrategy+NCCL,
  utils/distribution_utils.py:137-206).
- BatchNorm batch statistics are computed over the GLOBAL batch (sync-BN):
  with pjit, the mean over a sharded axis is a global reduction.  The
  reference used per-replica BN (core/solver.py:236-241 UPDATE_OPS); sync-BN
  is the strictly-better TPU equivalent (documented deviation).
- The plateau LR controller runs on host and writes `lr_scale` into the train
  state (no recompile; reference assigns a graph variable,
  core/solver.py:246-254).
- In-graph train metrics (<Class>/<Metric> keys) are returned every step with
  a step-invariant structure, but COMPUTED only at the logging cadence
  (lax.cond), mirroring the reference's actual cost model: TF1 only executes
  the metric subgraph on steps LoggingTensorHook fetches it
  (core/estimator.py:677-689).  --metrics_train_steps 1 restores every-step.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from flax.core import FrozenDict

from boxsegliver_tpu.ops import losses as losses_mod
from boxsegliver_tpu.ops import metrics as metrics_mod
from boxsegliver_tpu.parallel import mesh as mesh_mod
from boxsegliver_tpu.train.checkpoint import CheckpointManager, warm_start
from boxsegliver_tpu.train.hooks import (AverageMeter, BestKeeper,
                                         ReduceLROnPlateau, SpeedLogger)
from boxsegliver_tpu.train.solver import Solver

logger = logging.getLogger("boxsegliver")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    lr_scale: jnp.ndarray

    def replace(self, **kw):  # struct.PyTreeNode already provides replace
        return super().replace(**kw)


def create_train_state(model, solver: Solver, sample_features: Dict,
                       rng) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng}, sample_features,
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = solver.make_transform()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        lr_scale=jnp.ones((), jnp.float32),
    )


def make_loss_fn(args, classes: Sequence[str]):
    """Total loss = data loss (loss_type composition) + L2 regularization
    (reference _build_loss, NetworksV2/UNet.py:120-135 + GUNet.py:394-413)."""
    w_params = {}
    if args.loss_weight_type == "numerical":
        w_params["numeric_w"] = args.loss_numeric_w
    elif args.loss_weight_type == "proportion":
        w_params["proportion_decay"] = args.loss_proportion_decay
    data_loss_fn = losses_mod.make_loss_fn(args.loss_type, args.loss_weight_type,
                                           **w_params)
    use_reg = args.optimizer.lower() != "adamw" and args.weight_decay_rate > 0

    def loss_fn(logits, labels, params):
        data_loss = data_loss_fn(logits, labels)
        reg = (losses_mod.l2_regularization(params, args.weight_decay_rate,
                                            getattr(args, "bias_decay", False))
               if use_reg else 0.0)
        return data_loss + reg, data_loss

    return loss_fn


def make_train_step(model, solver: Solver, args, classes: Sequence[str],
                    preprocess_fn=None):
    """Returns jitted (state, features, labels, rng) -> (state, metrics).

    preprocess_fn(raw_batch, rng) -> (features, labels), when given, fuses the
    device-side augmentation (pipeline.process_train_batch) into the SAME
    compiled step — one dispatch per training step, XLA overlaps the
    host->device transfer of the next raw batch with compute.  In that mode
    call the step as step_fn(state, raw_batch, None, rng).
    """
    tx = solver.make_transform()
    loss_fn = make_loss_fn(args, classes)
    metric_names = list(getattr(args, "metrics_train", ["Dice"]))
    # Train-metric cadence (--metrics_train_steps; 0 = follow log_step).
    # The reference's TF1 estimator only EXECUTES the <Class>/<Metric>
    # subgraph on steps where LoggingTensorHook fetches it (every log_step);
    # computing them every step was a cost the reference never paid.  A
    # lax.cond gates the softmax+metric work to the same cadence; the dict
    # structure stays step-invariant (zeros off-cadence) so host hooks and
    # the bulk drain are unchanged.  Set 1 to compute every step.
    metrics_every = int(getattr(args, "metrics_train_steps", 0) or 0)
    if metrics_every <= 0:
        metrics_every = max(1, int(getattr(args, "log_step", 1)))
    metric_keys = [f"{classes[i]}/{m}" for i in range(1, len(classes))
                   for m in metric_names]

    def train_metrics(logits, labels):
        probs = jax.nn.softmax(logits, axis=-1)
        tm = metrics_mod.build_train_metrics(probs, labels, classes,
                                             metric_names)
        return tuple(jnp.asarray(tm[k], jnp.float32) for k in metric_keys)

    def step_fn(state: TrainState, features: Dict, labels, rng):
        if preprocess_fn is not None:
            rng, prep_rng = jax.random.split(rng)
            features, labels = preprocess_fn(features, prep_rng)
        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, new_vars = model.apply(
                    variables, features, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
            else:
                logits = model.apply(variables, features, train=True,
                                     rngs={"dropout": rng})
                new_vars = {}
            total, data_loss = loss_fn(logits, labels, params)
            return total, (logits, data_loss,
                           new_vars.get("batch_stats", state.batch_stats))

        (total, (logits, data_loss, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)

        lr = solver.lr_fn(state.step, state.lr_scale)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)

        metrics = {"total_loss": total, "data_loss": data_loss,
                   "learning_rate": lr}
        if metric_keys:
            if metrics_every == 1:
                vals = train_metrics(logits, labels)
            else:
                new_step = state.step + 1
                need = jnp.logical_or(new_step % metrics_every == 0,
                                      new_step == 1)
                vals = jax.lax.cond(
                    need, lambda: train_metrics(logits, labels),
                    lambda: tuple(jnp.zeros((), jnp.float32)
                                  for _ in metric_keys))
            metrics.update(dict(zip(metric_keys, vals)))
        return new_state, metrics

    return step_fn


def make_multi_train_step(step_fn):
    """lax.scan over K fused train steps — ONE device dispatch executes K
    steps back-to-back with zero host round trips (the standard TPU
    host-loop pattern; hides the per-dispatch latency a remote/tunneled
    runtime pays).  Takes [K, ...]-stacked raw batches (fused-preprocess
    layout) and returns [K, ...]-stacked per-step metrics, so host hooks
    can replay every step exactly as in the K=1 loop."""

    def multi_fn(state: TrainState, stacked_features: Dict, rng):
        def body(carry, feats):
            state, rng = carry
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, feats, None, step_rng)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng),
                                           stacked_features)
        return state, metrics

    return multi_fn


def make_eval_step(model):
    """Jittable forward returning softmax probs (reference predictions
    contract '<Class>Prob', core/estimator.py:281-332)."""

    def eval_fn(state: TrainState, features: Dict):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, features, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return eval_fn


class Trainer:
    """Owns mesh, state, compiled steps, checkpointing, and host hooks
    (the reference CustomEstimator.train loop, core/estimator.py:234-261 +
    _train_with_estimator_spec:646-758)."""

    def __init__(self, model, args, classes: Sequence[str],
                 sample_features: Dict, num_replicas: int = 0,
                 save_ckpt_steps: int = 5000, preprocess_fn=None):
        """preprocess_fn(raw_batch, key) -> (features, labels): when given,
        the device-side augmentation is FUSED into the compiled train step
        (one dispatch per step) and `train()` expects the dataset to yield raw
        host batch dicts (TrainDataset(raw=True)).  This is the product train
        path; bench.py measures exactly this configuration."""
        self.model = model
        self.args = args
        self.classes = list(classes)
        self.mesh = mesh_mod.make_mesh(num_replicas)
        mesh_mod.per_device_batch_size(args.batch_size, self.mesh.size)
        self.solver = Solver(args)
        self.preprocess_fn = preprocess_fn

        rng = jax.random.PRNGKey(getattr(args, "seed", 1234))
        self.rng, init_rng = jax.random.split(rng)
        with jax.default_device(jax.devices()[0]):
            state = create_train_state(self.model, self.solver,
                                       sample_features, init_rng)
        # replicate state across the mesh
        rep = mesh_mod.replicated_sharding(self.mesh)
        self.state = jax.device_put(state, rep)

        data = mesh_mod.batch_sharding(self.mesh)
        self._data_sharding = data
        self._train_step = jax.jit(
            make_train_step(self.model, self.solver, args, self.classes,
                            preprocess_fn=preprocess_fn),
            in_shardings=(rep, data, None if preprocess_fn else data, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,))
        self._eval_step = jax.jit(
            make_eval_step(self.model),
            in_shardings=(rep, data), out_shardings=data)
        self.steps_per_dispatch = max(
            1, int(getattr(args, "steps_per_dispatch", 1)))
        self._multi_step = None
        if self.steps_per_dispatch > 1:
            if preprocess_fn is None:
                raise ValueError("--steps_per_dispatch > 1 requires the "
                                 "fused-preprocess train path")
            stacked = mesh_mod.stacked_batch_sharding(self.mesh)
            self._stacked_sharding = stacked
            self._multi_step = jax.jit(
                make_multi_train_step(
                    make_train_step(self.model, self.solver, args,
                                    self.classes,
                                    preprocess_fn=preprocess_fn)),
                in_shardings=(rep, stacked, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,))
        self._host_step = 0  # fresh state starts at step 0; restore() syncs

        self.ckpt = CheckpointManager(args.model_dir,
                                      save_interval_steps=save_ckpt_steps)
        self.loss_meter = AverageMeter()
        self.speed = SpeedLogger(log_step=args.log_step)
        from boxsegliver_tpu.utils.summary import SummaryWriter
        self.summary = SummaryWriter(
            Path(args.model_dir) / "summaries",
            prefix=getattr(args, "summary_prefix", "") or "")
        self.plateau: Optional[ReduceLROnPlateau] = None
        if args.learning_policy == "plateau":
            self.plateau = ReduceLROnPlateau(
                args.model_dir,
                lr_patience=args.lr_patience,
                tr_patience=getattr(args, "tr_patience", 0) or args.lr_patience * 2,
                min_delta=args.min_delta,
                decay_rate=args.lr_decay_rate,
                min_lr_scale=args.lr_end / args.learning_rate)
            self.state = self.state.replace(
                lr_scale=jnp.asarray(self.plateau.lr_scale, jnp.float32))
        self.best_keeper: Optional[BestKeeper] = None
        if getattr(args, "save_best", False) and getattr(args, "primary_metric", None):
            if getattr(args, "save_best_ma", False):
                from boxsegliver_tpu.train.hooks import BestKeeperMA
                self.best_keeper = BestKeeperMA(
                    args.model_dir, args.primary_metric,
                    getattr(args, "secondary_metric", None),
                    save_interval=getattr(args, "save_interval", 0),
                    ma_alpha=getattr(args, "ma_alpha", 0.9))
            else:
                self.best_keeper = BestKeeper(
                    args.model_dir, args.primary_metric,
                    getattr(args, "secondary_metric", None),
                    save_interval=getattr(args, "save_interval", 0))

    # -- resume ------------------------------------------------------------
    def restore(self):
        """Resume from the latest periodic checkpoint if present; apply
        warm start otherwise (reference core/estimator.py:249-253 +
        WarmStartSettings:649-652; --load_weights scope-remapped partial
        restore, core/models.py:160-185)."""
        self.state, step = self.ckpt.restore(self.state)
        if step == 0 and getattr(self.args, "warm_start_from", None):
            self.state = warm_start(self.state, self.args.warm_start_from)
            logger.info("Warm started from %s", self.args.warm_start_from)
        elif step == 0 and getattr(self.args, "load_weights", None):
            if self.args.load_weights.endswith(".h5"):
                # DenseNet-161 ImageNet import (reference init_dense_model,
                # core/models.py:188-221)
                from boxsegliver_tpu.utils.h5_import import load_densenet161_h5
                variables = {"params": self.state.params,
                             "batch_stats": self.state.batch_stats}
                variables, n = load_densenet161_h5(
                    variables, self.args.load_weights, log=logger)
                self.state = self.state.replace(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"])
                logger.info("Imported %d tensors from %s", n,
                            self.args.load_weights)
                self._host_step = 0
                return 0
            path = self._resolve_load_weights(self.args.load_weights)
            scope_map = None
            raw = getattr(self.args, "weights_scope", None)
            if raw:  # "old=new[,old2=new2]" top-level module renames
                scope_map = dict(pair.split("=", 1)
                                 for pair in raw.split(",") if "=" in pair)
            self.state = warm_start(self.state, path, scope_map=scope_map)
            logger.info("Initialized weights from %s (scope_map=%s)", path,
                        scope_map)
        self._host_step = int(step)
        return int(step)

    def _resolve_load_weights(self, spec: str) -> str:
        """--load_weights resolution (reference init_model,
        core/models.py:163-172): an explicit checkpoint path, or a sibling
        experiment tag under model_dir's parent — preferring its best line,
        falling back to its latest periodic checkpoint."""
        p = Path(spec)
        if p.exists():
            return str(p)
        sibling = Path(self.args.model_dir).parent / spec
        version = getattr(self.args, "load_weights_version", "checkpoint")
        best = sibling / "ckpt_best" / ("best" if version == "checkpoint"
                                        else version)
        if best.exists():
            return str(best)
        ckpts = sorted((sibling / "ckpt").glob("*"),
                       key=lambda q: int(q.name) if q.name.isdigit() else -1)
        if ckpts:
            return str(ckpts[-1])
        raise FileNotFoundError(f"--load_weights {spec!r}: no checkpoint at "
                                f"{p} or {sibling}")

    @property
    def global_step(self) -> int:
        """Host-tracked completed-step count.  Mirrors state.step without a
        per-step device fetch (the tunnel round trip dominates small fetches)."""
        return self._host_step

    # -- train -------------------------------------------------------------
    def train_step(self, features: Dict, labels) -> Dict[str, float]:
        """Dispatch one compiled step.  Returns DEVICE metric arrays (fetch
        them in bulk; each host fetch costs a full tunnel round trip)."""
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, features, labels,
                                               step_rng)
        self._host_step += 1
        return metrics

    def train_multi_step(self, raw_batches: Sequence[Dict]):
        """Stack K raw host batches and dispatch the fused K-step scan
        (ONE device round trip executes K train steps).  Returns DEVICE
        metrics stacked [K, ...] along axis 0."""
        stacked = {k: np.stack([b[k] for b in raw_batches])
                   for k in raw_batches[0]}
        feats = jax.device_put(stacked, self._stacked_sharding)
        self.rng, step_rng = jax.random.split(self.rng)
        self.state, metrics = self._multi_step(self.state, feats, step_rng)
        self._host_step += len(raw_batches)
        return metrics

    def train(self, dataset, max_steps: int, eval_fn=None,
              batches_per_epoch: Optional[int] = None):
        """Main loop.  Steps are dispatched back-to-back; metric DEVICE arrays
        accumulate in a window and are fetched with ONE bulk transfer every
        `fetch_every` steps, so the device pipeline never drains on a host
        round trip (replaces the reference's per-step sess.run fetch,
        core/estimator.py:738-758).  Host hooks (loss mean, plateau LR, NaN
        abort, speed log) replay the window in order — their effect lags
        execution by at most fetch_every steps, which is harmless for
        controllers with thousand-step patience (and the NaN abort still
        aborts, like the reference's NanTensorHook, just a window late).

        eval_fn(trainer) -> metrics dict, called every batches_per_epoch steps
        (the reference's eval-per-epoch EvaluatorHook, core/hooks.py:79-191).
        """
        start = self.global_step
        if start >= max_steps:
            logger.info("Skipping training since max_steps has already saved.")
            return
        bpe = batches_per_epoch or self.args.batches_per_epoch
        fetch_every = max(1, min(int(self.args.log_step),
                                 int(getattr(self.args, "metrics_fetch_steps",
                                             0) or 16)))
        step = start
        pending = []  # [(last_step, device_metrics, k)] awaiting one fetch
        stack_buf = []  # raw batches awaiting a K-step dispatch
        for batch in iter(dataset):
            if self._multi_step is not None:
                K = self.steps_per_dispatch
                remaining = max_steps - self.global_step
                stack_buf.append(batch)
                if len(stack_buf) < min(K, remaining):
                    continue
                if len(stack_buf) == K:
                    metrics = self.train_multi_step(stack_buf)
                    k_done = K
                else:  # < K steps left: single-step remainder (exact stop)
                    for b in stack_buf[:-1]:
                        feats = jax.device_put(b, self._data_sharding)
                        m = self.train_step(feats, None)
                        pending.append((self.global_step, m, 1))
                    feats = jax.device_put(stack_buf[-1], self._data_sharding)
                    metrics = self.train_step(feats, None)
                    k_done = 1
                stack_buf = []
                pending.append((self.global_step, metrics, k_done))
            else:
                if isinstance(batch, tuple):
                    features, labels = batch
                else:  # raw host dict → fused-preprocess path
                    features = jax.device_put(batch, self._data_sharding)
                    labels = None
                metrics = self.train_step(features, labels)
                pending.append((self.global_step, metrics, 1))
            prev, step = step, self.global_step

            # epoch boundary crossed within this dispatch window?
            at_epoch = eval_fn is not None and step // bpe > prev // bpe
            done = step >= max_steps
            if len(pending) >= fetch_every or at_epoch or done:
                self._drain(pending)
                pending = []
                if at_epoch:
                    self._run_eval(eval_fn, step)
            if done or (self.plateau and self.plateau.should_stop()):
                break
        self._drain(pending)
        self.ckpt.save(self.global_step, self.state)

    def _drain(self, pending):
        """One bulk device_get of the window's metrics, then replay the host
        hooks per step in order (K-step dispatch entries are unstacked)."""
        if not pending:
            return
        host_metrics = jax.device_get([m for _, m, _ in pending])
        first = pending[0][0] - pending[0][2] + 1
        for (last_step, _, k), metrics in zip(pending, host_metrics):
            if k == 1:
                self._after_step(last_step, metrics)
            else:
                for i in range(k):
                    self._after_step(last_step - k + 1 + i,
                                     {kk: vv[i] for kk, vv in metrics.items()})
        last = pending[-1][0]
        # periodic checkpoint if the window crossed a save boundary
        if last // self.ckpt.save_interval_steps > (first - 1) // self.ckpt.save_interval_steps:
            self.ckpt.save(last, self.state)

    def _after_step(self, step: int, metrics):
        loss = float(metrics["total_loss"])
        if not np.isfinite(loss):
            raise FloatingPointError(
                f"NaN/Inf loss at step {step}")  # reference NanTensorHook
        self.loss_meter.update(loss)
        lr = float(metrics["learning_rate"])
        if self.plateau is not None:
            new_scale = self.plateau.step(step, self.loss_meter.avg, lr)
            if new_scale is not None:
                self.state = self.state.replace(
                    lr_scale=jnp.asarray(new_scale, jnp.float32))
                logger.info("*** Decay learning rate, scale = %.3g", new_scale)
        log_vals = {"loss": loss, "loss_mean": self.loss_meter.avg,
                    "learning_rate": lr}
        for k, v in metrics.items():
            if "/" in k:
                log_vals[k] = float(v)
        self.speed.maybe_log(step, log_vals)
        if step % self.args.log_step == 0 or step == 1:
            self.summary.scalars(log_vals, step)
        if step % self.args.log_step == 0:
            self.loss_meter.reset()  # periodic reset (estimator.py:657-675)

    def _run_eval(self, eval_fn, step: int):
        results = eval_fn(self)
        if results:
            self.summary.scalars({f"eval/{k}": v for k, v in results.items()},
                                 step)
        if results and self.best_keeper is not None:
            self.best_keeper.update(
                step, results,
                save_cb=lambda tag: self.ckpt.save_best(self.state, tag))

    # -- predict -----------------------------------------------------------
    def predict(self, features: Dict):
        """Softmax probabilities for one device-ready feature batch."""
        return self._eval_step(self.state, features)
