"""Training stack tests: LR policies, plateau controller, best keeper,
mesh sharding contract, and a real multi-device train loop on the fake
8-device CPU mesh (SURVEY.md §4 multi-device strategy)."""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.parallel import (batch_sharding, make_mesh,
                                      per_device_batch_size, shard_batch)
from boxsegliver_tpu.train.hooks import (AverageMeter, BestKeeper,
                                         ReduceLROnPlateau, default_compare)
from boxsegliver_tpu.train.solver import Solver, make_lr_fn
from boxsegliver_tpu.train.trainer import Trainer
from boxsegliver_tpu.models import build_model


def _args(**kw):
    ns = argparse.Namespace(
        learning_rate=1e-3, learning_policy="period_step", num_of_steps=0,
        num_of_total_steps=1000, lr_decay_boundaries=None, lr_custom_values=None,
        lr_decay_step=100, lr_decay_rate=0.1, lr_power=0.9, lr_end=1e-6,
        optimizer="Adam", lr_warm_up=False, slow_start_step=0, slow_start_lr=1e-4,
        lr_patience=30, tr_patience=0, min_delta=5e-4,
        weight_decay_rate=1e-5, bias_decay=False, loss_type="xentropy",
        loss_weight_type="none", loss_numeric_w=None, loss_proportion_decay=1000,
        metrics_train=["Dice"], metrics_eval=["Dice"],
        batch_size=8, batches_per_epoch=10, log_step=5, model_dir="",
        save_best=False, save_interval=0, primary_metric=None,
        secondary_metric=None, seed=0, warm_start_from=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


# ---------------------------------------------------------------------------
# LR policies (reference core/solver.py:138-200 semantics)
# ---------------------------------------------------------------------------

def test_lr_period_step():
    fn = make_lr_fn(_args())
    assert np.isclose(fn(0), 1e-3)
    assert np.isclose(fn(99), 1e-3)
    assert np.isclose(fn(100), 1e-4)
    assert np.isclose(fn(250), 1e-5)


def test_lr_custom_step():
    fn = make_lr_fn(_args(learning_policy="custom_step",
                          lr_decay_boundaries=[10, 20],
                          lr_custom_values=[1.0, 0.5, 0.25]))
    assert np.isclose(fn(5), 1.0)
    assert np.isclose(fn(10), 0.5)
    assert np.isclose(fn(25), 0.25)


def test_lr_poly():
    fn = make_lr_fn(_args(learning_policy="poly", learning_rate=1e-2,
                          num_of_total_steps=100, lr_power=1.0, lr_end=1e-4))
    assert np.isclose(fn(0), 1e-2)
    assert np.isclose(fn(50), (1e-2 - 1e-4) * 0.5 + 1e-4)
    assert np.isclose(fn(100), 1e-4)


def test_bf16_moment_adam_tracks_f32_adam():
    """--opt_moment_dtype bfloat16 stores both Adam moments in bf16 but must
    track the float32 optimizer closely (update math stays f32; only the
    at-rest moments are rounded).  Optimizes a small quadratic for 60 steps
    and compares trajectories."""
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randn(64), jnp.float32)

    def loss(p):
        return jnp.sum((p - target) ** 2) + 0.1 * jnp.sum(jnp.abs(p))

    def run(moment_dtype):
        tx = Solver(_args(opt_moment_dtype=moment_dtype)).make_transform()
        p = jnp.zeros(64, jnp.float32)
        st = tx.init(p)
        for _ in range(60):
            g = jax.grad(loss)(p)
            upd, st = tx.update(g, st, p)
            p = p + 1e-2 * upd
        return p, st

    p32, _ = run("float32")
    p16, st16 = run("bfloat16")
    inner = st16[0]  # ScaleByAdamState inside the chain
    assert all(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves((inner.mu, inner.nu)))
    # trajectories agree to well under a percent of the parameter scale
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                               rtol=0, atol=5e-3)
    # bias correction matches optax exactly on step 1: update == sign-ish
    tx = Solver(_args(opt_moment_dtype="bfloat16")).make_transform()
    st = tx.init(jnp.zeros(4))
    upd, _ = tx.update(jnp.asarray([1.0, -2.0, 0.5, 0.0]), st, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(upd), [-1.0, 1.0, -1.0, 0.0],
                               atol=1e-4)


def test_bf16_moment_adamw_has_decay_and_lowp_state():
    tx = Solver(_args(optimizer="AdamW",
                      opt_moment_dtype="bfloat16")).make_transform()
    p = jnp.ones(8, jnp.float32)
    st = tx.init(p)
    upd, _ = tx.update(jnp.zeros(8), st, p)
    # zero grad -> update is pure (negated) weight decay
    assert np.all(np.asarray(upd) < 0)


def test_lr_plateau_and_slow_start():
    fn = make_lr_fn(_args(learning_policy="plateau", lr_warm_up=True,
                          slow_start_step=10, slow_start_lr=1e-5))
    assert np.isclose(fn(5, 1.0), 1e-5)       # slow start
    assert np.isclose(fn(20, 1.0), 1e-3)
    assert np.isclose(fn(20, 0.1), 1e-4)      # scaled by controller
    assert np.isclose(fn(20, 1e-9), 1e-6)     # floored at lr_end


# ---------------------------------------------------------------------------
# Plateau controller (reference core/hooks.py:581-723)
# ---------------------------------------------------------------------------

def test_plateau_decays_and_persists(tmp_path):
    c = ReduceLROnPlateau(tmp_path, lr_patience=2, tr_patience=100,
                          every_n_steps=1, decay_rate=0.5, moving_average=0.0)
    # improving losses: no decay
    assert c.step(10, 1.0, 1e-3) is None
    assert c.step(11, 0.5, 1e-3) is None
    # plateau: after lr_patience+1 non-improving checks, decay fires
    assert c.step(12, 0.5, 1e-3) is None
    assert c.step(13, 0.5, 1e-3) is None
    assert c.step(14, 0.5, 1e-3) == 0.5
    # persisted sidecar has the reference keys
    d = json.loads((tmp_path / "lr_schedule").read_text())
    for key in ("best", "total_loss_MA", "tr_wait", "lr_wait", "lr_patience",
                "tr_patience", "cooldown_counter", "mode"):
        assert key in d
    # resume restores state
    c2 = ReduceLROnPlateau(tmp_path, lr_patience=2, tr_patience=100,
                           every_n_steps=1, decay_rate=0.5)
    assert c2.lr_scale == 0.5
    assert c2.best == c.best


def test_plateau_early_stop(tmp_path):
    c = ReduceLROnPlateau(tmp_path, lr_patience=100, tr_patience=1,
                          every_n_steps=1, moving_average=0.0)
    c.step(10, 1.0, 1e-9)
    c.step(11, 1.0, 1e-9)
    c.step(12, 1.0, 1e-9)
    c.step(13, 1.0, 1e-9)
    assert c.should_stop()


# ---------------------------------------------------------------------------
# Best keeper (reference core/hooks.py:193-228 + evaluator _compare)
# ---------------------------------------------------------------------------

def test_default_compare_lexicographic():
    assert default_compare({"Tumor/Dice": 0.7}, {}, "Tumor/Dice")
    assert default_compare({"Tumor/Dice": 0.7}, {"Tumor/Dice": 0.6}, "Tumor/Dice")
    assert not default_compare({"Tumor/Dice": 0.5}, {"Tumor/Dice": 0.6}, "Tumor/Dice")
    # tie on primary → secondary decides
    assert default_compare({"Tumor/Dice": 0.6, "Liver/Dice": 0.9},
                           {"Tumor/Dice": 0.6, "Liver/Dice": 0.8},
                           "Tumor/Dice", "Liver/Dice")


def test_best_keeper_sidecars(tmp_path):
    calls = []
    bk = BestKeeper(tmp_path, "Tumor/Dice", save_interval=100)
    assert bk.update(50, {"Tumor/Dice": 0.5}, save_cb=calls.append)
    assert not bk.update(150, {"Tumor/Dice": 0.4}, save_cb=calls.append)
    assert bk.update(250, {"Tumor/Dice": 0.6}, save_cb=calls.append)
    best = json.loads((tmp_path / "best_result").read_text())
    assert best["Tumor/Dice"] == 0.6 and best["global_step"] == 250
    assert "best" in calls
    # interval bests got their own files
    assert (tmp_path / "best_result_0").exists()
    assert (tmp_path / "best_result_1").exists()
    assert (tmp_path / "best_result_2").exists()
    # reload picks up best
    bk2 = BestKeeper(tmp_path, "Tumor/Dice")
    assert bk2.best["Tumor/Dice"] == 0.6


# ---------------------------------------------------------------------------
# Mesh / sharding
# ---------------------------------------------------------------------------

def test_mesh_and_batch_contract():
    mesh = make_mesh()
    assert mesh.size == 8  # conftest fake mesh
    assert per_device_batch_size(16, 8) == 2
    with pytest.raises(ValueError, match="batch_size=16"):
        per_device_batch_size(17, 8)
    batch = {"images": np.zeros((16, 8, 8, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["images"].sharding == batch_sharding(mesh)


# ---------------------------------------------------------------------------
# End-to-end: multi-device training on the fake mesh.
#
# NOTE on scale: this box has ONE physical core; 8 emulated devices make every
# collective an 8-thread rendezvous on that core and the XLA:CPU SPMD compile
# of a real UNet takes minutes.  So the trainer e2e tests use a micro ConvNet
# on a 2-device mesh (the trainer is model-agnostic); the REAL models' full
# sharded train step is exercised by __graft_entry__.dryrun_multichip.
# ---------------------------------------------------------------------------

class _MicroNet:
    """Tiny 2-conv segmentation net for trainer plumbing tests."""

    def __new__(cls, num_classes=3):
        from flax import linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, inputs, train=False):
                x = inputs["images"] if isinstance(inputs, dict) else inputs
                x = nn.Conv(4, (3, 3), padding="SAME")(x)
                x = nn.BatchNorm(use_running_average=not train)(x)
                x = nn.relu(x)
                return nn.Conv(num_classes, (1, 1))(x).astype(jnp.float32)

        return Net()


def test_trainer_loss_decreases_multidevice(tmp_path):
    args = _args(model_dir=str(tmp_path / "model"), batch_size=8,
                 learning_rate=1e-2, loss_type="xentropy+dice")
    model = _MicroNet(num_classes=3)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (8, 16, 16)).astype(np.int32)
    feats = {"images": images}

    tr = Trainer(model, args, classes=["Background", "Liver", "Tumor"],
                 sample_features=feats, num_replicas=2, save_ckpt_steps=10)
    assert tr.mesh.size == 2
    m0 = tr.train_step(feats, labels)
    first = float(m0["total_loss"])
    for _ in range(14):
        m = tr.train_step(feats, labels)
    assert float(m["total_loss"]) < first
    assert "Liver/Dice" in m and "Tumor/Dice" in m
    # batch_stats got updated by training
    assert float(jnp.abs(
        jax.tree_util.tree_leaves(tr.state.batch_stats)[0]).sum()) != 0.0

    # checkpoint save/restore roundtrip preserves step
    tr.ckpt.save(tr.global_step, tr.state)
    step_before = tr.global_step
    tr.state = tr.state.replace(step=jnp.zeros((), jnp.int32))
    restored = tr.restore()
    assert restored == step_before
    assert tr.global_step == step_before
    tr.ckpt.close()


def test_trainer_train_loop_with_eval_and_best(tmp_path):
    args = _args(model_dir=str(tmp_path / "model"), batch_size=8,
                 batches_per_epoch=5, log_step=100, save_best=True,
                 primary_metric="Liver/Dice", learning_policy="plateau",
                 lr_patience=1000)
    model = _MicroNet(num_classes=3)
    rng = np.random.default_rng(1)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = (images[..., 0] > 0).astype(np.int32)
    feats = {"images": images}

    def dataset():
        while True:
            yield feats, labels

    evals = []

    def eval_fn(trainer):
        evals.append(trainer.global_step)
        return {"Liver/Dice": 0.5 + 0.01 * len(evals)}

    tr = Trainer(model, args, classes=["Background", "Liver", "Tumor"],
                 sample_features=feats, num_replicas=2, save_ckpt_steps=1000)
    tr.train(dataset(), max_steps=12, eval_fn=eval_fn)
    assert evals == [5, 10]
    assert tr.global_step == 12
    best = json.loads((tmp_path / "model" / "best_result").read_text())
    assert best["Liver/Dice"] == pytest.approx(0.52)
    assert tr.ckpt.has_best("best")
    tr.ckpt.close()


def test_best_keeper_moving_average(tmp_path):
    from boxsegliver_tpu.train.hooks import BestKeeperMA
    bk = BestKeeperMA(tmp_path, "Tumor/Dice", ma_alpha=0.5)
    saves = []
    assert bk.update(10, {"Tumor/Dice": 0.8}, save_cb=saves.append)  # MA=0.8
    # a one-off spike barely moves the MA
    bk.update(20, {"Tumor/Dice": 0.9}, save_cb=saves.append)         # MA=0.85
    assert bk.ma_results["Tumor/Dice"] == pytest.approx(0.85)
    # a crash doesn't destroy the best record
    assert not bk.update(30, {"Tumor/Dice": 0.1}, save_cb=saves.append)
    assert bk.best["Tumor/Dice"] == pytest.approx(0.85)
    # sidecar + resume
    bk2 = BestKeeperMA(tmp_path, "Tumor/Dice", ma_alpha=0.5)
    assert bk2.ma_results["Tumor/Dice"] == pytest.approx(bk.ma_results["Tumor/Dice"])
    assert bk2.best["Tumor/Dice"] == pytest.approx(0.85)


def test_load_weights_from_sibling_experiment(tmp_path):
    """--load_weights <tag> initializes from a sibling experiment's best (or
    latest periodic) checkpoint (reference init_model, core/models.py:160-185)."""
    src_args = _args(model_dir=str(tmp_path / "exp_a"), batch_size=8)
    model = _MicroNet(num_classes=3)
    feats = {"images": np.zeros((8, 16, 16, 3), np.float32)}
    src = Trainer(model, src_args, classes=["Background", "L", "T"],
                  sample_features=feats, num_replicas=2, save_ckpt_steps=5)
    labels = np.zeros((8, 16, 16), np.int32)
    for _ in range(3):
        src.train_step(feats, labels)
    src.ckpt.save_best(src.state, "best")
    src_params = jax.device_get(src.state.params)
    src.ckpt.close()

    dst_args = _args(model_dir=str(tmp_path / "exp_b"), batch_size=8,
                     load_weights="exp_a", load_weights_version="checkpoint",
                     weights_scope=None)
    dst = Trainer(model, dst_args, classes=["Background", "L", "T"],
                  sample_features=feats, num_replicas=2, save_ckpt_steps=5)
    assert dst.restore() == 0
    dst_params = jax.device_get(dst.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(src_params),
                    jax.tree_util.tree_leaves(dst_params)):
        np.testing.assert_allclose(a, b, atol=1e-6)
    dst.ckpt.close()


def test_trainer_multi_step_dispatch(tmp_path):
    """--steps_per_dispatch K: the K-step lax.scan dispatch trains to the
    exact step count (single-step remainder), crosses epoch-eval boundaries
    once per crossing, replays per-step metrics to host hooks, and learns."""
    args = _args(model_dir=str(tmp_path / "model"), batch_size=8,
                 batches_per_epoch=5, log_step=100, steps_per_dispatch=4,
                 metrics_fetch_steps=8)
    model = _MicroNet(num_classes=3)
    rng = np.random.default_rng(2)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = (images[..., 0] > 0).astype(np.int32)
    raw = {"images": images, "labels": labels}

    def preprocess(batch, key):
        return {"images": batch["images"]}, batch["labels"]

    def dataset():
        while True:
            yield raw

    evals = []

    def eval_fn(trainer):
        evals.append(trainer.global_step)
        return {"Liver/Dice": 0.5}

    tr = Trainer(model, args, classes=["Background", "Liver", "Tumor"],
                 sample_features={"images": images}, num_replicas=2,
                 save_ckpt_steps=1000, preprocess_fn=preprocess)
    assert tr._multi_step is not None
    first = None
    tr.train(dataset(), max_steps=10, eval_fn=eval_fn)
    # dispatches end at steps 4, 8, then 2 single-step remainders -> 10;
    # epoch boundaries (bpe=5) are crossed inside the windows ending at 8
    # (crosses 5) and 10 (crosses 10)
    assert tr.global_step == 10
    assert evals == [8, 10]
    # host hooks replayed every step (loss meter saw all 10)
    assert tr.loss_meter.count == 10
    first = tr.loss_meter.avg
    tr.train(dataset(), max_steps=10, eval_fn=eval_fn)  # resume-skip
    assert tr.global_step == 10
    tr.ckpt.close()


def test_trainer_multi_step_requires_fused_path(tmp_path):
    args = _args(model_dir=str(tmp_path / "m2"), steps_per_dispatch=2)
    model = _MicroNet(num_classes=3)
    images = np.zeros((8, 16, 16, 3), np.float32)
    with pytest.raises(ValueError, match="fused-preprocess"):
        Trainer(model, args, classes=["Background", "Liver", "Tumor"],
                sample_features={"images": images}, num_replicas=2)


def test_metrics_train_steps_cadence(tmp_path):
    """Round-5: in-graph train metrics are lax.cond-gated to the logging
    cadence (the reference TF1 cost model — the metric subgraph only runs on
    fetched steps).  Off-cadence steps return structural zeros; on-cadence
    (and step 1) return the same values as the every-step mode, and the
    cadence has NO effect on the training trajectory."""
    rng = np.random.default_rng(3)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (8, 16, 16)).astype(np.int32)
    feats = {"images": images}
    classes = ["Background", "Liver", "Tumor"]

    def run(metrics_every, n_steps=4):
        args = _args(model_dir=str(tmp_path / f"m{metrics_every}"),
                     batch_size=8, log_step=2,
                     metrics_train_steps=metrics_every)
        tr = Trainer(_MicroNet(3), args, classes=classes,
                     sample_features=feats, num_replicas=2)
        out = [tr.train_step(feats, labels) for _ in range(n_steps)]
        return [{k: float(v) for k, v in m.items()} for m in out], tr

    every, _ = run(1)
    gated, tr = run(0)  # 0 -> follow log_step (=2)
    for step0, (me, mg) in enumerate(zip(every, gated)):
        step = step0 + 1
        assert set(me) == set(mg)
        np.testing.assert_allclose(mg["total_loss"], me["total_loss"],
                                   rtol=1e-5)
        for k in ("Liver/Dice", "Tumor/Dice"):
            if step == 1 or step % 2 == 0:  # on-cadence: real values
                np.testing.assert_allclose(mg[k], me[k], rtol=1e-5)
            else:  # off-cadence: structural zeros
                assert mg[k] == 0.0
    assert any(m["Liver/Dice"] != 0.0 for m in every)
