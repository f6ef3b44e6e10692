"""Main CLI: train / eval / infer for the UNet + G-Net families.

Mirrors the reference entry points (entry/main.py:45-208, entry/main_g.py:
45-228): a positional task selects the dataset pairing, then the composed
flag surface drives model, solver, pipeline, and evaluator construction.

    python -m boxsegliver_tpu.cli.main liver --mode train --tag 001_unet \
        --model UNet --classes Liver Tumor --test_fold 2 ...

Tasks: liver | nf | nf_inter | synthetic (synthetic auto-generates a hermetic
dataset; the reference's liver/nf split maps to dataset directory conventions
here — all pipelines run from the npy cache + meta.json produced by
`python -m boxsegliver_tpu.cli.prepare`).  nf_inter is the interactive
click-simulation training task (reference entry/main_g.py nf_inter +
DataLoader/NF/input_pipeline_g_simply.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

from boxsegliver_tpu import config as config_mod
from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache
from boxsegliver_tpu.utils.logger import setup_logger

ensure_compile_cache()  # before any (lazy) jax import

TASKS = ("liver", "only_liver", "tumor", "nf", "nf2", "nf_inter", "nf_3d",
         "synthetic")


def get_args(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    task = "synthetic"
    if argv and not argv[0].startswith("-"):
        task = argv.pop(0)
    if task not in TASKS:
        raise SystemExit(f"Unknown task {task!r}; choose from {TASKS}")
    parser = config_mod.build_parser()
    args = parser.parse_args(argv)
    config_mod.check_args(args, parser)
    config_mod.fill_default_args(args)
    args.task = task
    if task == "nf_3d":  # reference entry/main.py nf_3d: the 3D NF pipeline
        args.task = "nf"
        if args.model != "UNet3D":
            parser.error("task nf_3d requires --model UNet3D")
    if args.dataset == "synthetic" and task != "synthetic":
        args.dataset = {"liver": "LiTS", "only_liver": "LiTS", "tumor": "LiTS",
                        "nf": "NF", "nf2": "NF", "nf_inter": "NF",
                        "nf_3d": "NF"}[task]
    return args


def resolve_dataset_dir(args) -> Path:
    if args.task == "synthetic" or args.dataset == "synthetic":
        nf_like = args.task.startswith("nf")
        root = Path(args.data_root) / ("synthetic_nf" if nf_like else "synthetic")
        if not (root / "meta.json").exists():
            from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
            make_synthetic_dataset(root, n_cases=4, shape=(24, 256, 256),
                                   k_split=args.k_folds,
                                   modality="nf" if nf_like else "liver")
        return root
    return Path(args.data_root) / args.dataset


def is_3d(args) -> bool:
    return args.model == "UNet3D"


def is_inter(args) -> bool:
    return getattr(args, "task", "") == "nf_inter"


def is_iin(args) -> bool:
    """nf2: click-instance training + per-lesion patch eval (reference
    entry/main_g.py:64-66 nf2 → DataLoader/NF/input_pipeline_iin.py)."""
    return getattr(args, "task", "") == "nf2"


def build_feature_template(args):
    """Sample features matching the pipeline outputs, for model init."""
    import numpy as np
    if is_3d(args):
        depth = args.im_depth if args.im_depth > 0 else 8
        ch = 2 if getattr(args, "use_cascade", False) else 1
        feats = {"images": np.zeros(
            (args.batch_size, depth, args.im_height, args.im_width, ch),
            np.float32)}
        if getattr(args, "use_spatial", False):
            gc = int(getattr(args, "guide_channel", 2))
            feats["sp_guide"] = np.zeros(
                (args.batch_size, depth, args.im_height, args.im_width, gc),
                np.float32)
        return feats
    feats = {"images": np.zeros(
        (args.batch_size, args.im_height, args.im_width, args.im_channel),
        np.float32)}
    if is_inter(args) or args.model in ("UNetInter", "InterUNet"):
        # these models consume a click guide unconditionally
        # (reference NetworksV2/UNetInter.py:87-90, InterUNet.py:117-161)
        gc = int(getattr(args, "guide_channel", 2))
        feats["sp_guide"] = np.zeros(
            (args.batch_size, args.im_height, args.im_width, gc), np.float32)
    elif getattr(args, "use_spatial", False):
        feats["sp_guide"] = np.full(
            (args.batch_size, args.im_height, args.im_width, 1), 0.5, np.float32)
    if getattr(args, "use_context", False):
        if is_iin(args):
            # nf2 image-patch pyramid context (sampler_iin.extract_ct_pyramid)
            from boxsegliver_tpu.data.sampler_iin import CT_PATCH, ct_sizes
            n_scales = len(ct_sizes(getattr(args, "ct_base", [32])))
            feats["context"] = np.zeros(
                (args.batch_size, CT_PATCH, CT_PATCH, n_scales), np.float32)
        else:
            raw = args.context_list or ["hist", "200"]
            length = sum(int(raw[i + 1]) for i in range(0, len(raw), 2))
            feats["context"] = np.zeros((args.batch_size, length), np.float32)
    return feats


def build_frozen_2d_predict(args):
    """Frozen click-guided 2D model predict fn from --ckpt_2d (reference
    entry/infer_2d.py:32-80 InferenceWithGuide2D)."""
    import jax.numpy as jnp
    import numpy as np
    from flax.core import FrozenDict

    from boxsegliver_tpu.models import build_model, load_model_config
    from boxsegliver_tpu.train.checkpoint import warm_start
    from boxsegliver_tpu.train.trainer import TrainState, make_eval_step
    import jax

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(args.model_2d, args=args,
                        model_kwargs=load_model_config(args.model_2d),
                        num_classes=len(args.classes) + 1, dtype=dtype)
    feats = {"images": np.zeros((1, args.im_height, args.im_width,
                                 args.im_channel), np.float32),
             "sp_guide": np.zeros((1, args.im_height, args.im_width, 2),
                                  np.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    state = warm_start(state, args.ckpt_2d)
    eval_step = jax.jit(make_eval_step(model))
    return lambda f: eval_step(state, f)


def build_cascade2d(args):
    """CascadeClick2D for the training-time frozen-2D cascade channel."""
    from boxsegliver_tpu.interactive.cascade import CascadeClick2D
    return CascadeClick2D(build_frozen_2d_predict(args),
                          im_height=args.im_height, im_width=args.im_width,
                          im_channel=args.im_channel)


def build_eval_cascade(args):
    """Whole-volume Cascade2D for eval paths, or None when --use_cascade /
    --ckpt_2d are absent (the frozen 2D model runs click-less with blank
    guides)."""
    if not (getattr(args, "use_cascade", False)
            and getattr(args, "ckpt_2d", None)):
        return None
    import numpy as np

    from boxsegliver_tpu.interactive.cascade import Cascade2D
    p2d = build_frozen_2d_predict(args)

    def p2d_blank(feats):
        if "sp_guide" not in feats:
            shape = feats["images"].shape[:-1] + (2,)
            feats = dict(feats, sp_guide=np.zeros(shape, np.float32))
        return p2d(feats)

    return Cascade2D(p2d_blank, batch_size=args.batch_size,
                     im_channel=args.im_channel,
                     channel_mode="binary" if args.cascade_binary else "edt",
                     tau=25.0)


def build_trainer(args, dataset_dir, fuse_preprocess=False, cache=None):
    """fuse_preprocess=True compiles the device-side augmentation INTO the
    train step (one dispatch per step) — the product train path; the dataset
    then yields raw host batches (TrainDataset(raw=True)).  cache: optional
    DeviceVolumeCache for the HBM-resident pixel path."""
    import jax.numpy as jnp

    from boxsegliver_tpu.models import build_model, get_model_params
    from boxsegliver_tpu.train.trainer import Trainer

    params = get_model_params(args)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = build_model(params["model"], args=args,
                        model_kwargs=params["model_kwargs"], dtype=dtype)
    classes = ["Background"] + list(args.classes)
    feats = build_feature_template(args)
    preprocess_fn = None
    if fuse_preprocess:
        if is_3d(args):
            from boxsegliver_tpu.data.pipeline3d import make_preprocess_fn_3d
            preprocess_fn = make_preprocess_fn_3d(args)
        elif is_inter(args):
            from boxsegliver_tpu.data.pipeline_inter import \
                make_inter_preprocess_fn
            preprocess_fn = make_inter_preprocess_fn(args, train=True)
        elif is_iin(args):
            from boxsegliver_tpu.data.pipeline_iin import \
                make_iin_preprocess_fn
            preprocess_fn = make_iin_preprocess_fn(args, train=True)
        else:
            from boxsegliver_tpu.data.pipeline import make_preprocess_fn
            preprocess_fn = make_preprocess_fn(args, cache=cache)
    return Trainer(model, args, classes, feats,
                   num_replicas=getattr(args, "num_replicas", 0),
                   save_ckpt_steps=int(getattr(args, "save_ckpt_steps", 5000)),
                   preprocess_fn=preprocess_fn)


def main(argv=None):
    args = get_args(argv)
    logger = setup_logger(args.model_dir, args.mode, args.tag, args.out_file)
    logger.info("Task %s, mode %s, model_dir %s", args.task, args.mode,
                args.model_dir)
    dataset_dir = resolve_dataset_dir(args)

    if args.mode == "train":
        return train(args, dataset_dir, logger)
    elif args.mode in ("eval", "infer"):
        return evaluate(args, dataset_dir, logger, do_eval=args.mode == "eval")
    elif args.mode == "export":
        from boxsegliver_tpu.cli.export import export_model
        return export_model(args, dataset_dir)
    else:
        raise SystemExit(f"Unsupported mode {args.mode}")


def train(args, dataset_dir, logger):
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data.kfold import (LITS_SEED, read_or_create_k_folds,
                                            train_test_split)
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler import TrainSampler
    from boxsegliver_tpu.evaluators.volume import (EvaluateVolume,
                                                   make_inline_eval_fn)

    cache = None
    if getattr(args, "device_cache", False) and not is_3d(args) \
            and not is_inter(args):
        from boxsegliver_tpu.data.device_cache import DeviceVolumeCache
        from boxsegliver_tpu.parallel import make_mesh
        metas = load_meta(dataset_dir)
        folds = read_or_create_k_folds(
            Path(dataset_dir) / "k_folds.txt", [m["PID"] for m in metas],
            k_split=args.k_folds, seed=LITS_SEED)
        train_pids, _ = train_test_split(folds, args.test_fold)
        try:
            cache = DeviceVolumeCache(dataset_dir,
                                      [int(p) for p in train_pids],
                                      mesh=make_mesh(args.num_replicas),
                                      budget_gb=args.device_cache_gb)
        except MemoryError as e:
            logger.warning("--device_cache disabled (%s); falling back to "
                           "the streaming host sampler", e)

    trainer = build_trainer(args, dataset_dir, fuse_preprocess=True,
                            cache=cache)
    start = trainer.restore()
    logger.info("Starting at global step %d (mesh size %d)", start,
                trainer.mesh.size)

    # augmentation is fused into the compiled train step (build_trainer), so
    # the dataset yields raw host batches
    if is_3d(args):
        from boxsegliver_tpu.data.sampler3d import Sampler3D
        cascade2d = None
        if getattr(args, "use_cascade", False) and getattr(args, "use_2d",
                                                           False):
            if not getattr(args, "ckpt_2d", None):
                raise SystemExit("--use_cascade --use_2d needs --ckpt_2d")
            cascade2d = build_cascade2d(args)
        sampler = Sampler3D(dataset_dir, args, mode="train", seed=args.seed,
                            cascade2d=cascade2d)
    elif is_inter(args):
        from boxsegliver_tpu.data.sampler_inter import InterSampler
        sampler = InterSampler(dataset_dir, args, mode="train", seed=args.seed,
                               max_clicks=args.max_clicks)
    elif is_iin(args):
        from boxsegliver_tpu.data.sampler_iin import IinSampler
        sampler = IinSampler(dataset_dir, args, mode="train", seed=args.seed)
    else:
        sampler = TrainSampler(dataset_dir, args, mode="train", seed=args.seed,
                               zbase=cache.zbase if cache else None)
    dataset = TrainDataset(sampler, args, seed=args.seed, raw=True)

    eval_fn = None
    if args.eval_per_epoch:
        metas = load_meta(dataset_dir)
        folds = read_or_create_k_folds(
            Path(dataset_dir) / "k_folds.txt", [m["PID"] for m in metas],
            k_split=args.k_folds, seed=LITS_SEED)
        _, test_pids = train_test_split(folds, args.test_fold)
        test_pids = set(int(p) for p in test_pids)
        eval_metas = [m for m in metas if int(m["PID"]) in test_pids]
        if is_3d(args):
            from boxsegliver_tpu.evaluators.volume3d import EvaluateVolume3D
            ev3 = EvaluateVolume3D(args, dataset_dir,
                                   ["Background"] + list(args.classes))
            metas_cap = (eval_metas if args.eval_num <= 0
                         else eval_metas[:args.eval_num])

            def eval_fn(trainer):
                return ev3.run(
                    lambda f: trainer.predict(_with_blank_guide(args, f)),
                    metas_cap)
        elif args.eval_3d:
            # full per-case volume reassembly (reference --eval_3d)
            evaluator = EvaluateVolume(args, dataset_dir,
                                       ["Background"] + list(args.classes))
            eval_fn = make_inline_eval_fn(evaluator, eval_metas,
                                          max_cases=args.eval_num)
        else:
            # reference default: cheap 2D batch-metric averaging over fixed
            # eval batches (evaluator_liver.py:164-332, 2D branch)
            eval_fn = _make_online_eval(args, dataset_dir)

    max_steps = args.num_of_steps or args.num_of_total_steps
    try:
        trainer.train(dataset, max_steps=max_steps, eval_fn=eval_fn)
    finally:
        dataset.close()
        trainer.ckpt.close()
    logger.info("Training finished at step %d", trainer.global_step)


def _make_online_eval(args, dataset_dir, num_batches: int = 0):
    """OnlineEval2D over the eval split with deterministic eval-mode device
    processing (reference get_val_loader semantics for nf_inter; 2D
    batch-metric averaging for the plain pipelines)."""
    from boxsegliver_tpu.evaluators.online2d import OnlineEval2D

    classes = ["Background"] + list(args.classes)
    if is_inter(args):
        from boxsegliver_tpu.data.pipeline_inter import make_inter_preprocess_fn
        from boxsegliver_tpu.data.sampler_inter import InterSampler
        sampler = InterSampler(dataset_dir, args, mode="eval",
                               max_clicks=args.max_clicks)
        process_fn = make_inter_preprocess_fn(args, train=False)
    elif is_iin(args):
        # reference get_dataset_for_eval_online: the train generator with
        # tumor_percent=0 and spatial_random=1 (input_pipeline_iin.py:658-672)
        from boxsegliver_tpu.data.pipeline_iin import make_iin_preprocess_fn
        from boxsegliver_tpu.data.sampler_iin import IinSampler
        sampler = IinSampler(dataset_dir, args, mode="eval",
                             tumor_percent=0.0, spatial_random=1.0)
        process_fn = make_iin_preprocess_fn(args, train=False)
    else:
        import functools

        from boxsegliver_tpu.data.pipeline import _process_batch, norm_statics
        from boxsegliver_tpu.data.sampler import TrainSampler
        sampler = TrainSampler(dataset_dir, args, mode="eval")
        statics = norm_statics(args)
        statics["use_gamma"] = False  # deterministic eval processing
        process_fn = functools.partial(
            _process_batch, im_h=args.im_height, im_w=args.im_width,
            noise_scale=0.0, random_flip=0,
            use_spatial=bool(getattr(args, "use_spatial", False)),
            min_std=float(getattr(args, "min_std", 2.0)), **statics)
    return OnlineEval2D(sampler, args, process_fn, classes,
                        num_batches=num_batches,
                        use_global_dice=bool(getattr(args, "use_global_dice",
                                                     False)))


def _with_blank_guide(args, feats):
    """UNet3D eval without interactions: zero click guides
    (reference threed_script eval defaults)."""
    import numpy as np
    if getattr(args, "use_spatial", False) and "sp_guide" not in feats:
        shape = feats["images"].shape[:-1] + (int(args.guide_channel),)
        feats = dict(feats, sp_guide=np.zeros(shape, np.float32))
    return feats


def evaluate(args, dataset_dir, logger, do_eval=True):
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data.kfold import (LITS_SEED, read_or_create_k_folds,
                                            train_test_split)
    from boxsegliver_tpu.evaluators.volume import EvaluateVolume

    trainer = build_trainer(args, dataset_dir)
    # checkpoint selection (reference evaluator_liver.py:155-162 +
    # --eval_final / --ckpt_path / best default)
    if getattr(args, "ckpt_path", None):
        from boxsegliver_tpu.train.checkpoint import warm_start
        trainer.state = warm_start(trainer.state, args.ckpt_path)
        logger.info("Restored explicit checkpoint %s", args.ckpt_path)
    elif getattr(args, "eval_final", False) or not trainer.ckpt.has_best():
        step = trainer.restore()
        logger.info("Restored final checkpoint at step %d", step)
    else:
        restored = trainer.ckpt.restore_best(trainer.state)
        if restored is not None:
            trainer.state = restored
            logger.info("Restored best checkpoint")

    if is_inter(args):
        # batch-averaged metrics over the fixed validation batches (reference
        # get_val_loader, NF/input_pipeline_g_simply.py:668-686); use
        # cli.interactive_eval for the full click-refinement loop
        import json

        eval_fn = _make_online_eval(args, dataset_dir)
        results = eval_fn(trainer)
        out = Path(args.model_dir) / "eval_results_2d.txt"
        with out.open("a") as f:
            json.dump({"results": results}, f)
            f.write("\n")
        logger.info("Online eval: %s", results)
        trainer.ckpt.close()
        return results

    metas = load_meta(dataset_dir)
    folds = read_or_create_k_folds(
        Path(dataset_dir) / "k_folds.txt", [m["PID"] for m in metas],
        k_split=args.k_folds, seed=LITS_SEED)
    _, test_pids = train_test_split(folds, args.test_fold)
    test_pids = set(int(p) for p in test_pids)
    eval_metas = [m for m in metas if int(m["PID"]) in test_pids]

    if is_3d(args):
        from boxsegliver_tpu.evaluators.volume3d import (EvaluateVolume3D,
                                                         make_volume_predict)
        from boxsegliver_tpu.parallel import make_mesh
        ev3 = EvaluateVolume3D(args, dataset_dir,
                               ["Background"] + list(args.classes))
        cascade = build_eval_cascade(args)
        z_shards = getattr(args, "z_shards", 0)
        gc = (int(args.guide_channel)
              if getattr(args, "use_spatial", False) else 0)
        whole = args.im_depth <= 0
        # fast path (PERF.md round 3): device argmax + in-graph z-score +
        # on-device blank guides — the tunnel fetch/upload dominated the 3D
        # number otherwise.  Cascade channels need the host-normalized volume.
        no_cascade = cascade is None and not getattr(args, "use_cascade",
                                                     False)
        fast = whole and no_cascade
        kw = dict(ret="pred" if fast else "prob",
                  in_zscore=fast, blank_guide_channels=gc)
        if z_shards and z_shards > 1 and whole:
            predict = make_volume_predict(trainer.model, trainer.state,
                                          make_mesh(z_shards), z_shards, **kw)
        elif fast:
            predict = make_volume_predict(trainer.model, trainer.state, **kw)
        elif not whole:
            # device-resident sliding window: in-graph tile scan replaces the
            # per-tile tunnel round trips (PERF.md 3D eval table)
            from boxsegliver_tpu.evaluators.volume3d import make_sliding_predict
            predict = make_sliding_predict(
                trainer.model, trainer.state,
                (args.im_depth, args.im_height, args.im_width),
                num_classes=len(args.classes) + 1,
                ret="pred", in_zscore=no_cascade, blank_guide_channels=gc)
        else:
            predict = lambda f: trainer.predict(_with_blank_guide(args, f))
        results = ev3.run(predict, eval_metas, do_eval=do_eval,
                          cascade=cascade)
        trainer.ckpt.close()
        return results

    evaluator = EvaluateVolume(args, dataset_dir,
                               ["Background"] + list(args.classes))
    if is_iin(args):
        from boxsegliver_tpu.evaluators.iin_eval import (
            make_patch_predict_tta, run_patch_infer)
        if not do_eval and getattr(args, "case_id", None) is not None:
            # single user-position patch inference -> npz (reference
            # evaluator_nf._infer_patch; needs --case_id --pos)
            if not getattr(args, "pos", None):
                raise SystemExit("nf2 --mode infer needs --pos z y x")
            meta = {int(m["PID"]): m for m in metas}[int(args.case_id)]
            out = run_patch_infer(trainer.predict, meta, dataset_dir, args)
            trainer.ckpt.close()
            return {"infer_path": str(out)}
        # nf2 per-lesion patch eval (reference evaluator_nf._predict_case_v2);
        # mirror TTA runs in-graph as one dispatch per batch
        predict = trainer.predict
        if getattr(args, "eval_mirror", False):
            predict = make_patch_predict_tta(trainer.model, trainer.state,
                                             int(args.random_flip))
        results = evaluator.run_patch(predict, eval_metas,
                                      save=args.save_predict or not do_eval,
                                      do_eval=do_eval)
        trainer.ckpt.close()
        return results
    # device-resident whole-case predictor (evaluators/device_eval.py):
    # run/run_sp use its one-upload-per-case fast path; run_g (stateful
    # per-slice guide propagation) uses its plain per-batch forward
    from boxsegliver_tpu.evaluators.device_eval import DeviceSlicePredictor
    eval_mesh = None
    if getattr(args, "num_replicas", 0) and args.num_replicas > 1:
        # multi-chip 2D eval: shard the slice-batch axis over the data mesh
        # (the reference is single-GPU at eval, reference README.md:156)
        from boxsegliver_tpu.parallel import make_mesh
        eval_mesh = make_mesh(args.num_replicas)
    predictor = DeviceSlicePredictor(trainer.model, trainer.state, args,
                                     mesh=eval_mesh)
    # spatial-guided models: Liver uses the interactive guide-propagation
    # evaluator (reference entry/main_g.py:224-227 run_g); NF uses the fixed
    # sp-point guides (reference NF get_dataset_for_sp_point)
    if getattr(args, "use_spatial", False) and args.task == "nf":
        results = evaluator.run_sp(predictor, eval_metas,
                                   save=args.save_predict or not do_eval,
                                   do_eval=do_eval)
    elif getattr(args, "use_spatial", False) and not getattr(args, "eval_no_sp",
                                                             False):
        if getattr(args, "device_sweep", "on") == "on":
            # both propagation sweeps of a case as ONE dispatch
            # (interactive/device_sweep.py; host loop stays the fallback)
            from boxsegliver_tpu.interactive.device_sweep import \
                GuidedSweepPredictor
            # same id rule as run_g (base strips Background from classes)
            fg = [c for c in args.classes if c != "Background"]
            tumor_id = (fg.index("Tumor") + 1 if "Tumor" in fg else len(fg))
            predict_g = GuidedSweepPredictor(
                trainer.model, trainer.state, args,
                num_classes=len(fg) + 1, tumor_id=tumor_id, mesh=eval_mesh)
        else:
            predict_g = trainer.predict
        results = evaluator.run_g(predict_g, eval_metas,
                                  save=args.save_predict or not do_eval,
                                  do_eval=do_eval)
    else:
        results = evaluator.run(predictor, eval_metas,
                                save=args.save_predict or not do_eval,
                                do_eval=do_eval)
    trainer.ckpt.close()
    return results


if __name__ == "__main__":
    main()
