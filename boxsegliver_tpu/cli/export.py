"""Serving export: serialize the jitted forward as StableHLO + params.

TPU-native equivalent of the reference's TF-Serving SavedModel export
(entry/main_export.py:28-120, GUNet.export_model NetworksV2/GUNet.py:594-668):
`jax.export` gives a portable StableHLO artifact with a stable serving
signature (images [, sp_guide, context] → probs); params ship as an orbax
checkpoint next to it.  Preprocessing (resize + normalize) is baked into the
exported function like the reference's in-graph preprocessing.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def export_model(args, dataset_dir=None, out_dir=None):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    import orbax.checkpoint as ocp

    from boxsegliver_tpu.cli.main import build_feature_template, build_trainer

    trainer = build_trainer(args, dataset_dir)
    if getattr(args, "ckpt_path", None):
        from boxsegliver_tpu.train.checkpoint import warm_start
        trainer.state = warm_start(trainer.state, args.ckpt_path)
    elif trainer.ckpt.has_best():
        restored = trainer.ckpt.restore_best(trainer.state)
        if restored is not None:
            trainer.state = restored
    else:
        trainer.restore()

    model = trainer.model
    state = trainer.state
    feats = build_feature_template(args)

    # jax.export cannot serialize FrozenDict pytrees — use plain dicts
    from flax.core import unfreeze
    export_params = unfreeze(state.params)
    export_bs = unfreeze(state.batch_stats) if state.batch_stats else {}

    def serve(params, batch_stats, features):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        # in-graph preprocessing: resize to the serving resolution + [0,1]
        imgs = features["images"].astype(jnp.float32)
        imgs = jax.image.resize(
            imgs, (imgs.shape[0], args.im_height, args.im_width, imgs.shape[-1]),
            method="linear")
        features = dict(features, images=imgs)
        logits = model.apply(variables, features, train=False)
        return jax.nn.softmax(logits, axis=-1)

    out = Path(out_dir or Path(args.model_dir) / "export")
    out.mkdir(parents=True, exist_ok=True)

    # multi-platform lowering: a bundle exported on the TPU must still serve
    # on CPU (README "Serving the export"); jax.export otherwise pins the
    # module to the platform it was traced on
    exported = jax_export.export(jax.jit(serve),
                                 platforms=("cpu", "tpu"))(
        export_params, export_bs, feats)
    (out / "model.stablehlo").write_bytes(exported.serialize())

    ckptr = ocp.StandardCheckpointer()
    ckptr.save((out / "params").resolve(),
               {"params": export_params, "batch_stats": export_bs},
               force=True)
    ckptr.wait_until_finished()

    signature = {
        "inputs": {k: [list(v.shape), str(np.asarray(v).dtype)]
                   for k, v in feats.items()},
        "output": "softmax probabilities [bs, h, w, num_classes]",
        "model": args.model,
        "classes": ["Background"] + list(args.classes),
    }
    (out / "signature.json").write_text(json.dumps(signature, indent=2))
    return out


def load_exported(export_dir):
    """Reload an exported model → callable(params_dict, features)."""
    from jax import export as jax_export

    export_dir = Path(export_dir)
    exported = jax_export.deserialize(
        bytearray((export_dir / "model.stablehlo").read_bytes()))
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore((export_dir / "params").resolve())
    signature = json.loads((export_dir / "signature.json").read_text())

    def serve(features):
        return exported.call(params["params"], params["batch_stats"], features)

    return serve, signature
