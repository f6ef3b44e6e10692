"""Model zoo and model construction from args + YAML configs.

Mirrors the reference registry (core/models.py:36-38) and YAML config loading
(core/models.py:92-118): configs live in boxsegliver_tpu/configs/models/
<Model>.yml with ext_config/ fallback; `--model_config` overrides the name.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from boxsegliver_tpu.models.unet import UNet
from boxsegliver_tpu.models.gunet import GUNet
from boxsegliver_tpu.models.unet_inter import UNetInter
from boxsegliver_tpu.models.lgnet import LGNet
from boxsegliver_tpu.models.small_unet import SmallUNet
from boxsegliver_tpu.models.inter_unet import InterUNet
from boxsegliver_tpu.models.unet3d import UNet3D
from boxsegliver_tpu.models.dense_unet import DenseUNet
from boxsegliver_tpu.models.layers import predictions_from_logits  # noqa: F401

MODEL_ZOO = {
    "UNet": UNet,
    "GUNet": GUNet,
    "UNetInter": UNetInter,
    "LGNet": LGNet,
    "UNet3D": UNet3D,
    "SmallUNet": SmallUNet,
    "InterUNet": InterUNet,
    # commented out of the reference zoo (core/models.py:31,37) but shipped
    # with full code + ImageNet h5 warm start; registered here
    "DenseUNet": DenseUNet,
}

_CONFIG_DIR = Path(__file__).parent.parent / "configs" / "models"

# Which constructor fields each model pulls from the flag namespace.
_ARG_FIELDS = {
    "UNet": ("normalizer", "without_norm", "img_grad", "weight_init"),
    "GUNet": ("normalizer", "without_norm", "img_grad", "weight_init",
              "use_context", "use_spatial", "use_se", "guide_channel",
              "side_dropout", "dropout", "fix"),
    "UNetInter": ("normalizer", "without_norm", "img_grad", "weight_init",
                  "mid_cat"),
    "LGNet": ("normalizer", "without_norm", "img_grad", "weight_init",
              "use_spatial", "guide_channel"),
    "UNet3D": ("normalizer", "without_norm", "img_grad", "weight_init",
               "use_spatial"),
    "SmallUNet": ("normalizer", "without_norm", "weight_init"),
    "InterUNet": ("normalizer", "without_norm", "img_grad", "weight_init",
                  "im_channel"),
    "DenseUNet": ("weight_init", "dropout"),
}

# YAML keys consumed by the runtime rather than the model constructor
_RUNTIME_KEYS = ("ret_prob", "ret_pred", "build_metrics", "build_summaries")


def load_model_config(model: str, model_config: Optional[str] = None) -> Dict:
    """YAML model hyperparams (reference core/models.py:97-113 search order)."""
    name = model_config or (model + ".yml")
    path = _CONFIG_DIR / name
    if not path.exists():
        path = _CONFIG_DIR / "ext_config" / name
        if not path.exists():
            return {}
    with path.open() as f:
        return yaml.safe_load(f) or {}


def get_model_params(args) -> Dict[str, Any]:
    """params dict {model, model_kwargs} (reference core/models.py:92-118)."""
    if args.model not in MODEL_ZOO:
        raise ValueError(f"Unknown model {args.model}; registered: {list(MODEL_ZOO)}")
    kwargs = load_model_config(args.model, getattr(args, "model_config", None))
    return {"model": args.model, "model_kwargs": kwargs}


def build_model(model_name: str, args=None, model_kwargs: Optional[Dict] = None,
                num_classes: Optional[int] = None, dtype=None):
    """Instantiate a flax Module from flags + YAML kwargs.

    num_classes defaults to len(args.classes) + 1 (Background prepended,
    reference NetworksV2/base.py:44 + UNet.py:34).
    """
    cls = MODEL_ZOO[model_name]
    kwargs = dict(model_kwargs or {})
    for key in _RUNTIME_KEYS:
        kwargs.pop(key, None)
    # YAML lists → hashable tuples for flax dataclass fields
    for key in ("mod_layers", "context_fc_channels", "nb_layers"):
        if key in kwargs and isinstance(kwargs[key], list):
            if kwargs[key] and isinstance(kwargs[key][0], list):
                kwargs[key] = tuple(tuple(v) for v in kwargs[key])
            else:
                kwargs[key] = tuple(kwargs[key])
    if args is not None:
        for field in _ARG_FIELDS.get(model_name, ()):
            if hasattr(args, field):
                kwargs.setdefault(field, getattr(args, field))
        if num_classes is None:
            num_classes = len(args.classes) + 1
    if num_classes is not None:
        kwargs["num_classes"] = num_classes
    if dtype is not None:
        kwargs["dtype"] = dtype
    valid = set(cls.__dataclass_fields__)  # flax modules are dataclasses
    if "lane_pack" in valid and "lane_pack" not in kwargs:
        kwargs["lane_pack"] = _lane_pack_default(args)
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    return cls(**kwargs)


def _lane_pack_default(args) -> bool:
    """Route the width-packed full-res stage (models/packed.py): on by
    default on TPU, --lane_pack on/off overrides (PERF.md: the 64-channel
    256^2 stage half-fills the 128-wide lanes; packing is measured faster
    and numerically a layout no-op, tests/test_lane_pack.py)."""
    mode = getattr(args, "lane_pack", "auto") if args is not None else "auto"
    if mode == "on":
        return True
    if mode == "off":
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False
