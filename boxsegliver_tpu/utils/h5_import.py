"""DenseNet-161 ImageNet h5 warm start for DenseUNet.

Reproduces the reference's `init_dense_model` (core/models.py:188-221): the
`densenet161_weights_tf.h5` file stores one group per layer with keys
    <layer>/<layer>_W                       conv kernels (HWIO)
    <layer>_bn/<layer>_bn_running_mean      BN moving mean
    <layer>_bn/<layer>_bn_running_std       BN moving variance
    <layer>_scale/<layer>_scale_{beta,gamma}  BN affine params
Because DenseUNet's flax submodule names equal the reference variable scopes
(models/dense_unet.py), the mapping is a direct walk of the param tree:
layers present in the file are restored, everything else (the decoder) keeps
its fresh init — the same partial-restore semantics as the reference.

Deliberate deviation: the reference iterates `tf.trainable_variables`, so its
moving_mean/moving_variance branches (core/models.py:205-210) are dead code —
it warm-starts BN *affine* params only and leaves the moving statistics at
fresh init.  This import additionally restores `batch_stats` from the file's
running_mean/running_std, a behavioral superset (arguably the intended
behavior: pretrained affine params are calibrated against the pretrained
statistics).  Set `skip_batch_stats=True` to reproduce the reference's
trainable-only restore exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_densenet161_h5(variables: Dict[str, Any], h5_path: str,
                        log=None, skip_batch_stats: bool = False
                        ) -> Tuple[Dict[str, Any], int]:
    """Return (variables with imported encoder weights, #leaves restored).

    `variables` is the flax variables dict ({"params": ..., "batch_stats":
    ...}); leaves are replaced (dtype-cast to the existing leaf's dtype),
    and a shape mismatch raises rather than silently truncating.
    `skip_batch_stats=True` reproduces the reference's trainable-only warm
    start (see module docstring deviation note).
    """
    import h5py

    import jax

    params = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    params = _to_mutable(params)
    restored = 0

    def _take(group, key, like, what):
        value = np.asarray(group[key])
        if value.shape != tuple(like.shape):
            raise ValueError(
                f"h5 import shape mismatch for {what}: file {value.shape} "
                f"vs model {tuple(like.shape)}")
        return value.astype(np.asarray(like).dtype)

    with h5py.File(h5_path, "r") as f:
        keys = set(f.keys())
        for layer, leaves in params.get("params", {}).items():
            if not isinstance(leaves, dict):
                continue
            if "kernel" in leaves and layer in keys:
                leaves["kernel"] = _take(f[layer], layer + "_W",
                                         leaves["kernel"], layer)
                restored += 1
                _log(log, "Restore %s/kernel", layer)
            if "scale" in leaves or "bias" in leaves:
                # BN affine lives under <base>_scale (reference
                # core/models.py:203-208: layer[:-3] + "_scale")
                scale_key = layer[:-3] + "_scale" if layer.endswith("_bn") \
                    else None
                if scale_key in keys:
                    grp = f[scale_key]
                    leaves["scale"] = _take(grp, scale_key + "_gamma",
                                            leaves["scale"], scale_key)
                    leaves["bias"] = _take(grp, scale_key + "_beta",
                                           leaves["bias"], scale_key)
                    restored += 2
                    _log(log, "Restore %s/{scale,bias}", layer)
        stats = {} if skip_batch_stats else params.get("batch_stats", {})
        for layer, leaves in stats.items():
            if isinstance(leaves, dict) and layer in keys:
                grp = f[layer]
                leaves["mean"] = _take(grp, layer + "_running_mean",
                                       leaves["mean"], layer)
                leaves["var"] = _take(grp, layer + "_running_std",
                                      leaves["var"], layer)
                restored += 2
                _log(log, "Restore %s/{mean,var}", layer)
    return params, restored


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # flax FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


def _log(log, fmt, *args):
    if log is not None:
        log.info(fmt, *args)
