"""Training runtime: solver (optimizer + LR policies), SPMD trainer, hooks,
checkpoint management.

TPU-native redesign of the reference core/ runtime (reference
core/estimator.py, core/solver.py, core/hooks.py): the TF1 graph/session/hook
machinery becomes a functional jitted train step sharded over a device mesh,
with host-side controller objects (plateau LR, best-checkpoint, speed logging)
that mirror the reference hooks' observable behavior (JSON sidecars included).
"""

from boxsegliver_tpu.train.solver import Solver  # noqa: F401
from boxsegliver_tpu.train.trainer import Trainer, TrainState  # noqa: F401
