"""Evaluators: full-volume reassembly, TTA, postprocess, 3D metrics, NIfTI save.

TPU-native redesign of reference evaluators/ (evaluator_base.py,
evaluator_liver.py, evaluator_nf.py): the TF placeholder-graph prediction loop
becomes a jitted forward over fixed-shape slice batches; everything ragged
(per-case depth, crop shapes) stays on host.
"""

from boxsegliver_tpu.evaluators.base import EvaluateBase  # noqa: F401
from boxsegliver_tpu.evaluators.volume import EvaluateVolume  # noqa: F401
