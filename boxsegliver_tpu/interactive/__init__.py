"""Interactive segmentation machinery: click simulation, guide propagation,
interactive evaluation loops.

Re-designs the reference's signature interactive features (reference
DataLoader/NF/input_pipeline_g_simply.py:346-412 click simulation;
DataLoader/Liver/input_pipeline_g.py:1179-1513 EvalImage3DLoader guide
propagation; entry/main_eval.py + main_eval_3d.py interactive loops) with a
host-side state machine driving a fixed-shape jitted forward.
"""

from boxsegliver_tpu.interactive.clicks import inter_simulation  # noqa: F401
from boxsegliver_tpu.interactive.propagation import GuidePropagationLoader  # noqa: F401
