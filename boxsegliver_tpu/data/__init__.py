"""Host-side data layer: NIfTI IO, meta extraction, k-folds, samplers, pipelines.

TPU-first redesign of the reference DataLoader/ (reference
DataLoader/Liver/extract.py, input_pipeline_g.py): offline preprocessing caches
volumes as memory-mapped npy + meta.json (identical schema to the reference),
the online pipeline keeps only sampling decisions on host and moves all pixel
work (window/normalize/zoom/flip/noise/guide-render) into a single jitted
device function.
"""

from boxsegliver_tpu.data.nii import read_nii, write_nii  # noqa: F401
from boxsegliver_tpu.data.kfold import read_or_create_k_folds  # noqa: F401
