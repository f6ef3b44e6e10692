"""HBM-resident volume cache: train without per-step pixel uploads.

TPU-native redesign of the input pipeline's data movement (no reference
counterpart — the reference streams PNG slices through tf.data CPU threads,
DataLoader/Liver/input_pipeline_g.py:696-768).  When the training split's
volumes fit an HBM budget, ALL case slices are uploaded ONCE as two stacked
arrays (uint16 volume / uint8 label, concatenated along z and replicated over
the data-parallel mesh).  Each train step then ships only per-sample indices
and scalars (a few hundred bytes): the fused compiled step gathers the 2.5D
slice window from the cache, crops, resizes, and augments on device.

Why it matters: a 256x256x3 uint16 batch of 32 is ~13 MB/step of host->device
traffic; on hosts with modest PCIe (or this dev tunnel), that transfer — not
the MXU — caps throughput.  With the cache the steady-state transfer is ~1 KB
per step.

Fallback: datasets larger than the budget keep the streaming sampler
(TrainSampler pixel modes); the budget check is explicit, not silent.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("boxsegliver")


class DeviceVolumeCache:
    """All case volumes of a split, stacked along z and resident in HBM.

    Attributes:
        volume: [Z_total, H, W] uint16 device array (replicated over mesh)
        label:  [Z_total, H, W] uint8 device array
        zbase:  {pid: (z_offset, depth)} index table shared with the sampler
    """

    def __init__(self, dataset_dir, pids: Sequence[int], mesh=None,
                 budget_gb: float = 8.0):
        import jax
        from boxsegliver_tpu.parallel.mesh import replicated_sharding

        root = Path(dataset_dir)
        vols, labs = [], []
        self.zbase: Dict[int, Tuple[int, int]] = {}
        z = 0
        hw: Optional[Tuple[int, int]] = None
        total = 0
        for pid in pids:
            pid = int(pid)
            vol = np.load(root / f"volume-{pid}" / "volume.npy", mmap_mode="r")
            lab = np.load(root / f"volume-{pid}" / "segmentation.npy",
                          mmap_mode="r")
            if hw is None:
                hw = vol.shape[1:]
            elif vol.shape[1:] != hw:
                raise ValueError(
                    f"device cache needs uniform in-plane shapes; case {pid} "
                    f"is {vol.shape[1:]} vs {hw}")
            total += vol.shape[0] * vol.shape[1] * vol.shape[2] * 3  # u16+u8
            if total > budget_gb * 1e9:
                raise MemoryError(
                    f"device cache would need >{budget_gb} GB HBM "
                    f"({total / 1e9:.1f} GB at case {pid}); use the streaming "
                    f"sampler or raise --device_cache_gb")
            vols.append(vol)
            labs.append(lab)
            self.zbase[pid] = (z, vol.shape[0])
            z += vol.shape[0]

        sharding = replicated_sharding(mesh) if mesh is not None else None
        vol_host = np.concatenate([np.asarray(v) for v in vols], axis=0)
        lab_host = np.concatenate([np.asarray(l) for l in labs], axis=0)
        self.volume = jax.device_put(vol_host, sharding)
        self.label = jax.device_put(lab_host, sharding)
        self.nbytes = vol_host.nbytes + lab_host.nbytes
        logger.info("Device volume cache: %d cases, %d slices, %.2f GB HBM",
                    len(pids), z, self.nbytes / 1e9)
