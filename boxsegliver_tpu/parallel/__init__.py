"""Device-mesh parallelism utilities.

TPU-native replacement for the reference's distribution story (reference
utils/distribution_utils.py:27-206: forked MirroredStrategy + NCCL /
hierarchical-copy all-reduce, single node): here data parallelism is a 1-D
``jax.sharding.Mesh`` over all chips; XLA inserts the gradient all-reduce over
ICI, so the reference's --all_reduce_alg knob has no equivalent (XLA picks).
The global-batch contract is preserved: global batch size must divide the mesh
size (reference per_device_batch_size, distribution_utils.py:107-134), and the
reference's prediction-reduction contract (keys with '/' → cross-replica MEAN,
others → concat on batch axis, core/estimator.py:580-587) falls out naturally
from pjit: scalars are globally reduced, batch-sharded outputs are global
arrays.
"""

from boxsegliver_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, per_device_batch_size,
    shard_batch)
