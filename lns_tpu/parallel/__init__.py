"""Parallelism: device mesh + sharding policies.

The reference implements no parallelism of any kind (single `cuda:0`
device, no torch.distributed anywhere — SURVEY.md section 2.9). The
TPU-native equivalent is data parallelism over ICI: a 1-D `data` mesh,
batches sharded on the leading axis, parameters replicated, and gradient
all-reduce emitted by XLA as `psum` collectives during jit compilation —
no hand-written communication backend.
"""

from lns_tpu.parallel.mesh import data_mesh, batch_sharding, replicated_sharding, shard_batch
