"""Pallas TPU kernels for the framework's hot ops.

Every kernel has a pure-XLA fallback (the default implementation in
`lns_tpu.ops`); kernels are opt-in via `lns_tpu.pallas_kernels.enable()` or
per-call. Kernels must pass the same golden tests as the XLA path.
"""

from lns_tpu.pallas_kernels.group_norm import fused_group_norm_swish
