"""LNS-TPU: a TPU-native JAX/XLA/Pallas re-implementation of the Latent Neural
PDE Solver (LNS) framework.

Reference capability surface: BaratiLab/LNS-Latent-Neural-PDE-Solver
(two-stage reduced-order neural PDE surrogate: conv autoencoder to a
mesh-reduced latent grid + latent-space autoregressive propagator), rebuilt
TPU-first:

  * NHWC data layout (channels ride the 128-wide lane dimension / MXU)
  * functional flax.linen modules, jit-compiled end to end
  * autoregressive rollout as a single fused `lax.scan` (encode once ->
    N latent steps -> batched decode), latents resident in HBM
  * data parallelism over ICI via `jax.sharding.Mesh` + NamedSharding
  * optional Pallas kernels for hot ops, with XLA fallbacks

The package reads the reference's YAML configs unchanged (see
`lns_tpu.config`) and can import the reference's PyTorch checkpoints
(`lns_tpu.utils.torch_compat`).
"""

__version__ = "0.1.0"

from lns_tpu.config import Config, load_config  # noqa: F401
