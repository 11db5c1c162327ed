"""Composite models: stage-1 autoencoders and stage-2 latent dynamics."""

from lns_tpu.models.autoencoder import (
    SimpleAutoencoder,
    ConditionalSimpleAutoencoder,
    CondEncoder,
    build_autoencoder,
)
from lns_tpu.models.propagator import (
    SimpleCNN,
    CondSimpleCNN,
    DilatedResidualBlock,
    CondDilatedResidualBlock,
    SimpleResNet,
    SimpleMLP,
    ConditionalResNet,
    build_propagator,
)
from lns_tpu.models.latent_dynamics import LatentDynamics
