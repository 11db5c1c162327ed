"""Neural building blocks (TPU-first, NHWC layout throughout).

Covers the reference's full block inventory (SURVEY.md section 2.1-2.6):
norms/activations, padded convs (zeros / circular / half-periodic), residual
and up/down-sample blocks, spectral (FNO) convolutions with an MXU
DFT-matmul path, self/linear/cross attention, factorized axial attention,
rotary & sinusoidal & SIREN embeddings, and FiLM/AdaGN/Fourier conditioning.
"""

from lns_tpu.ops.activations import ACTIVATION_REGISTRY, swish, get_activation
from lns_tpu.ops.norms import GroupNorm, LayerNorm, instance_norm_2d
from lns_tpu.ops.padding import pad_nd, pad_half_periodic
from lns_tpu.ops.conv import Conv1x1, ConvND, Dense, HalfPeriodicConv2d
from lns_tpu.ops.losses import (
    relative_lp_loss,
    pointwise_correlation,
    gradient_domain_loss,
    smooth_l1_loss,
)
from lns_tpu.ops.resblocks import (
    ResidualBlock,
    HalfPeriodicResBlock2d,
    DownSampleBlock,
    UpSampleBlock,
    DownSampleBlock2dHalfPeriodic,
    UpSampleBlock2dHalfPeriodic,
)
from lns_tpu.ops.sampling import upsample_nearest_2x, resize_nearest_torch
from lns_tpu.ops.attention import SABlock, LABlock, CABlock
from lns_tpu.ops.factorized_attention import LowRankKernel, PoolingReducer, FABlock2D
from lns_tpu.ops.spectral import (
    SpectralConv1d,
    SpectralConv2d,
    SpectralConv3d,
    batchmul1d,
    batchmul2d,
    batchmul3d,
)
from lns_tpu.ops.fno import FourierBasicBlock, ResFNOMixerBlock, CondResFNOMixerBlock
from lns_tpu.ops.embedding import (
    RotaryEmbedding,
    apply_rotary_pos_emb,
    rotate_half,
    apply_2d_rotary_pos_emb,
    apply_3d_rotary_pos_emb,
    get_emb,
    fourier_embedding,
    Sine,
    Siren,
    SirenNet,
    EmbeddingWrapper,
)
from lns_tpu.ops.conditioning import CondResidualBlock, zeros_init_module
from lns_tpu.ops.fourier_cond import FreqLinear, CondSpectralConv2d, CondFourierBasicBlock
