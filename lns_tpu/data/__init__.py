"""Data pipelines (numpy, channels-last).

One loader per workload x stage, mirroring the reference's dataset classes
(SURVEY.md section 2.11) with byte-identical deterministic splits (numpy
seed 1 for NS2d, seed 44 for two-phase), the same normalization statistics,
and the same windowing arithmetic. Batches are assembled with vectorized
numpy fancy-indexing (no per-item worker processes) and fed to jitted train
steps as stacked arrays.
"""

from lns_tpu.data.ns2d import NS2DStage1, NS2DStage2
from lns_tpu.data.twophase import (
    TankSloshingStage1,
    TankSloshingStage2,
    ConditionalTankSloshingStage2,
    SimpleTankSloshingData,
    ConditionalSimpleTankSloshingData,
)
from lns_tpu.data.shallow_water import SWStage1, SWStage2, SW2DDataSimple
from lns_tpu.data.km2d import KM2DStage1, KM2DStage2
from lns_tpu.data.loader import epoch_batches
from lns_tpu.data.prefetch import prefetch_to_device
