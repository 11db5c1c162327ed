"""Training loops (stage 1 AE, stage 2 propagator), eval, checkpointing."""

from lns_tpu.train.stage1 import Stage1Trainer
from lns_tpu.train.stage2 import Stage2Trainer
