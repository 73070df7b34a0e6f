from vlsfr_tpu.train.checkpoints import CheckpointManager
from vlsfr_tpu.train.trainer import Trainer
