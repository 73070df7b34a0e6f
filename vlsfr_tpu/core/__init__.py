from vlsfr_tpu.core.lru import LRU
from vlsfr_tpu.core.dcp import DCPManager, StepIndices
