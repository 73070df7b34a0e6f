from vlsfr_tpu.optim.optimizers import make_optimizer, set_learning_rate
from vlsfr_tpu.optim.schedules import PlateauController, make_schedule
