from bpbreid_tpu.optim.lr_scheduler import LRSchedule, build_lr_scheduler
from bpbreid_tpu.optim.optimizer import build_optimizer
