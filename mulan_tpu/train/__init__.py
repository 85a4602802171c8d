from mulan_tpu.train.loop import Experiment
from mulan_tpu.train.optimizer import make_lr_schedule, make_optimizer
from mulan_tpu.train.state import TrainState

__all__ = ['Experiment', 'TrainState', 'make_lr_schedule', 'make_optimizer']
