from focnerf_tpu.train.state import TrainState, create_train_state
from focnerf_tpu.train.steps import make_train_step, make_eval_step
