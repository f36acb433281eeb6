from pcrcg_tpu.train.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from pcrcg_tpu.train.step import eval_step, forward_pair, infer_step, train_step  # noqa: F401
