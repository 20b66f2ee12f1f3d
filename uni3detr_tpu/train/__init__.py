from .losses import uni3detr_loss
from .coder import decode_predictions, post_process
from .step import TrainState, create_train_state, make_train_step, make_eval_step
