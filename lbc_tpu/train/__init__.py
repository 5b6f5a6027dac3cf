from .birdview_trainer import (birdview_eval_step, birdview_train_step,
                               init_birdview_training, make_birdview_model,
                               make_sharded_train_step, SAVE_EPOCHS)
from .losses import (all_branch_location_loss, location_loss,
                     location_loss_normalized)
from .train_state import TrainState, apply_model, create_train_state

__all__ = [
    'birdview_eval_step', 'birdview_train_step', 'init_birdview_training',
    'make_birdview_model', 'make_sharded_train_step', 'SAVE_EPOCHS',
    'all_branch_location_loss', 'location_loss', 'location_loss_normalized',
    'TrainState', 'apply_model', 'create_train_state',
]
