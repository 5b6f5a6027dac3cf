from .birdview_trainer import (birdview_eval_step, birdview_train_step,
                               init_birdview_training, make_birdview_model,
                               make_sharded_train_step, SAVE_EPOCHS)
from .coord_converter import bev_to_image, image_to_bev
from .dagger import (dagger_rollout, dagger_rollout_device,
                     dagger_train_episode, dagger_train_episode_device,
                     make_dagger_agent, sample_weight)
from .image_trainer import (init_image_training, make_image_model,
                            phase0_train_step, phase1_train_step,
                            teacher_all_branch)
from .priv_dagger import (fork_expert_futures, priv_dagger_rollout,
                          priv_dagger_rollout_device,
                          priv_dagger_train_episode,
                          priv_dagger_train_episode_device)
from .losses import (all_branch_location_loss, location_loss,
                     location_loss_normalized)
from .train_state import TrainState, apply_model, create_train_state

__all__ = [
    'birdview_eval_step', 'birdview_train_step', 'init_birdview_training',
    'make_birdview_model', 'make_sharded_train_step', 'SAVE_EPOCHS',
    'all_branch_location_loss', 'location_loss', 'location_loss_normalized',
    'TrainState', 'apply_model', 'create_train_state',
    'bev_to_image', 'image_to_bev', 'dagger_rollout',
    'dagger_rollout_device', 'dagger_train_episode',
    'dagger_train_episode_device', 'make_dagger_agent', 'sample_weight',
    'init_image_training', 'make_image_model', 'phase0_train_step',
    'phase1_train_step', 'teacher_all_branch',
    'fork_expert_futures', 'priv_dagger_rollout',
    'priv_dagger_rollout_device', 'priv_dagger_train_episode',
    'priv_dagger_train_episode_device',
]
