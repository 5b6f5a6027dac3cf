"""Data pipeline (reference: bird_view/utils/datasets/, augmenter.py,
data_collector.py, training/phase2_utils.py)."""
from .augment import (SCHEDULE_NAMES, AugmentParams, augment_batch,
                      augment_image, schedule_params)
from .collect import collect_episodes, make_noisy_expert, noisy_expert_init
from .datasets import BatchSampler, FrameDataset, SampleConfig, \
    world_to_crop_pixel
from .episode_store import (Episode, convert_lmdb_dataset,
                            convert_lmdb_episode, have_lmdb,
                            list_episodes, pack_birdview, unpack_birdview,
                            unpack_birdview_jnp, write_episode)
from .replay import ReplayBuffer

__all__ = [
    'SCHEDULE_NAMES', 'AugmentParams', 'augment_batch', 'augment_image',
    'schedule_params',
    'collect_episodes', 'make_noisy_expert', 'noisy_expert_init',
    'BatchSampler', 'FrameDataset', 'SampleConfig', 'world_to_crop_pixel',
    'Episode', 'convert_lmdb_dataset', 'convert_lmdb_episode',
    'have_lmdb', 'list_episodes',
    'pack_birdview', 'unpack_birdview', 'unpack_birdview_jnp',
    'write_episode', 'ReplayBuffer',
]
