"""Policy networks (reference: bird_view/models/)."""
from .baseline import BaselineCIL
from .birdview_net import BirdviewPolicy
from .image_net import ImagePolicy
from .layers import (crop_birdview, normalize_imagenet, one_hot_command,
                     select_branch, spatial_softmax)
from .resnet import ResNetFeatures, get_resnet


def get_model(name: str, **kwargs):
    """Model factory keyed by the reference's config `model_args['model']`
    names (benchmark_agent.py:28-43): 'birdview_dian' -> privileged net,
    'image_ss' -> image net, 'baseline' -> CIL baseline."""
    name = name.lower()
    if name in ('birdview_dian', 'birdview'):
        return BirdviewPolicy(**kwargs)
    if name in ('image_ss', 'image'):
        return ImagePolicy(**kwargs)
    if name == 'baseline':
        return BaselineCIL(**kwargs)
    raise ValueError(f'unknown model: {name}')


__all__ = [
    'BaselineCIL', 'BirdviewPolicy', 'ImagePolicy', 'ResNetFeatures',
    'get_resnet', 'get_model', 'crop_birdview', 'normalize_imagenet',
    'one_hot_command', 'select_branch', 'spatial_softmax',
]
