"""Observability & misc utilities (reference: bird_view/utils/bz_utils/)."""
from .visualize import visualize_birdview

__all__ = ['visualize_birdview']
