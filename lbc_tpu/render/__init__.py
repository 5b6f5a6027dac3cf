"""Sensor rendering: BEV rasterizer and RGB camera."""
from .bev import pixel_world_coords, render_bev, render_bev_state

__all__ = ['pixel_world_coords', 'render_bev', 'render_bev_state']
