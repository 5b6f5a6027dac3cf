"""Pallas TPU kernels for the hot render ops."""
from .bev_kernel import render_bev_crop_pallas, render_bev_pallas

__all__ = ['render_bev_crop_pallas', 'render_bev_pallas']
