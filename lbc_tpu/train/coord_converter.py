"""Coordinate conversions between BEV-crop space and camera-image space.

Phase 0 projects teacher BEV waypoints into the camera
(train_image_phase0.py:36-79, via cv2.projectPoints there — closed-form
pinhole here); phase 1 unprojects student image waypoints back to BEV crop
pixels differentiably (train_image_phase1.py:35-64). Both are exact
inverses of the agent-side decode in lbc_tpu.control.waypoint_controller.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import (CAMERA_FIXED_OFFSET, CAMERA_FOV, CAMERA_HEIGHT,
                         CAMERA_WIDTH, CAMERA_Z, CROP_SIZE,
                         PIXELS_PER_METER)
from ..control.waypoint_controller import (birdview_locations_to_targets,
                                           unproject_image_waypoints)

FOCAL = CAMERA_WIDTH / 2.0   # fov 90 deg -> f = W/2


def bev_to_image(bev_locations):
    """Teacher [-1,1] BEV-crop waypoints -> [-1,1] image coords.

    bev_locations: (..., n, 2). Ground-plane pinhole projection with the
    camera's forward offset CAMERA_FIXED_OFFSET (phase-0 label transform).
    """
    targets = birdview_locations_to_targets(bev_locations)
    forward = targets[..., 0]
    lateral = targets[..., 1]
    depth = jnp.maximum(forward + CAMERA_FIXED_OFFSET, 0.1)
    u = CAMERA_WIDTH / 2.0 + FOCAL * lateral / depth
    v = CAMERA_HEIGHT / 2.0 + FOCAL * CAMERA_Z / depth
    return jnp.stack([u / (CAMERA_WIDTH / 2.0) - 1.0,
                      v / (CAMERA_HEIGHT / 2.0) - 1.0], axis=-1)


def image_to_bev(image_locations):
    """Student [-1,1] image waypoints -> [-1,1] BEV-crop coords,
    differentiable (phase-1 loss transform)."""
    targets = unproject_image_waypoints(image_locations)
    forward = targets[..., 0]
    lateral = targets[..., 1]
    col = CROP_SIZE / 2.0 + lateral * PIXELS_PER_METER
    row = CROP_SIZE - forward * PIXELS_PER_METER
    return jnp.stack([col / (CROP_SIZE / 2.0) - 1.0,
                      row / (CROP_SIZE / 2.0) - 1.0], axis=-1)
