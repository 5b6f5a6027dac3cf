"""Low-level control (reference: bird_view/models/controller.py)."""
from .circle_fit import (ls_circle, project_point_to_circle,
                         signed_angle_from_forward)
from .legacy_pid import (LegacyControllerState, LegacyPIDParams,
                         heading_to_waypoint_angle, legacy_controller_init,
                         vehicle_pid_step)
from .pid import (CommandPIDParams, PIDState, command_pid_step, pid_init,
                  pid_reset, pid_step)
from .waypoint_controller import (AgentControllerParams, ControllerState,
                                  birdview_agent_control,
                                  birdview_controller_params,
                                  birdview_locations_to_targets,
                                  birdview_target_speed, controller_init,
                                  image_agent_control,
                                  image_controller_params,
                                  unproject_image_waypoints,
                                  waypoints_to_control)

__all__ = [
    'ls_circle', 'project_point_to_circle', 'signed_angle_from_forward',
    'LegacyControllerState', 'LegacyPIDParams', 'heading_to_waypoint_angle',
    'legacy_controller_init', 'vehicle_pid_step',
    'CommandPIDParams', 'PIDState', 'command_pid_step', 'pid_init',
    'pid_reset', 'pid_step', 'AgentControllerParams', 'ControllerState',
    'birdview_agent_control', 'birdview_controller_params',
    'birdview_locations_to_targets', 'birdview_target_speed',
    'controller_init', 'image_agent_control', 'image_controller_params',
    'unproject_image_waypoints', 'waypoints_to_control',
]
