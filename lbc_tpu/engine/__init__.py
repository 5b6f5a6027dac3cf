"""Pure-JAX world engine (TPU-native replacement of the CARLA server)."""
from .dynamics import DEFAULT_DYNAMICS, DynamicsParams, bicycle_step
from .env import DrivingEnv, EnvConfig, stack_states
from .lights import GREEN, RED, YELLOW, light_states
from .routing import (MAX_ROUTE, distance_to_goal, make_route_state,
                      nearest_waypoint, route_step, route_target,
                      route_timeout_frames)
from .state import (EgoState, EnvState, EpisodeState, NPCVehicleState,
                    RouteState, WalkerState)

__all__ = [
    'DEFAULT_DYNAMICS', 'DynamicsParams', 'bicycle_step', 'DrivingEnv',
    'EnvConfig', 'stack_states', 'GREEN', 'RED', 'YELLOW', 'light_states',
    'MAX_ROUTE', 'distance_to_goal', 'make_route_state', 'nearest_waypoint',
    'route_step', 'route_target', 'route_timeout_frames', 'EgoState',
    'EnvState', 'EpisodeState', 'NPCVehicleState', 'RouteState',
    'WalkerState',
]
