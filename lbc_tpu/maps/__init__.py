"""Town maps as arrays (TPU-native replacement of CARLA's map API)."""
from .map_data import MapData, build_map_data, nearest_waypoint_np
from .roadnet import RoadNetwork, get_roadnet

__all__ = ['MapData', 'RoadNetwork', 'build_map_data', 'get_roadnet',
           'nearest_waypoint_np']
