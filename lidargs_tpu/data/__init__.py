from .ply import read_ply, write_ply
from .waymo import read_lidar_scene, SceneData
from .scene import Scene
