from .beams import (
    uniform_beam_inclinations,
    helios_beam_inclinations,
    kitti_beam_inclinations,
)
from .pano import (
    ray_dirs_from_beams,
    pano_to_lidar,
    pano_to_lidar_with_intensities,
    lidar_to_pano_with_intensities,
    find_closest_beam,
)
from .frames import LidarFrame
