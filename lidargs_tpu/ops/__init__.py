from .projection import Splats, preprocess_gaussians, quat_to_rotmat, build_cov3d
from .composite import composite_depth_ordered, CompositeOut
from .reference import render_reference
from .rasterize import render_tiled, RenderOut
