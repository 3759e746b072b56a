from diffusionhandles_tpu.geometry.depth import (depth_to_world_coords,
                                                 normalize_depth,
                                                 points_to_depth)
from diffusionhandles_tpu.geometry.transform import (transform_depth,
                                                     transform_depth_pc,
                                                     transform_points,
                                                     transform_point_cloud)
