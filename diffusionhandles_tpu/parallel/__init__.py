from diffusionhandles_tpu.parallel.mesh import make_mesh
from diffusionhandles_tpu.parallel.sharding import (shard_params,
                                                    unet_param_spec)
