from diffusionhandles_tpu.utils.correspondences import (pack_correspondences,
                                                        unpack_correspondences)
from diffusionhandles_tpu.utils.rng import seeded_randn
