from diffusionhandles_tpu.ops.attention import (dot_product_attention,
                                                flash_attention)
from diffusionhandles_tpu.ops.resize import (resize_hw, resize_nhwc,
                                             resize_nchw, resize_matrix)
