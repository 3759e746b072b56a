from diffusionhandles_tpu.models.unet import (UNet2DCondition, UNetConfig,
                                              init_unet_params,
                                              tiny_unet_config)
from diffusionhandles_tpu.models.vae import (AutoencoderKL, VAEConfig,
                                             init_vae_params,
                                             tiny_vae_config)
from diffusionhandles_tpu.models.clip_text import (CLIPTextEncoder,
                                                   CLIPTextConfig,
                                                   init_clip_params,
                                                   tiny_clip_config)
from diffusionhandles_tpu.models.tokenizer import (CLIPBPETokenizer,
                                                   HashTokenizer,
                                                   load_tokenizer)
