from diffusionhandles_tpu.testset.driver import test_diffusion_handles
from diffusionhandles_tpu.testset.report import (generate_results_webpage,
                                                 psnr)
