from diffusionhandles_tpu.service.base import (Webapp, decode_payload,
                                               encode_payload)
from diffusionhandles_tpu.service.job_manager import Job, JobManager
