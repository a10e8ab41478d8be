from facegantts_tpu.models.diffusion import Diffusion  # noqa: F401
from facegantts_tpu.models.discriminator import SpectrogramDiscriminator  # noqa: F401
from facegantts_tpu.models.facetts import FaceTTS, LossParts  # noqa: F401
from facegantts_tpu.models.syncnet import SyncNet  # noqa: F401
from facegantts_tpu.models.text_encoder import TextEncoder  # noqa: F401
from facegantts_tpu.models.unet import (  # noqa: F401
    GradLogPEstimator2d,
    GradLogPEstimator2dTpuOpt,
)
