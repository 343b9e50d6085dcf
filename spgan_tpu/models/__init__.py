from spgan_tpu.models.generator import (  # noqa: F401
    Generator,
    StructureSynthesizer,
    TextureSynthesizer,
)
from spgan_tpu.models.discriminator import Discriminator  # noqa: F401
from spgan_tpu.models import losses  # noqa: F401
from spgan_tpu.models.latents import LatentSampler  # noqa: F401
