"""spgan_tpu — a TPU-native JAX framework for Spherical Patch GAN panorama
generation.

Re-implements the full capability surface of SP-GAN (IEEE TIP 2025,
reference: chronos123/SP-GAN-TIP2025) as an idiomatic JAX/XLA/Pallas stack:

- ``spgan_tpu.ops``       StyleGAN2 op library (equalized layers, upfirdn2d
                          resampling, modulated convs) in NHWC on the MXU.
- ``spgan_tpu.geometry``  Spherical coordinate system: coordinate fields,
                          vectorized gnomonic sampling grids, sphere convs.
- ``spgan_tpu.models``    Generator (structure + texture synthesizer),
                          discriminator, losses.
- ``spgan_tpu.parallel``  Device-mesh/SPMD utilities (pjit/shard_map).
- ``spgan_tpu.train``     GAN training step (R1/PPL double-grad), EMA,
                          checkpointing.
- ``spgan_tpu.infer``     Jitted patch-lattice stitchers (infinite &
                          closed-loop 360-degree panoramas).
- ``spgan_tpu.data``      Host data pipeline (pano projection, patch crops).
- ``spgan_tpu.evalkit``   FID / IS / LPIPS evaluation suite.
"""

__version__ = "0.1.0"

from spgan_tpu.config import Config, load_config  # noqa: F401
