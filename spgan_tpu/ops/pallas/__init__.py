from spgan_tpu.ops.pallas.sphere_kernel import fused_sphere_conv  # noqa: F401
