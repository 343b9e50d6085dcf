from spgan_tpu.utils.misc import import_func, manually_seed, FileLock  # noqa: F401
from spgan_tpu.utils.flops import generator_flops  # noqa: F401
