from spgan_tpu.compat.torch_import import (  # noqa: F401
    import_torch_generator,
    export_torch_style_state_dict,
)
from spgan_tpu.compat.load import load_generator_params  # noqa: F401
