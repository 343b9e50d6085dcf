"""Persistent XLA compilation cache (compiles through the remote tunnel are
expensive; cache them across processes)."""
import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get("SPGAN_TPU_CACHE",
                                  os.path.expanduser("~/.spgan_tpu_xla_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
