"""Unified generator-weights loading: orbax training dirs, flat .npz exports,
or reference torch .ckpt/.pth.tar files."""
from __future__ import annotations

import os
from typing import Any


def _flatten(tree: Any, prefix: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def save_params_npz(path: str, params: Any):
    import numpy as np

    np.savez_compressed(path, **{k: np.asarray(v)
                                 for k, v in _flatten(params)})


def load_params_npz(path: str, template: Any):
    import jax
    import jax.numpy as jnp
    import numpy as np

    data = np.load(path)
    flat = dict(_flatten(template))
    leaves = {k: jnp.asarray(data[k]) for k in flat}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return leaves[prefix[:-1]]

    return rebuild(template)


def load_generator_params(path: str, g) -> dict:
    """path: orbax ckpt dir (training run, restores params_g_ema), a .npz
    export, or a torch checkpoint (.ckpt/.pth/.pth.tar with a g_ema key)."""
    import jax

    if os.path.isdir(path):
        # orbax training checkpoint dir
        from spgan_tpu.config import Config
        from spgan_tpu.models.discriminator import Discriminator
        from spgan_tpu.train.checkpoint import CheckpointManager
        from spgan_tpu.train.state import create_train_state

        cfg = Config()
        d = Discriminator.from_config(cfg)
        template = create_train_state(cfg, g, d, jax.random.PRNGKey(0))
        mgr = CheckpointManager(path)
        state, _ = mgr.restore(template)
        return state.params_g_ema
    if path.endswith(".npz"):
        template = g.init(jax.random.PRNGKey(0))
        return load_params_npz(path, template)
    # torch checkpoint
    import torch

    from spgan_tpu.compat.torch_import import import_torch_generator

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("g_ema", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_generator(sd, g)
