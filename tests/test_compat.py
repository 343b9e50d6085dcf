"""Checkpoint-compat round trips: params -> torch-style state_dict -> params,
and npz save/load."""
import numpy as np
import jax

from spgan_tpu.compat.load import load_params_npz, save_params_npz
from spgan_tpu.compat.torch_import import (
    export_torch_style_state_dict,
    import_torch_generator,
)
from spgan_tpu.config import Config
from spgan_tpu.models.generator import Generator


def small_gen():
    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    g = Generator.from_config(cfg)
    object.__setattr__(g.ts, "channel_base", 48)
    return g


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_torch_state_dict_roundtrip():
    g = small_gen()
    params = g.init(jax.random.PRNGKey(0))
    sd = export_torch_style_state_dict(params, g)
    # torch-layout sanity: modulated conv weights are (1,out,in,k,k)
    w = sd["texture_synthesizer.convs.0.conv.weight"]
    assert w.ndim == 5 and w.shape[0] == 1 and w.shape[-1] == 3
    back = import_torch_generator(sd, g)
    _assert_trees_equal(params, back)


def test_npz_roundtrip(tmp_path):
    g = small_gen()
    params = g.init(jax.random.PRNGKey(1))
    p = str(tmp_path / "params.npz")
    save_params_npz(p, params)
    back = load_params_npz(p, params)
    _assert_trees_equal(params, back)


def test_import_accepts_dataparallel_prefix():
    g = small_gen()
    params = g.init(jax.random.PRNGKey(2))
    sd = export_torch_style_state_dict(params, g)
    sd = {"module." + k: v for k, v in sd.items()}
    back = import_torch_generator(sd, g)
    _assert_trees_equal(params, back)
