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


def test_baseline_transfer_and_freeze_mask():
    """--baseline_dir transfer (reference train.py:884-957, utils.py:397-463):
    a planar baseline sd (SS planar convs at conv_stack.{0..3}, no sphere /
    sp_conv keys) loads into the interleaved layout; unloaded leaves keep the
    template init and the freeze mask marks exactly the loaded leaves."""
    from spgan_tpu.compat.baseline import import_torch_baseline_generator

    g = small_gen()
    trained = g.init(jax.random.PRNGKey(3))
    # make "trained" distinguishable from a fresh init
    trained = jax.tree_util.tree_map(lambda x: x + 0.25, trained)
    sd_full = export_torch_style_state_dict(trained, g)

    # build the baseline-style sd: planar convs re-indexed 2i+1 -> i,
    # sphere/sc/sp_conv keys dropped
    sd_base = {}
    for k, v in sd_full.items():
        if ".sp_convs." in k or ".sc." in k:
            continue
        marker = "structure_synthesizer.implicit_model.conv_stack."
        if marker in k:
            idx = int(k[len(marker):].split(".")[0])
            if idx % 2 == 0:           # sphere blocks absent in a baseline
                continue
            k = k.replace(f"conv_stack.{idx}.", f"conv_stack.{idx // 2}.")
        sd_base[k] = v

    template = g.init(jax.random.PRNGKey(0))
    params, mask = import_torch_baseline_generator(sd_base, g, template)

    for i, blk in enumerate(params["ss"]["blocks"]):
        np.testing.assert_allclose(
            np.asarray(blk["planar"]["conv"]["weight"]),
            np.asarray(trained["ss"]["blocks"][i]["planar"]["conv"]["weight"]),
            atol=1e-6)
        assert mask["ss"]["blocks"][i]["planar"]["conv"]["weight"] is True
        # sphere + sc untouched, unfrozen
        np.testing.assert_allclose(
            np.asarray(blk["sphere"]["conv"]["weight"]),
            np.asarray(template["ss"]["blocks"][i]["sphere"]["conv"]["weight"]))
        assert mask["ss"]["blocks"][i]["sphere"]["conv"]["weight"] is False
        assert mask["ss"]["blocks"][i]["sc"]["weight"] is False
    np.testing.assert_allclose(
        np.asarray(params["ts"]["convs"][0]["conv"]["weight"]),
        np.asarray(trained["ts"]["convs"][0]["conv"]["weight"]), atol=1e-6)
    assert mask["ts"]["convs"][0]["conv"]["weight"] is True
    for spc in mask["ts"]["sp_convs"]:
        assert spc["weight"] is False
