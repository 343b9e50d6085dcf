"""END-TO-END numeric parity against the actual reference PyTorch generator.

The fixture is produced by tools/gen_golden_forward.py, which runs the real
reference InfinityGanGenerator on CPU (CUDA ops stubbed with the repo's own
fallback math) and dumps {state_dict, inputs, outputs}.  This test imports
the weights through the checkpoint converter and runs the JAX generator on
identical inputs — the strongest possible correctness check of the rebuild
(SURVEY.md Phase-3 milestone).

Skipped when neither the cached fixture nor /root/reference is available.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

FIXTURE = "/tmp/spgan_reference_forward.npz"
FIXTURE_SSMAP = "/tmp/spgan_reference_forward_ssmap.npz"
FIXTURE_FULL = "/tmp/spgan_reference_forward_full.npz"
GEN_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "gen_golden_forward.py")


def _ensure_fixture(path, *extra_args):
    if not os.path.exists(path):
        if not os.path.exists("/root/reference"):
            pytest.skip("reference repo not mounted and no cached fixture")
        subprocess.run([sys.executable, GEN_SCRIPT, path, *extra_args],
                       check=True, timeout=2400)
    return np.load(path)


@pytest.fixture(scope="module")
def ref():
    return _ensure_fixture(FIXTURE)


def _check_generator_parity(ref, ss_mapping=False, tol=2e-3):
    from spgan_tpu.config import Config
    from spgan_tpu.compat.torch_import import import_torch_generator
    from spgan_tpu.geometry.coords import CoordsPartial
    from spgan_tpu.models.generator import Generator

    cfg = Config()
    tp = cfg.train_params
    if "meta" in ref.files:
        meta = ref["meta"]
        tp.global_latent_dim = int(meta[0])
        tp.local_latent_dim = int(meta[1])
        tp.n_mlp = int(meta[2])
        tp.ss_mapping = bool(meta[3])
    else:  # fixtures generated before the meta payload: reduced dims
        tp.global_latent_dim = 32
        tp.local_latent_dim = 16
        tp.n_mlp = 2
        tp.ss_mapping = ss_mapping
    tp.channel_multiplier = 2
    g = Generator.from_config(cfg)

    sd = {k[len("sd__"):]: ref[k] for k in ref.files if k.startswith("sd__")}
    params = import_torch_generator(sd, g)

    B = int(ref["global_latent"].shape[0])
    gl = jnp.asarray(ref["global_latent"])
    ll = jnp.asarray(ref["local_latent"].transpose(0, 2, 3, 1))
    coords = jnp.asarray(ref["coords"].transpose(0, 2, 3, 1))
    noises = [jnp.asarray(ref[f"noise_{i}"].transpose(0, 2, 3, 1))
              for i in range(8)]
    c = ref["cp"]
    cp = CoordsPartial(
        p_x_st=jnp.full((B,), c[0]), p_x_ed=jnp.full((B,), c[1]),
        p_y_st=jnp.full((B,), c[2]), p_y_ed=jnp.full((B,), c[3]),
        circular=jnp.full((B,), c[4]),
        x_total=int(c[5]), y_total=int(c[6]),
        grid_partial=float(c[8]), test_flag=True)

    out = g.apply(params, global_latent=gl, local_latent=ll, coords=coords,
                  cp=cp, noises=noises, inject_index=None)

    want_sl = ref["structure_latent"].transpose(0, 2, 3, 1)
    got_sl = np.asarray(out["structure_latent"])
    err_sl = np.abs(got_sl - want_sl).max()
    scale_sl = np.abs(want_sl).max()
    assert err_sl / scale_sl < tol, (err_sl, scale_sl)

    want = ref["gen"].transpose(0, 2, 3, 1)
    got = np.asarray(out["gen"])
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err / scale < tol, (err, scale)


def test_forward_parity_with_reference(ref):
    _check_generator_parity(ref)


def test_forward_parity_ss_mapping():
    """ss_mapping=True: the 8-layer global-mapping MLP before SS modulation
    (reference spgan.py:184-197) — weights imported, outputs matched."""
    ref = _ensure_fixture(FIXTURE_SSMAP, "--ss-mapping")
    assert "sd__structure_synthesizer.implicit_model.global_mapping.1.weight" \
        in ref.files
    _check_generator_parity(ref, ss_mapping=True)


@pytest.mark.slow
def test_forward_parity_full_size():
    """Shipped dims (512/256/n_mlp 8, channel_multiplier 2): the full-size
    single-patch parity run (VERDICT r1 weak #4).  ~minutes on CPU; opt-in
    via `pytest -m slow`."""
    ref = _ensure_fixture(FIXTURE_FULL, "--full")
    _check_generator_parity(ref)


def test_discriminator_parity_with_reference(ref):
    if "d_in" not in ref.files:
        pytest.skip("fixture predates the D parity payload")
    from spgan_tpu.compat.torch_import import import_torch_discriminator
    from spgan_tpu.models.discriminator import Discriminator

    d = Discriminator(patch_size=101, channel_multiplier=2, batch_size=2,
                      use_coord_ac=True, coord_num_dir=3)
    sd = {k[len("dsd__"):]: ref[k] for k in ref.files
          if k.startswith("dsd__")}
    params = import_torch_discriminator(sd, d)

    img = jnp.asarray(ref["d_in"].transpose(0, 2, 3, 1))
    out = d.apply(params, img)
    for mine, key in ((out["d_patch"], "d_patch"),
                      (out["ac_coords_pred"], "d_ac_pred")):
        got = np.asarray(mine)
        want = ref[key]
        err = np.abs(got - want).max()
        scale = np.abs(want).max() + 1e-6
        assert err / scale < 2e-3, (key, err, scale)
