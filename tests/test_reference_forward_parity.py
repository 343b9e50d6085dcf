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
GEN_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "gen_golden_forward.py")


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(FIXTURE):
        if not os.path.exists("/root/reference"):
            pytest.skip("reference repo not mounted and no cached fixture")
        subprocess.run([sys.executable, GEN_SCRIPT, FIXTURE], check=True,
                       timeout=1200)
    return np.load(FIXTURE)


def test_forward_parity_with_reference(ref):
    from spgan_tpu.config import Config
    from spgan_tpu.compat.torch_import import import_torch_generator
    from spgan_tpu.geometry.coords import CoordsPartial
    from spgan_tpu.models.generator import Generator

    cfg = Config()
    tp = cfg.train_params
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 2
    tp.n_mlp = 2
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
    assert err_sl / scale_sl < 2e-3, (err_sl, scale_sl)

    want = ref["gen"].transpose(0, 2, 3, 1)
    got = np.asarray(out["gen"])
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err / scale < 2e-3, (err, scale)


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
