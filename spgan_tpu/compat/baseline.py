"""Transfer-learning from an InfinityGAN "baseline" checkpoint.

Reference behavior (train.py:884-957 + utils.py:397-463,
load_state_dict_baseline): a planar baseline generator stores its SS styled
convs at `implicit_model.conv_stack.{0..3}`; in the SP-GAN layout those
planar convs live interleaved at indices {1,3,5,7} (sphere blocks occupy the
even slots).  The loader renames those four key groups, loads every key that
intersects the target model, leaves the rest (sphere convs, sphere skip
convs) at their fresh identity init, and returns the loaded key set — which
becomes the freeze list when `train_params.freeze` is set (train.py:959-978;
the discriminator is then frozen entirely).

TPU-native shape: `import_torch_baseline_generator` produces (params,
freeze_mask) where freeze_mask is a boolean pytree (True == loaded == freeze
when requested) that plugs straight into the train step's update masking.
"""
from __future__ import annotations

from typing import Dict, Tuple

from spgan_tpu.compat.torch_import import _conv_w, _linear, _t


def remap_baseline_ss_keys(sd: Dict) -> Dict:
    """conv_stack.{i} -> conv_stack.{2i+1} for the four planar styled-conv
    param groups (utils.py:401-422)."""
    out = {}
    for k, v in sd.items():
        nk = k
        for i in range(4):
            pre = f"structure_synthesizer.implicit_model.conv_stack.{i}."
            if k.startswith(pre) and (
                    ".conv.conv." in k or ".conv.activate." in k):
                nk = k.replace(
                    pre,
                    f"structure_synthesizer.implicit_model.conv_stack."
                    f"{2 * i + 1}.", 1)
                break
        out[nk] = v
    return out


def import_torch_baseline_generator(state_dict: Dict, g,
                                    params_template: dict
                                    ) -> Tuple[dict, dict]:
    """Partial import: fills every leaf whose torch key exists in the
    (remapped) state dict, keeps the template's init elsewhere.  Returns
    (params, freeze_mask) with freeze_mask True exactly on loaded leaves."""
    import jax
    import jax.numpy as jnp

    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    sd = remap_baseline_ss_keys(sd)

    params = jax.tree_util.tree_map(lambda x: x, params_template)
    mask = jax.tree_util.tree_map(lambda x: False, params_template)

    def put(path_keys, value):
        p, m = params, mask
        for k in path_keys[:-1]:
            p, m = p[k], m[k]
        p[path_keys[-1]] = jnp.asarray(value, jnp.float32)
        m[path_keys[-1]] = True

    def try_linear(path_keys, prefix):
        if f"{prefix}.weight" in sd:
            lin = _linear(sd, prefix)
            put(path_keys + ["weight"], lin["weight"])
            put(path_keys + ["bias"], lin["bias"])

    def try_modconv(path_keys, prefix):
        if f"{prefix}.weight" in sd:
            put(path_keys + ["weight"], _conv_w(sd[f"{prefix}.weight"]))
            try_linear(path_keys + ["modulation"], f"{prefix}.modulation")

    # ---- TS -----------------------------------------------------------
    for i in range(g.ts.n_mlp):
        try_linear(["ts", "mapping", i], f"texture_synthesizer.mapping.{i+1}")
    for i in range(g.ts.num_layers):
        p = f"texture_synthesizer.convs.{i}"
        try_modconv(["ts", "convs", i, "conv"], f"{p}.conv")
        if f"{p}.activate.bias" in sd:
            put(["ts", "convs", i, "act_bias"], _t(sd[f"{p}.activate.bias"]))
        if f"{p}.noise.weight" in sd and "noise" in params["ts"]["convs"][i]:
            put(["ts", "convs", i, "noise", "weight"],
                _t(sd[f"{p}.noise.weight"]).reshape(()))
    for j in range(len(params_template["ts"]["to_rgbs"])):
        p = f"texture_synthesizer.to_rgbs.{j}"
        try_modconv(["ts", "to_rgbs", j, "conv"], f"{p}.conv")
        if f"{p}.bias" in sd:
            put(["ts", "to_rgbs", j, "bias"],
                _t(sd[f"{p}.bias"]).reshape(1, 1, 1, 3))
    for j in range(len(params_template["ts"].get("sp_convs", []))):
        p = f"texture_synthesizer.sp_convs.{j}"
        if f"{p}.weight" in sd:
            put(["ts", "sp_convs", j, "weight"],
                _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0))
            put(["ts", "sp_convs", j, "bias"], _t(sd[f"{p}.bias"]))

    # ---- SS (planar slots 1,3,5,7 after remap; sphere slots if present) -
    if g.ss is not None:
        for i in range(g.ss.n_layers):
            sp = f"structure_synthesizer.implicit_model.conv_stack.{2 * i}"
            pp = f"structure_synthesizer.implicit_model.conv_stack.{2 * i + 1}"
            try_modconv(["ss", "blocks", i, "sphere", "conv"],
                        f"{sp}.conv.conv")
            if f"{sp}.sc.weight" in sd:
                put(["ss", "blocks", i, "sc", "weight"],
                    _t(sd[f"{sp}.sc.weight"]).transpose(2, 3, 1, 0))
                put(["ss", "blocks", i, "sc", "bias"],
                    _t(sd[f"{sp}.sc.bias"]))
            try_modconv(["ss", "blocks", i, "planar", "conv"],
                        f"{pp}.conv.conv")
            if f"{pp}.conv.activate.bias" in sd:
                put(["ss", "blocks", i, "planar", "act_bias"],
                    _t(sd[f"{pp}.conv.activate.bias"]))

    return params, mask
