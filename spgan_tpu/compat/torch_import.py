"""One-way importer: reference PyTorch checkpoints -> spgan_tpu param pytrees.

Maps the reference g_ema state_dict layout (models/spgan/spgan.py module
tree) onto the NHWC param pytree:

  torch conv weight (out,in,kh,kw)          -> HWIO (kh,kw,in,out)
  torch modulated conv weight (1,out,in,k,k)-> (k,k,in,out)
  torch linear weight (out,in)              -> (in,out)

Name map (g_ema.*):
  texture_synthesizer.mapping.{1..n}.{weight,bias}       -> ts.mapping[i]
  texture_synthesizer.convs.{i}.conv.weight              -> ts.convs[i].conv.weight
  texture_synthesizer.convs.{i}.conv.modulation.*        -> ts.convs[i].conv.modulation
  texture_synthesizer.convs.{i}.noise.weight             -> ts.convs[i].noise.weight
  texture_synthesizer.convs.{i}.activate.bias            -> ts.convs[i].act_bias
  texture_synthesizer.to_rgbs.{j}.conv.{weight,modulation.*}, .bias
  texture_synthesizer.sp_convs.{j}.{weight,bias}         -> ts.sp_convs[j]
  structure_synthesizer.implicit_model.conv_stack.{2i}.  (sphere block)
      conv.conv.weight / conv.conv.modulation.* / sc.{weight,bias}
  structure_synthesizer.implicit_model.conv_stack.{2i+1}. (planar block)
      conv.conv.weight / conv.conv.modulation.* / conv.activate.bias

The transfer-learning SS index remap of the reference (utils.py:311-394,
old baselines stored the planar stack at indices (0,1,2,3) before the sphere
blocks were interleaved) applies to InfinityGAN *baseline* checkpoints only
and lives in compat/baseline.py (import_torch_baseline_generator); SP-GAN
checkpoints use the interleaved layout handled here directly.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def _conv_w(x) -> np.ndarray:
    w = _t(x)
    if w.ndim == 5:  # (1,out,in,k,k) modulated
        w = w[0]
    return w.transpose(2, 3, 1, 0)  # (k,k,in,out)


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"weight": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def import_torch_generator(state_dict: Dict, g) -> dict:
    """state_dict: the torch g_ema state dict; g: Generator spec.
    Returns a params pytree matching g.init()'s structure."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    params: dict = {"ts": {"mapping": [], "convs": [], "to_rgbs": [],
                           "sp_convs": []}}

    # ---- TS mapping (layer 0 is PixelNorm, parameterless) -------------
    for i in range(g.ts.n_mlp):
        params["ts"]["mapping"].append(
            _linear(sd, f"texture_synthesizer.mapping.{i + 1}"))

    # ---- TS convs ------------------------------------------------------
    n_convs = g.ts.num_layers
    for i in range(n_convs):
        p = f"texture_synthesizer.convs.{i}"
        entry = {
            "conv": {
                "weight": _conv_w(sd[f"{p}.conv.weight"]),
                "modulation": _linear(sd, f"{p}.conv.modulation"),
            },
            "act_bias": _t(sd[f"{p}.activate.bias"]),
        }
        if f"{p}.noise.weight" in sd:
            entry["noise"] = {"weight": _t(sd[f"{p}.noise.weight"]).reshape(())}
        params["ts"]["convs"].append(entry)

    # ---- TS to_rgbs ----------------------------------------------------
    _, to_rgbs, i2j = g.ts.plan()
    for j in range(len(to_rgbs)):
        p = f"texture_synthesizer.to_rgbs.{j}"
        params["ts"]["to_rgbs"].append({
            "conv": {
                "weight": _conv_w(sd[f"{p}.conv.weight"]),
                "modulation": _linear(sd, f"{p}.conv.modulation"),
            },
            "bias": _t(sd[f"{p}.bias"]).reshape(1, 1, 1, 3),
        })

    # ---- TS sphere skip convs -----------------------------------------
    for j in range(len(i2j)):
        p = f"texture_synthesizer.sp_convs.{j}"
        params["ts"]["sp_convs"].append({
            "weight": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{p}.bias"]),
        })

    # ---- SS ------------------------------------------------------------
    if g.ss is not None:
        blocks = []
        for i in range(g.ss.n_layers):
            sphere_idx, planar_idx = 2 * i, 2 * i + 1
            sp = f"structure_synthesizer.implicit_model.conv_stack.{sphere_idx}"
            pp = f"structure_synthesizer.implicit_model.conv_stack.{planar_idx}"
            blocks.append({
                "sphere": {"conv": {
                    "weight": _conv_w(sd[f"{sp}.conv.conv.weight"]),
                    "modulation": _linear(sd, f"{sp}.conv.conv.modulation"),
                }},
                "sc": {
                    "weight": _t(sd[f"{sp}.sc.weight"]).transpose(2, 3, 1, 0),
                    "bias": _t(sd[f"{sp}.sc.bias"]),
                },
                "planar": {
                    "conv": {
                        "weight": _conv_w(sd[f"{pp}.conv.conv.weight"]),
                        "modulation": _linear(sd, f"{pp}.conv.conv.modulation"),
                    },
                    "act_bias": _t(sd[f"{pp}.conv.activate.bias"]),
                },
            })
            if f"{pp}.conv.noise.weight" in sd:  # ss_disable_noise=False
                blocks[-1]["planar"]["noise"] = {
                    "weight": _t(sd[f"{pp}.conv.noise.weight"]).reshape(())}
        params["ss"] = {"blocks": blocks}
        if g.ss.use_mapping:
            # ss_mapping global-mapping MLP (reference spgan.py:184-197;
            # Sequential idx 0 is a parameterless PixelNorm)
            params["ss"]["mapping"] = [
                _linear(sd, "structure_synthesizer.implicit_model."
                            f"global_mapping.{i + 1}")
                for i in range(g.ss.mapping_n_mlp)]

    import jax.numpy as jnp

    return __import__("jax").tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)


def import_torch_discriminator(state_dict: Dict, d) -> dict:
    """Reference StyleGan2Discriminator state dict -> spgan_tpu D params.

    Name map (reference models/stylegan2discriminator.py):
      convs.0.{0.weight, 1.bias}          stem EqualConv2d + FusedLeakyReLU
      convs.{i}.conv{1,2}.*, .skip.*      ResBlocks (conv2/skip contain the
                                          blur at idx 0, conv at idx 1)
      final_conv.{0.weight, 1.bias}
      final_linear.{0,1}.{weight,bias}
      coord_linear.{0,1}.{weight,bias}
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}

    def conv_w(key):
        return _t(sd[key]).transpose(2, 3, 1, 0)

    def conv_layer(prefix, downsample=False, activate=True, bias=True):
        # Sequential indices: [Blur,] EqualConv2d [, FusedLeakyReLU]
        ci = 1 if downsample else 0
        out = {"conv": {"weight": conv_w(f"{prefix}.{ci}.weight")}}
        if f"{prefix}.{ci}.bias" in sd:
            out["conv"]["bias"] = _t(sd[f"{prefix}.{ci}.bias"])
        if activate and f"{prefix}.{ci + 1}.bias" in sd:
            out["act_bias"] = _t(sd[f"{prefix}.{ci + 1}.bias"])
        return out

    stem, blocks, final_conv, flat = d.plan()
    params: dict = {"stem": conv_layer("convs.0")}
    params["blocks"] = []
    for i in range(len(blocks)):
        p = f"convs.{i + 1}"
        params["blocks"].append({
            "conv1": conv_layer(f"{p}.conv1"),
            "conv2": conv_layer(f"{p}.conv2", downsample=True),
            "skip": conv_layer(f"{p}.skip", downsample=True, activate=False),
        })
    params["final_conv"] = conv_layer("final_conv")
    params["final_linear"] = [_linear(sd, f"final_linear.{i}")
                              for i in range(2)]
    if d.use_coord_ac and "coord_linear.0.weight" in sd:
        params["coord_linear"] = [_linear(sd, f"coord_linear.{i}")
                                  for i in range(2)]
    import jax.numpy as jnp

    return __import__("jax").tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)


def export_torch_style_state_dict(params: dict, g) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests and torch interop)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["weight"]).T
        if "bias" in p:
            sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_modconv(prefix, p):
        w = np.asarray(p["weight"]).transpose(3, 2, 0, 1)[None]
        sd[prefix + ".weight"] = w
        put_linear(prefix + ".modulation", p["modulation"])

    for i, p in enumerate(params["ts"]["mapping"]):
        put_linear(f"texture_synthesizer.mapping.{i + 1}", p)
    for i, p in enumerate(params["ts"]["convs"]):
        pre = f"texture_synthesizer.convs.{i}"
        put_modconv(pre + ".conv", p["conv"])
        sd[pre + ".activate.bias"] = np.asarray(p["act_bias"])
        if "noise" in p:
            sd[pre + ".noise.weight"] = np.asarray(
                p["noise"]["weight"]).reshape(1)
    for j, p in enumerate(params["ts"]["to_rgbs"]):
        pre = f"texture_synthesizer.to_rgbs.{j}"
        put_modconv(pre + ".conv", p["conv"])
        sd[pre + ".bias"] = np.asarray(p["bias"]).reshape(1, 3, 1, 1)
    for j, p in enumerate(params["ts"]["sp_convs"]):
        pre = f"texture_synthesizer.sp_convs.{j}"
        sd[pre + ".weight"] = np.asarray(p["weight"]).transpose(3, 2, 0, 1)
        sd[pre + ".bias"] = np.asarray(p["bias"])
    if "ss" in params:
        for i, blk in enumerate(params["ss"]["blocks"]):
            sp = f"structure_synthesizer.implicit_model.conv_stack.{2 * i}"
            pp = f"structure_synthesizer.implicit_model.conv_stack.{2 * i + 1}"
            put_modconv(sp + ".conv.conv", blk["sphere"]["conv"])
            sd[sp + ".sc.weight"] = np.asarray(
                blk["sc"]["weight"]).transpose(3, 2, 0, 1)
            sd[sp + ".sc.bias"] = np.asarray(blk["sc"]["bias"])
            put_modconv(pp + ".conv.conv", blk["planar"]["conv"])
            sd[pp + ".conv.activate.bias"] = np.asarray(
                blk["planar"]["act_bias"])
            if "noise" in blk["planar"]:
                sd[pp + ".conv.noise.weight"] = np.asarray(
                    blk["planar"]["noise"]["weight"]).reshape(1)
        for i, p in enumerate(params["ss"].get("mapping", [])):
            put_linear("structure_synthesizer.implicit_model."
                       f"global_mapping.{i + 1}", p)
    return sd
