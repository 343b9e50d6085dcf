"""Generate an end-to-end forward-parity fixture from the reference model.

Runs the ACTUAL reference InfinityGanGenerator (PyTorch, CPU) with stubbed
CUDA ops (the repo's own CPU-fallback math) on a reduced-width config, and
stores {config, state_dict, inputs, outputs} so tests can verify the JAX
reimplementation end-to-end without importing reference code.

Stubs injected before import:
  - models.custom_ops: pure-torch fused_leaky_relu / upfirdn2d (same math as
    the CUDA kernels; mirrors the repo's CPU fallbacks)
  - lmdb / torchvision / pkg_resources / easydict: import-time shims
  - torch.Tensor.cuda -> identity (coord_handler constructs on CUDA)
"""
import sys
import types

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
torch.manual_seed(0)


# ---------------------------------------------------------------------
# import shims
# ---------------------------------------------------------------------

class EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


for name, attrs in [
    ("easydict", {"EasyDict": EasyDict}),
    ("pkg_resources", {"parse_version": lambda v: v}),
    ("lmdb", {}),
]:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)

tv = types.ModuleType("torchvision")
tv_t = types.ModuleType("torchvision.transforms")
for cls in ("Compose", "RandomCrop", "CenterCrop", "RandomHorizontalFlip",
            "ToTensor", "Normalize"):
    setattr(tv_t, cls, type(cls, (), {}))
tv.transforms = tv_t
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.transforms", tv_t)


def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
    shape = [1, -1] + [1] * (input.ndim - 2)
    return F.leaky_relu(input + bias.view(*shape), negative_slope) * scale


class FusedLeakyReLU(nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, input):
        return fused_leaky_relu(input, self.bias, self.negative_slope,
                                self.scale)


def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
    """Zero-insert upsample, pad, FIR (convolution), stride-down — the CUDA
    kernel's semantics in pure torch."""
    b, c, h, w = input.shape
    x = input.reshape(b * c, 1, h, w)
    if up > 1:
        x2 = torch.zeros(b * c, 1, h * up, w * up, dtype=x.dtype)
        x2[:, :, ::up, ::up] = x
        x = x2
    p0, p1 = pad
    x = F.pad(x, (p0, p1, p0, p1))
    k = torch.flip(kernel, (0, 1)).reshape(1, 1, *kernel.shape)
    x = F.conv2d(x, k, stride=down)
    return x.reshape(b, c, x.shape[-2], x.shape[-1])


cu = types.ModuleType("models.custom_ops")
cu.FusedLeakyReLU = FusedLeakyReLU
cu.fused_leaky_relu = fused_leaky_relu
cu.upfirdn2d = upfirdn2d
sys.modules["models.custom_ops"] = cu


def make_config(full_size=False, ss_mapping=False):
    global_dim, local_dim, n_mlp = (512, 256, 8) if full_size else (32, 16, 2)
    return EasyDict(
        train_params=EasyDict(
            styleGAN2_baseline=False,
            data_size=[768, 256], extra_pre_resize=256,
            full_size=197, patch_size=101, training_modality="patch",
            batch_size=2, iter=10, partial=0.6667,
            r1=10, path_regularize=2, path_batch_shrink=2,
            d_reg_every=16, g_reg_every=4, mixing=0.9, lr=0.002,
            g_path_start=0,
            g_arch="models.spgan.spgan.InfinityGanGenerator",
            d_arch="models.stylegan2discriminator.StyleGan2Discriminator",
            global_latent_dim=global_dim, local_latent_dim=local_dim,
            n_mlp=n_mlp,
            channel_multiplier=2,
            use_ss=True, ss_n_layers=4, ss_unfold_radius=3,
            ss_coord_all_layers="each_layer", ss_disable_noise=True,
            ss_mapping=ss_mapping,
            ts_input_size=11, ts_no_zero_pad=True,
            diversity_z_w=1, diversity_angular=True, diversity_dual=True,
            coord_continuous=True, coord_vert_sample_size=10,
            coord_hori_occupy_ratio=0.25, coord_vert_cut_pt=3,
            coord_num_dir=3, coord_use_ac=True, coord_ac_w=1,
            coord_use_pd=False, coord_pd_w=0, coord_ac_vert_only=True,
            no_ext=True,
        ),
        var=EasyDict(dataparallel=False),
    )


def main():
    import argparse
    import random

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/spgan_reference_forward.npz")
    ap.add_argument("--full", action="store_true",
                    help="shipped dims (512/256/n_mlp 8) instead of the "
                         "reduced test dims (32/16/2)")
    ap.add_argument("--ss-mapping", action="store_true",
                    help="enable the ss_mapping global-mapping MLP "
                         "(reference spgan.py:184-197)")
    args_cli = ap.parse_args()

    random.seed(0)
    np.random.seed(0)
    torch.manual_seed(0)

    config = make_config(full_size=args_cli.full,
                         ss_mapping=args_cli.ss_mapping)
    GLOBAL_DIM = config.train_params.global_latent_dim
    LOCAL_DIM = config.train_params.local_latent_dim
    from models.spgan import spgan as spgan_mod

    g = spgan_mod.InfinityGanGenerator(config)
    g.eval()

    # ---- deterministic inputs (test path: override coords + cp) ------
    # B=1: for B>1 the reference's deal_coords grouped conv concatenates
    # (1, B*256) latents with (1, B*3) coords and runs groups=B, so group
    # boundaries cross sample boundaries — each sample's 'coord' input slots
    # actually receive the next sample's latent channels (spgan_ops_gs.py:
    # 791-814). spgan_tpu implements the intended per-sample semantics,
    # which coincide with the reference exactly at batch 1.
    B = 1
    torch.manual_seed(1)
    global_latent = torch.randn(B, 2, GLOBAL_DIM)
    global_latent[:, 1] = global_latent[:, 0]
    local_latent = torch.randn(B, LOCAL_DIM, 35, 35)
    noises = [torch.randn(B, 1, s, s) for s in
              (19, 17, 31, 29, 55, 53, 103, 101)]

    ch = g.structure_synthesizer.coord_handler
    coords = ch._creat_coord_grid(height=35, width=35, coord_init=(3, 17))
    coords = coords.unsqueeze(0).repeat(B, 1, 1, 1)
    coords = ch.convert_idx_to_input_coords(coords.clone())

    coords_partial = {
        "p_x_st": 3 / 45, "p_x_ed": (3 + 36) / 45,
        "p_y_st": 17 / 140, "p_y_ed": (17 + 36) / 140,
        "circular_flag": False, "x_total": 45, "y_total": 140,
        "test_flag": True, "partial": 0.6667,
        "y_st": 17, "y_ed": 52,
    }

    # per-block SS intermediates for bisection
    inter = {}
    with torch.no_grad():
        im = g.structure_synthesizer.implicit_model
        h = local_latent
        cond = global_latent[:, 0]
        if im.global_mapping is not None:  # ss_mapping (spgan.py:231-232)
            cond = im.global_mapping(cond)
        cs = coords.clone()
        cur_cp = coords_partial
        for i, conv in enumerate(im.conv_stack):
            cs_c, _ = im._select_center(src=cs, coords_partial=cur_cp, ref=h)
            h, _ = conv(h, cond, cs_c.clone(), cur_cp)
            inter[f"ss_block_{i}"] = h.numpy().copy()
        # the layer-0 sphere grid actually used
        sconv = im.conv_stack[0].conv.conv
        inter["grid0"] = sconv.grid.numpy().copy()

    with torch.no_grad():
        out = g(
            global_latent=global_latent,
            local_latent=local_latent,
            override_coords=coords,
            coords_partial_override=coords_partial,
            noises=noises,
            disable_dual_latents=True,
        )

    # ---- discriminator fixture ---------------------------------------
    from models.stylegan2discriminator import StyleGan2Discriminator

    dnet = StyleGan2Discriminator(config)
    dnet.eval()
    torch.manual_seed(2)
    d_in = torch.randn(4, 3, 101, 101)
    with torch.no_grad():
        d_out = dnet(d_in)

    payload = {
        "d_in": d_in.numpy(),
        "d_patch": d_out["d_patch"].numpy(),
        "d_ac_pred": d_out["ac_coords_pred"].numpy(),
        "gen": out["gen"].numpy(),
        "structure_latent": out["structure_latent"].numpy(),
        "global_latent": global_latent.numpy(),
        "local_latent": local_latent.numpy(),
        "coords": coords.numpy(),
        "cp": np.array([3 / 45, (3 + 36) / 45, 17 / 140, (17 + 36) / 140,
                        0.0, 45, 140, 1.0, 0.6667]),
        "noise_sizes": np.array([19, 17, 31, 29, 55, 53, 103, 101]),
        # [global_dim, local_dim, n_mlp, ss_mapping] for the loader test
        "meta": np.array([GLOBAL_DIM, LOCAL_DIM,
                          config.train_params.n_mlp,
                          int(config.train_params.ss_mapping)]),
    }
    for i, n in enumerate(noises):
        payload[f"noise_{i}"] = n.numpy()
    payload.update(inter)
    sd = {k: v.numpy() for k, v in g.state_dict().items()}
    for k, v in sd.items():
        payload["sd__" + k] = v
    for k, v in dnet.state_dict().items():
        payload["dsd__" + k] = v.numpy()
    np.savez_compressed(args_cli.out, **payload)
    total = sum(v.size for v in sd.values())
    print(f"saved fixture: gen {out['gen'].shape}, {len(sd)} tensors, "
          f"{total/1e6:.1f}M params")


if __name__ == "__main__":
    main()
