"""Training-step numeric oracle: fixture from the ACTUAL reference trainer.

Runs the reference's own loss/optimizer code (models/losses.py:25-95,
train.py:222-415,835-879) on CPU with fixed inputs at reduced dims and
records loss VALUES and post-Adam-step parameter DELTAS, so a test can
assert the JAX training step reproduces the training-side numbers — the
last uncovered correctness surface after forward/pano parity.

Three phases (the split dodges the reference's grouped-conv batch
misrouting at B>1, models/spgan_ops_gs.py:748-817, which makes exact B>1
generator parity impossible by design — spgan_tpu implements the intended
per-sample semantics, see tools/gen_golden_forward.py):

A. D-step at B=4 (no generator): d_logistic + both coord-AC terms
   (losses.py:25-28,81-95 under train.py:242-267), Adam step 1 with the
   d-reg-ratio betas (train.py:869-877); R1 penalty and the R1 Adam step
   (train.py:288-313, losses.py:36-41); then a SECOND full D step.  The
   second step is a per-parameter-state drift probe: the AC head gets NO
   grad in the R1 phase, so torch Adam (per-param step counts, None-grad
   params skipped) and a shared-count optimizer diverge in the step-3 bias
   correction if the reimplementation is not faithful.
B. G-step at B=1 (full SS+TS generator, diversity_z_w=0): training-mode
   coords/ac/cp captured from the reference coord handler
   (coord_handler.py:965-1046) and replayed via override_coords (override
   returns ac=None, :1040-1046, hence the capture), NS + coord-AC G loss
   (train.py:332-344), Adam step with g-reg-ratio betas; then the PPL
   phase: path lengths w.r.t. the mixed styles (losses.py:60-78 with an
   injected noise image for determinism), g_path_regularize with a nonzero
   running mean, and the PPL Adam step (train.py:384-401).  Style mixing
   uses an explicit inject_index (spgan.py:864-877).  Finally one EMA
   accumulate (utils.py:86-94, train.py:415).
C. Pure-function payloads at B=4/5: setup_paired_inputs (spgan.py:50-63)
   on even and odd batches, and diversity_z_loss values (angular + L1,
   spgan.py:285-315) on fixed tensors — the dual-pairing/diversity math
   that phase B cannot exercise end-to-end at B=1.

Param snapshots are stored as POST-STEP MINUS INITIAL deltas (f32): the
comparison then isolates the update (~lr magnitude) instead of hiding it
under the parameter magnitude.

  python tools/gen_golden_trainstep.py [/tmp/spgan_reference_trainstep.npz]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing the forward-fixture tool installs the reference-import shims
# (CPU fused ops, lmdb/torchvision stubs) and puts /root/reference on path
import gen_golden_forward as refshim  # noqa: E402

import torch  # noqa: E402
from torch import autograd, optim  # noqa: E402


def sd_numpy(module):
    return {k: v.detach().numpy().copy() for k, v in
            module.state_dict().items()}


def grads_numpy(module):
    """name -> grad for params with grads; None-grad params are OMITTED
    (that absence IS the torch semantics being recorded)."""
    return {k: p.grad.detach().numpy().copy()
            for k, p in module.named_parameters() if p.grad is not None}


def sd_delta(module, base):
    # f16 keeps the fixture small; deltas are ~lr magnitude, so the f16
    # quantization (~1e-3 relative) is far below the comparison tolerance
    cur = sd_numpy(module)
    return {k: (cur[k] - base[k]).astype(np.float16) for k in cur}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default="/tmp/spgan_reference_trainstep.npz")
    args = ap.parse_args()

    torch.manual_seed(0)
    np.random.seed(0)
    import random

    random.seed(0)

    config = refshim.make_config()
    tp = config.train_params
    tp.diversity_z_w = 0  # phase B runs at B=1 where the paired diversity
    # slices are empty (spgan.py:299-309) — covered by phase C instead
    tp.d_extra_multiplier = 0.25  # shrink D (stylegan2discriminator.py:
    # 117-121) so the fixture stays loadable; also exercises the knob

    sys.path.insert(0, "/root/reference")
    from models.spgan import spgan as spgan_mod
    from models.stylegan2discriminator import StyleGan2Discriminator
    from models.losses import (calc_path_lengths, coord_ac_loss,  # noqa
                               d_logistic_loss, d_r1_loss,
                               g_nonsaturating_loss, g_path_regularize,
                               grad_reduce)

    def accumulate(model1, model2, decay):
        # reference utils.py:86-94 verbatim semantics (named_parameters
        # only; the import itself would drag torchvision.utils in)
        par1 = dict(model1.named_parameters())
        par2 = dict(model2.named_parameters())
        for k in par1.keys():
            par1[k].data.mul_(decay).add_(par2[k].data, alpha=1 - decay)

    g = spgan_mod.InfinityGanGenerator(config)
    d = StyleGan2Discriminator(config)
    g.train()
    d.train()

    g0 = sd_numpy(g)
    d0 = sd_numpy(d)

    g_ratio = tp.g_reg_every / (tp.g_reg_every + 1)
    d_ratio = tp.d_reg_every / (tp.d_reg_every + 1)
    g_optim = optim.Adam(g.parameters(), lr=tp.lr * g_ratio,
                         betas=(0 ** g_ratio, 0.99 ** g_ratio))
    d_optim = optim.Adam(d.parameters(), lr=tp.lr * d_ratio,
                         betas=(0 ** d_ratio, 0.99 ** d_ratio))

    payload = {}
    vals = {}

    # ------------------------------------------------------------------
    # Phase A: D step 1 -> R1 step -> D step 2 (B=4)
    # ------------------------------------------------------------------
    B = 4
    torch.manual_seed(10)
    real_patch = torch.rand(B, 3, tp.patch_size, tp.patch_size) * 2 - 1
    fake_img = torch.rand(B, 3, tp.patch_size, tp.patch_size) * 2 - 1
    real_ac = torch.rand(B, 3) * 2 - 1
    fake_ac = torch.rand(B, 3) * 2 - 1
    payload.update(real_patch=real_patch.numpy(), fake_img=fake_img.numpy(),
                   real_ac=real_ac.numpy(), fake_ac=fake_ac.numpy())

    def d_total(tag):
        real_pred = d(real_patch)
        fake_pred = d(fake_img)
        adv = d_logistic_loss(real_pred["d_patch"], fake_pred["d_patch"])
        ac_r = coord_ac_loss(real_pred["ac_coords_pred"], real_ac, "real",
                             config)
        ac_f = coord_ac_loss(fake_pred["ac_coords_pred"], fake_ac, "fake",
                             config)
        loss = adv + (ac_r + ac_f) * tp.coord_ac_w
        vals[f"d_adv{tag}"] = adv.item()
        vals[f"d_ac_real{tag}"] = ac_r.item()
        vals[f"d_ac_fake{tag}"] = ac_f.item()
        vals[f"d_total{tag}"] = loss.item()
        return loss

    d.zero_grad()
    d_total("1").backward()
    for k, v in grads_numpy(d).items():
        payload["dgrad1__" + k] = v
    d_optim.step()
    for k, v in sd_delta(d, d0).items():
        payload["ddelta1__" + k] = v

    # R1 (train.py:288-313)
    real_r1 = real_patch.clone().requires_grad_(True)
    real_pred = d(real_r1)
    r1_loss = d_r1_loss(real_pred["d_patch"], real_r1)
    vals["r1"] = r1_loss.item()
    d.zero_grad()
    (tp.r1 / 2 * r1_loss * tp.d_reg_every
     + 0 * real_pred["d_patch"][0]).backward()
    for k, v in grads_numpy(d).items():
        payload["dgradr1__" + k] = v
    d_optim.step()
    for k, v in sd_delta(d, d0).items():
        payload["ddeltar1__" + k] = v

    # D step 2 (same fixed batch, updated params)
    d.zero_grad()
    d_total("2").backward()
    for k, v in grads_numpy(d).items():
        payload["dgrad2__" + k] = v
    d_optim.step()
    for k, v in sd_delta(d, d0).items():
        payload["ddelta2__" + k] = v

    # ------------------------------------------------------------------
    # Phase B: G step (B=1) -> PPL step -> EMA, against the INITIAL D
    # ------------------------------------------------------------------
    d.load_state_dict({k: torch.from_numpy(v) for k, v in d0.items()})
    GLOBAL, LOCAL = tp.global_latent_dim, tp.local_latent_dim
    noise_sizes = (19, 17, 31, 29, 55, 53, 103, 101)
    ch = g.structure_synthesizer.coord_handler
    inject = 3

    def sample_g_inputs(seed):
        torch.manual_seed(seed)
        gl = torch.randn(1, 2, GLOBAL)
        ll = torch.randn(1, LOCAL, 35, 35)
        noises = [torch.randn(1, 1, s, s) for s in noise_sizes]
        res = ch.sample_coord_grid_global(ll, is_training=True,
                                          return_ac_coords=True)
        return gl, ll, noises, res

    def cp_arrays(cp_list):
        keys = ("p_x_st", "p_x_ed", "p_y_st", "p_y_ed", "circular_flag",
                "y_st", "y_ed")
        return np.stack([[float(c[k]) for k in keys] for c in cp_list])

    gl, ll, noises, res = sample_g_inputs(20)
    coords, g_ac, cp_list = res["coords"], res["ac_coords"], \
        res["coords_partial"]
    payload.update(g_gl=gl.numpy(), g_ll=ll.numpy(),
                   g_coords=coords.numpy(), g_ac=g_ac.numpy(),
                   g_cp=cp_arrays(cp_list),
                   g_cp_total=np.array([float(cp_list[0]["x_total"]),
                                        float(cp_list[0]["y_total"])]))
    for i, n in enumerate(noises):
        payload[f"g_noise_{i}"] = n.numpy()

    out = g(global_latent=gl, local_latent=ll, override_coords=coords,
            coords_partial_override=cp_list, noises=noises,
            inject_index=inject)
    fake_pred = d(out["gen"])
    g_adv = g_nonsaturating_loss(fake_pred["d_patch"])
    g_ac_f = coord_ac_loss(fake_pred["ac_coords_pred"], g_ac, "fake", config)
    g_loss = g_adv + g_ac_f * tp.coord_ac_w
    vals["g_adv"] = g_adv.item()
    vals["g_ac_fake"] = g_ac_f.item()
    vals["g_total"] = g_loss.item()
    g.zero_grad()
    g_loss.backward()
    for k, v in grads_numpy(g).items():
        payload["ggrad1__" + k] = v
    g_optim.step()
    for k, v in sd_delta(g, g0).items():
        payload["gdelta1__" + k] = v

    # PPL (train.py:384-401; losses.py:60-78 with injected noise for
    # determinism — calc_path_lengths draws torch-global randn internally)
    gl2, ll2, noises2, res2 = sample_g_inputs(21)
    coords2, cp_list2 = res2["coords"], res2["coords_partial"]
    payload.update(p_gl=gl2.numpy(), p_ll=ll2.numpy(),
                   p_coords=coords2.numpy(), p_cp=cp_arrays(cp_list2))
    for i, n in enumerate(noises2):
        payload[f"p_noise_{i}"] = n.numpy()

    out2 = g(global_latent=gl2, local_latent=ll2, override_coords=coords2,
             coords_partial_override=cp_list2, noises=noises2,
             inject_index=inject, return_latents=True)
    img, styles = out2["gen"], out2["latents"]
    torch.manual_seed(22)
    noise_img = torch.randn_like(img) / np.sqrt(img.shape[2] * img.shape[3])
    payload["p_noise_img"] = noise_img.numpy()
    grads = autograd.grad(outputs=(img * noise_img).sum(), inputs=[styles],
                          create_graph=True)
    path_lengths = [grad_reduce(gr) for gr in grads]
    mean_init = 0.5
    path_loss, new_means = g_path_regularize(
        path_lengths, [torch.tensor(mean_init)])
    vals["path_length"] = path_lengths[0].mean().item()
    vals["path_loss"] = path_loss.item()
    vals["path_new_mean"] = new_means[0].item()
    vals["path_mean_init"] = mean_init
    g.zero_grad()
    (tp.path_regularize * tp.g_reg_every * path_loss).backward()
    for k, v in grads_numpy(g).items():
        payload["ggradppl__" + k] = v
    g_optim.step()
    for k, v in sd_delta(g, g0).items():
        payload["gdelta2__" + k] = v

    # EMA accumulate (train.py:415, utils.py:86-94) applied to a copy of the
    # INITIAL params; named_parameters only — buffers are left untouched.
    # ema - g0 == (1-accum) * (g_final - g0) exactly, so the snapshot is
    # derivable from gdelta2; verify that identity here instead of storing
    # another full G-sized delta, and let the test assert the formula.
    g_ema = spgan_mod.InfinityGanGenerator(config)
    g_ema.load_state_dict({k: torch.from_numpy(v) for k, v in g0.items()})
    accum = 0.5 ** (32 / (10 * 1000))
    accumulate(g_ema, g, accum)
    esd = sd_numpy(g_ema)
    gsd = sd_numpy(g)
    for k in g0:
        if "noise" in k:  # buffers: named_parameters skips them
            continue
        want = g0[k] * accum + gsd[k] * (1 - accum)
        np.testing.assert_allclose(esd[k], want, rtol=1e-5, atol=1e-7)
    vals["ema_accum"] = accum

    # ------------------------------------------------------------------
    # Phase C: pairing + diversity pure functions
    # ------------------------------------------------------------------
    torch.manual_seed(30)
    pair_even = torch.randn(4, 2, GLOBAL)
    pair_odd = torch.randn(5, 3)
    payload["pair_even_in"] = pair_even.numpy()
    payload["pair_even_out"] = spgan_mod.setup_paired_inputs(
        pair_even).numpy()
    payload["pair_odd_in"] = pair_odd.numpy()
    payload["pair_odd_out"] = spgan_mod.setup_paired_inputs(pair_odd).numpy()

    div_gl = torch.randn(4, GLOBAL)
    div_ll = torch.randn(4, LOCAL, 9, 9)
    div_feat = torch.randn(4, 32, 5, 5)
    payload.update(div_gl=div_gl.numpy(), div_ll=div_ll.numpy(),
                   div_feat=div_feat.numpy())
    ss = g.structure_synthesizer
    assert ss.use_angular_div
    vals["div_angular"] = ss.diversity_z_loss(div_gl, div_ll,
                                              div_feat).item()
    ss.use_angular_div = False
    vals["div_l1"] = ss.diversity_z_loss(div_gl, div_ll, div_feat).item()
    ss.use_angular_div = True

    # ------------------------------------------------------------------
    for k, v in g0.items():
        payload["sd__" + k] = v
    for k, v in d0.items():
        payload["dsd__" + k] = v
    payload["vals_keys"] = np.array(sorted(vals.keys()))
    payload["vals"] = np.array([vals[k] for k in sorted(vals.keys())],
                               np.float64)
    payload["meta"] = np.array([GLOBAL, LOCAL, tp.n_mlp, inject])
    np.savez_compressed(args.out, **payload)
    print(f"saved trainstep fixture: {len(payload)} arrays -> {args.out}")
    for k in sorted(vals):
        print(f"  {k} = {vals[k]:.6f}")


if __name__ == "__main__":
    main()
