"""Measure the reference (PyTorch, CPU) baseline for the canonical eval task.

Runs the ACTUAL reference code at /root/reference — its generator, its
close-loop test manager, its timing protocol (test.py:84-121,
base_test_manager.py:238-273) — with `--random-init` semantics, on CPU torch.
This produces the measured denominator for bench.py's `vs_baseline`
(VERDICT.md round 1, Missing #2).

The reference cannot import on a CPU-only box as shipped:
  * models/custom_ops/{fused_act,upfirdn2d}.py call
    torch.cuda.get_device_name() and torch.utils.cpp_extension.load(CUDA
    sources) at import time (fused_act.py:12-22, upfirdn2d.py:11-21), and
    would mkdir a build cache inside the read-only mount;
  * coord_handler.py:510 calls .cuda() at construction.
So we stub `models.custom_ops` with the reference's own documented CPU
semantics (fused_act.py:90-101 fused_leaky_relu CPU branch;
upfirdn2d.py:151-205 upfirdn2d_native) re-implemented here in pure torch,
and no-op the torch.cuda surface. Everything else that runs is the
reference's code, unmodified.

Usage:
    python tools/bench_reference_cpu.py [--batch 1] [--iters 1] [--warmup 1]

Writes BASELINE_cpu.json at the repo root:
    {"sec_per_pano": ..., "panos_per_sec": ..., "batch": ..., "iters": ...,
     "exec_mean_sec_per_image": ..., "methodology": ...}
"""
import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _install_custom_ops_stub():
    """Register a CPU `models.custom_ops` before any reference import."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
        # reference fused_act.py:90-101 (CPU branch)
        rest_dim = [1] * (input.ndim - bias.ndim - 1)
        return F.leaky_relu(
            input + bias.view(1, bias.shape[0], *rest_dim),
            negative_slope=negative_slope) * scale

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
        # semantics of reference upfirdn2d_native (upfirdn2d.py:164-205):
        # zero-insert upsample, asymmetric pad, correlate with flipped FIR
        # kernel, stride-downsample.
        b, c, h, w = input.shape
        x = input.reshape(b * c, 1, h, w)
        if up > 1:
            z = x.new_zeros(b * c, 1, h, up, w, up)
            z[:, :, :, 0, :, 0] = x.reshape(b * c, 1, h, 1, w, 1)[:, :, :, 0, :, 0]
            x = z.reshape(b * c, 1, h * up, w * up)
        pad0, pad1 = pad
        x = F.pad(x, [max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
        if pad0 < 0 or pad1 < 0:
            x = x[:, :,
                  max(-pad0, 0): x.shape[2] - max(-pad1, 0),
                  max(-pad0, 0): x.shape[3] - max(-pad1, 0)]
        k = torch.flip(kernel, [0, 1]).reshape(1, 1, *kernel.shape)
        x = F.conv2d(x, k)
        if down > 1:
            x = x[:, :, ::down, ::down]
        return x.reshape(b, c, x.shape[2], x.shape[3])

    mod = types.ModuleType("models.custom_ops")
    mod.FusedLeakyReLU = FusedLeakyReLU
    mod.fused_leaky_relu = fused_leaky_relu
    mod.upfirdn2d = upfirdn2d
    sys.modules["models.custom_ops"] = mod


def _install_env_stubs():
    """easydict and lmdb are not installed; reference utils.py pulls both
    in transitively (utils -> dataset -> lmdb/easydict). Stub minimally."""

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            d = dict(d or {}, **kw)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            elif isinstance(v, (list, tuple)):
                v = type(v)(EasyDict(x) if isinstance(x, dict) else x
                            for x in v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

    ed = types.ModuleType("easydict")
    ed.EasyDict = EasyDict
    sys.modules["easydict"] = ed
    sys.modules["lmdb"] = types.ModuleType("lmdb")
    # torchvision not installed; reference utils.py:25 imports
    # torchvision.utils (only used for image-grid saving, not on this path)
    tv = types.ModuleType("torchvision")
    for sub in ("utils", "transforms", "models"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    sys.modules["torchvision"] = tv
    # setuptools>=81 removed pkg_resources; grid_sample_grad_fix.py:16 only
    # uses parse_version to pick a torch-version branch.
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            from packaging.version import parse as _parse_version
            pr = types.ModuleType("pkg_resources")
            pr.parse_version = _parse_version
            sys.modules["pkg_resources"] = pr


def _patch_cuda_surface():
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None
    torch.cuda.is_available = lambda: False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1,
                    help="panoramas per run_next (task batch_size)")
    ap.add_argument("--iters", type=int, default=1,
                    help="measured run_next calls")
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = leave default)")
    args = ap.parse_args()

    sys.path.insert(0, REF)
    _install_env_stubs()
    _install_custom_ops_stub()
    _patch_cuda_surface()

    import torch
    import yaml
    from easydict import EasyDict

    if args.threads:
        torch.set_num_threads(args.threads)

    with open(os.path.join(REF, "configs/model/spgan.yaml")) as f:
        config = EasyDict(yaml.load(f, Loader=yaml.FullLoader))
    config.var = EasyDict()
    config.var.exp_name = "spgan"
    with open(os.path.join(REF, "configs/test/spgan_384x768.yaml")) as f:
        config.task = EasyDict(yaml.load(f, Loader=yaml.FullLoader))
    config.task.batch_size = args.batch
    config.train_params.batch_size = args.batch
    config.var.dataparallel = False
    config.var.n_gpu = 1

    from utils import import_func, manually_seed  # reference utils.py

    manually_seed(config.task.seed)

    g_ema = import_func(config.train_params.g_arch)(config=config)
    g_ema.eval()
    device = "cpu"

    save_root = "/tmp/ref_bench_out"
    os.makedirs(save_root, exist_ok=True)
    manager = import_func(config.task.task_manager)(
        g_ema, device, save_root, config)
    manager.task_specific_init(seed=config.task.seed)

    with torch.no_grad():
        for _ in range(args.warmup):
            manager.run_next(save=False, write_gpu_time=False,
                             disable_pbar=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            manager.run_next(save=False, write_gpu_time=True,
                             disable_pbar=True)
        dt = time.perf_counter() - t0

    panos = args.iters * args.batch
    sec_per_pano = dt / panos
    exec_mean, exec_std = manager.get_exec_time_stats()

    result = {
        "sec_per_pano": round(sec_per_pano, 4),
        "panos_per_sec": round(1.0 / sec_per_pano, 6),
        "exec_mean_sec_per_image": round(float(exec_mean), 4),
        "exec_std_sec_per_image": round(float(exec_std), 4),
        "batch": args.batch,
        "iters": args.iters,
        "torch_threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
        "task": "close-loop 384x768 panorama, random-init weights, "
                "reference test manager (test.py --random-init "
                "--speed-benchmark equivalent, CPU)",
    }
    out = os.path.join(REPO, "BASELINE_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
