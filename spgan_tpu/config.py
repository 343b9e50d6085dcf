"""Typed configuration for spgan_tpu.

The reference drives everything off a YAML -> EasyDict with ~40 scattered
``hasattr`` probes (see reference train.py:248,338,346 and
models/spgan/spgan.py:184,264,269).  Here every flag is an explicit, typed
field with the shipped default (reference configs/model/spgan.yaml), and the
YAML surface stays compatible: ``load_config("configs/model/spgan.yaml")``
accepts the reference's file layout (train_params / data_params / log_params /
test_params sections, plus a test-config merged under ``task``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass
class TrainParams:
    # data geometry
    data_size: Tuple[int, int] = (768, 256)
    extra_pre_resize: Optional[int] = 256
    full_size: int = 197
    patch_size: int = 101
    training_modality: str = "patch"
    partial: float = 0.6667  # vertical fraction of the sphere kept by the pano

    # optimization
    batch_size: int = 16
    iter: int = 800000
    r1: float = 10.0
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    d_reg_every: int = 16
    g_reg_every: int = 4
    mixing: float = 0.9
    lr: float = 0.002
    g_path_start: int = 100000
    optimizer: str = "adam"          # "adam" | "sgd" (reference train.py:838-879)
    d_weight: float = 1.0           # D lr ratio (train.py:852-871)
    lr_sch: Optional[Tuple[int, ...]] = None  # MultiStepLR milestones, gamma 0.5
    freeze: bool = False            # freeze baseline-loaded G keys + all of D

    # architecture
    styleGAN2_baseline: bool = False
    g_arch: str = "spgan_tpu.models.generator.Generator"
    d_arch: str = "spgan_tpu.models.discriminator.Discriminator"
    global_latent_dim: int = 512
    local_latent_dim: int = 256
    n_mlp: int = 8
    channel_multiplier: int = 2
    # uniform D width scale: channels AND the 512-wide head linears are
    # round()-scaled (reference stylegan2discriminator.py:117-121)
    d_extra_multiplier: float = 1.0

    # structure synthesizer
    use_ss: bool = True
    ss_n_layers: int = 4
    ss_unfold_radius: int = 3
    ss_coord_all_layers: str = "each_layer"
    ss_disable_noise: bool = True
    ss_mapping: bool = False

    # texture synthesizer
    ts_input_size: int = 11
    ts_no_zero_pad: bool = True

    # diversity (mode-seeking) loss
    diversity_z_w: float = 1.0
    diversity_angular: bool = True
    diversity_dual: bool = True

    # coordinate system
    coord_continuous: bool = True
    coord_vert_sample_size: int = 10
    coord_hori_occupy_ratio: float = 0.25
    coord_vert_cut_pt: float = 3.0
    coord_num_dir: int = 3
    coord_use_ac: bool = True
    coord_ac_w: float = 1.0
    coord_use_pd: bool = False
    coord_pd_w: float = 0.0
    coord_ac_vert_only: bool = True
    coord_ac_hori_only: bool = False
    coord_ac_categorical: bool = False
    coord_pd_hori_only: bool = False
    no_ext: bool = True

    # numerics (TPU-native knobs; not in the reference)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # inner training steps per device call (amortizes dispatch/transfer
    # latency; 1 == reference-style one-step loop)
    steps_per_call: int = 1
    # Pallas tap-sampler for the SS sphere convs during training:
    # "auto" (on when running on TPU), "on", "off".  Gradient-exact vs the
    # XLA gather path (tests/test_pallas_sample.py).
    pallas_train_sampler: str = "auto"

    @property
    def ss_unfold_size(self) -> int:
        return self.ss_n_layers * self.ss_unfold_radius

    @property
    def ss_input_size(self) -> int:
        # reference coord_handler.py:493-495
        return self.ts_input_size + 2 * self.ss_unfold_size


@dataclass
class DataParams:
    dataset: str = "Matterport3d"
    num_train: int = 10000
    lmdb_root: str = "infinityGAN-lmdb"
    raw_data_root: str = "data/matterport3d_panorama"
    # TPU-native additions.  "spr" is the packed record format for the
    # native C++ loader (convert a reference LMDB with tools/convert_lmdb.py);
    # "lmdb" reads a reference-prepared LMDB dir in-process via the
    # pure-python parser (spgan_tpu/data/lmdb_read.py)
    source: str = "synthetic"  # "synthetic" | "folder" | "npy" | "lmdb" | "spr"
    folder: Optional[str] = None
    # source=="lmdb" only: key prefix before "-<index>" (e.g. "256"); required
    # when the LMDB stores multiple resolutions (prepare_data resize_multiple)
    lmdb_key_prefix: Optional[str] = None


@dataclass
class LogParams:
    n_save_sample: int = 64
    log_tick: int = 1000
    img_tick: int = 3000
    eval_tick: int = 15000
    save_tick: int = 3000
    fid_ext2_tick: int = 30000


@dataclass
class TestParams:
    calc_fid: bool = True
    calc_fid_ext2: bool = True
    n_fid_sample: int = 10000


@dataclass
class TaskConfig:
    """Inference-task config (the reference's test yaml merged under .task)."""

    task_manager: str = "spgan_tpu.infer.close_loop.CloseLoopPanoramaManager"
    interactive: bool = False
    seed: int = 9000
    height: int = 384
    width: int = 768
    batch_size: int = 16
    num_gen: int = 10000
    # accepted for reference-yaml compatibility; dead in the reference too
    # (appears only in its test configs, never read by any code)
    lowres_height: int = 128
    # reference parallel batching (base_test_manager.py:219-261); maps onto
    # the engine's patch_chunk (lattice positions folded into device batch)
    parallel_batch_size: Optional[int] = None
    init_index: Optional[int] = None
    # per-BATCH seeds: batch i uses PRNGKey(i) (reference test.py:77-83
    # computes seeds=range(num_gen) when task.seeds exists; quirk: its loop
    # assigns the per-iter seed but never uses it — we key the batch RNG by
    # the batch index, so batch i is reproducible independent of how many
    # batches ran before; individual samples within a batch are not
    # independently seeded)
    seeds: bool = False
    # TPU-native: how many lattice positions are folded into one device batch
    patch_chunk: int = 4
    # TPU-native engine selection:
    #   "folded"  — single-device, whole lattice in one compiled program
    #   "sharded" — lattice positions shard_map'ed over all devices
    #               (fields replicated, meta assembled on device)
    #   "halo"    — width-sharded fields + ppermute halo ring (close-loop
    #               only; for latent/noise fields larger than one HBM)
    engine: str = "folded"


@dataclass
class Config:
    train_params: TrainParams = field(default_factory=TrainParams)
    data_params: DataParams = field(default_factory=DataParams)
    log_params: LogParams = field(default_factory=LogParams)
    test_params: TestParams = field(default_factory=TestParams)
    task: TaskConfig = field(default_factory=TaskConfig)
    exp_name: str = "spgan"
    log_dir: str = "logs"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _apply_section(dc, data: Dict[str, Any]):
    """Overlay a dict onto a dataclass instance, coercing list->tuple."""
    valid = {f.name for f in dataclasses.fields(dc)}
    unknown = {}
    for k, v in data.items():
        if k in valid:
            cur = getattr(dc, k)
            if isinstance(cur, tuple) and isinstance(v, list):
                v = tuple(v)
            setattr(dc, k, v)
        else:
            unknown[k] = v
    return unknown


def load_config(model_yaml: Optional[str] = None,
                test_yaml: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a Config from reference-compatible YAML file(s)."""
    import yaml

    cfg = Config()
    unknown: Dict[str, Any] = {}
    if model_yaml is not None:
        with open(model_yaml) as f:
            raw = yaml.safe_load(f) or {}
        for section, dc in (
            ("train_params", cfg.train_params),
            ("data_params", cfg.data_params),
            ("log_params", cfg.log_params),
            ("test_params", cfg.test_params),
        ):
            if section in raw:
                u = _apply_section(dc, raw[section])
                if u:
                    unknown[section] = u
        import os

        cfg.exp_name = os.path.splitext(os.path.basename(model_yaml))[0]
    if test_yaml is not None:
        with open(test_yaml) as f:
            raw = yaml.safe_load(f) or {}
        u = _apply_section(cfg.task, raw)
        if u:
            unknown["task"] = u
    if overrides:
        for dotted, v in overrides.items():
            obj = cfg
            *path, last = dotted.split(".")
            for p in path:
                obj = getattr(obj, p)
            setattr(obj, last, v)
    if unknown:
        import warnings

        warnings.warn(f"Unrecognized config keys ignored: {unknown}")
    return cfg
