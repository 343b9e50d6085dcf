"""--profile-dir trace capture (train.py surface + test.py CLI).

The TPU-native analog of the reference's torch.cuda timing hooks (SURVEY §5
tracing/profiling): a jax.profiler device trace (XPlane protobuf under the
TensorBoard plugin layout) of a bounded window of real compiled work.
"""
import glob
import os
import runpy
import sys


def _xplanes(trace_dir):
    return glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                  "*.xplane.pb"))


def test_train_loop_profile_window(tmp_path, monkeypatch):
    """A bounded [profile_start, profile_start+profile_iters) window inside
    the training loop must produce an XPlane trace and keep training to
    max_iters afterwards."""
    from spgan_tpu.config import Config
    from spgan_tpu.train.loop import train
    from spgan_tpu.utils import misc

    cfg = Config()
    cfg.exp_name = "prof"
    cfg.log_dir = str(tmp_path / "logs")
    tp = cfg.train_params
    tp.batch_size = 8  # divisible by the 8-device virtual mesh (conftest)
    tp.global_latent_dim = 32
    tp.local_latent_dim = 16
    tp.channel_multiplier = 1
    tp.n_mlp = 2
    tp.ss_n_layers = 2
    cfg.test_params.calc_fid = False

    # shrink the built models for the 1-core CPU box, the same way
    # test_train_step.py does (channel_base / D channels are construction
    # details, not config surface)
    real_import = misc.import_func

    def tiny_import(path):
        cls = real_import(path)

        class Tiny(cls):
            @classmethod
            def from_config(klass, c):
                m = cls.from_config(c)
                if hasattr(m, "ts"):
                    object.__setattr__(m.ts, "channel_base", 16)
                else:
                    small = {k: 32 for k in m.channels()}
                    object.__setattr__(m, "channels", lambda: small)
                return m

        return Tiny

    monkeypatch.setattr(misc, "import_func", tiny_import)

    trace = str(tmp_path / "trace")
    state = train(cfg, seed=0, max_iters=4, profile_dir=trace,
                  profile_start=1, profile_iters=2)
    assert int(state.step) == 4
    assert _xplanes(trace), "no XPlane trace written by the train loop"

    # window abutting the end of the run: [1, 3) with max_iters=3 must close
    # cleanly (NOT report truncation — regression: the old top-of-loop stop
    # check could only fire on a later pass that never happened)
    import io
    from contextlib import redirect_stdout

    trace2 = str(tmp_path / "trace2")
    cfg.exp_name = "prof2"  # fresh exp dir: don't resume from the first run
    buf = io.StringIO()
    with redirect_stdout(buf):
        state2 = train(cfg, seed=0, max_iters=3, profile_dir=trace2,
                       profile_start=1, profile_iters=2)
    assert int(state2.step) == 3
    assert _xplanes(trace2)
    out = buf.getvalue()
    assert "truncated" not in out, out
    assert "[1, 3)" in out, out


def test_cli_profile_dir(tmp_path):
    """test.py --profile-dir wraps one generation batch in a trace."""
    model = tmp_path / "tiny_model.yaml"
    model.write_text("""
train_params:
  global_latent_dim: 32
  local_latent_dim: 16
  channel_multiplier: 1
  n_mlp: 2
  ss_n_layers: 2
""")
    test = tmp_path / "tiny_test.yaml"
    test.write_text("""
task_manager: "spgan_tpu.infer.close_loop.CloseLoopPanoramaManager"
seed: 17
height: 128
width: 672
batch_size: 1
num_gen: 1
""")
    out = str(tmp_path / "out")
    trace = str(tmp_path / "trace")
    old = sys.argv
    sys.argv = ["test.py", "--model-config", str(model),
                "--test-config", str(test), "--random-init",
                "--save-root", out, "--profile-dir", trace]
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                    "test.py"), run_name="__main__")
    finally:
        sys.argv = old
    assert os.path.isfile(os.path.join(out, "000000.png"))
    assert _xplanes(trace), "no XPlane trace written by the test CLI"
