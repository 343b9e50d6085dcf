"""Real 2-process multi-host training test (VERDICT r1 item 8): two OS
processes, 4 virtual CPU devices each, one 8-device global mesh, one pjit
train step; asserts the updated replicated params are bit-identical across
processes (the cross-host gradient all-reduce actually ran)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "helpers",
                     "multihost_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, CHILD, coord, "2", str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        logs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-4000:]}"

    a, b = np.load(outs[0]), np.load(outs[1])
    np.testing.assert_array_equal(a["digest"], b["digest"])
    np.testing.assert_array_equal(a["metric_vals"], b["metric_vals"])
    assert np.isfinite(a["metric_vals"]).all()
