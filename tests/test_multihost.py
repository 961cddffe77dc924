"""Two-process multi-host smoke on localhost (CPU backend, Gloo rendezvous):
the full DP train step across a cross-process mesh — host-local shards,
make_global_batch assembly, XLA-inserted cross-host gradient all-reduce.

Runs in subprocesses because jax.distributed.initialize is once-per-process
and the test process already owns a backend."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_smoke():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one real CPU device per process
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "nerf_fewshot_tpu.parallel.multihost_smoke",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
                "--cpu",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    # both processes see the 2-device global mesh and the SAME loss
    losses = []
    for out in outs:
        m = re.search(r"devices=2 loss=([0-9.]+)", out)
        assert m, out
        losses.append(float(m.group(1)))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_two_process_full_trainer():
    """The REAL Trainer (phases, padded batches, scan, optax) over a
    2-process mesh: losses must be identical across processes."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "nerf_fewshot_tpu.parallel.multihost_train_smoke",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
                "--cpu", "--epochs", "2",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    losses = []
    for out in outs:
        m = re.search(r"losses=([0-9.,]+)", out)
        assert m, out
        losses.append(m.group(1))
    assert losses[0] == losses[1], losses

def test_two_process_full_trainer_fused_kernel():
    """The shard_map fused-kernel path ACROSS PROCESS BOUNDARIES (interpret
    mode): 2-process mesh, Trainer dispatches parallel/fused_dp, losses
    bit-equal across processes. Round 2 only proved this on a
    single-process 8-device mesh."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "nerf_fewshot_tpu.parallel.multihost_train_smoke",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
                "--cpu", "--epochs", "2", "--interpret-kernels",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    losses = []
    for out in outs:
        m = re.search(r"kernel=fused losses=([0-9.,]+)", out)
        assert m, out
        losses.append(m.group(1))
    assert losses[0] == losses[1], losses
