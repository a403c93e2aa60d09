"""Multi-host launch (parallel/launch.py): single-process unit semantics
plus a REAL 2-process jax.distributed integration run of the training
CLI on CPU (2 processes x 2 virtual devices = one 4-device global mesh),
checking loss parity against the equivalent single-process run and the
one-writer checkpoint/log contract."""

import json
import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from summarymixing_tpu.parallel import launch
from summarymixing_tpu.parallel.mesh import make_mesh

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_initialize_noop_without_env(monkeypatch):
    for var in ("SMT_COORDINATOR", "SMT_NUM_PROCESSES", "SMT_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert launch.initialize() is False
    assert launch.process_count() == 1
    assert launch.is_coordinator()


def test_local_rows_single_process():
    assert launch.local_rows(8) == slice(0, 8)
    assert launch.local_rows(3) == slice(0, 3)


def test_global_batch_matches_device_put():
    mesh = make_mesh()  # 8 virtual CPU devices on the data axis
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    g = launch.global_batch({"x": x}, mesh)["x"]
    assert g.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(g), x)
    # sharded over data: each device holds one row
    assert len(g.addressable_shards) == 8
    assert g.addressable_shards[0].data.shape == (1, 3)


def test_fetch_global_single_process():
    x = jax.numpy.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(launch.fetch_global(x), np.asarray(x))


def test_allreduce_counts_single_process():
    assert launch.allreduce_counts(3.0, 4.5) == (3.0, 4.5)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _tiny_recipe(tmp_path):
    recipe = tmp_path / "tiny.yaml"
    recipe.write_text("""
name: tiny_dist
seed: 1
tokenizer_type: char
model:
  attention_type: SummaryMixing
  mode: SummaryMixing-lite
  encoder_module: branchformer
  d_model: 32
  nhead: 2
  num_encoder_layers: 1
  num_decoder_layers: 0
  d_ffn: 32
  csgu_linear_units: 32
  csgu_kernel_size: 5
  local_proj_hid_dim: [16]
  local_proj_out_dim: 32
  summary_hid_dim: [16]
  summary_out_dim: 16
  input_size: 80
  output_neurons: 40
  frontend_channels: [4, 4]
training:
  number_of_epochs: 1
  precision: fp32
  ctc_weight: 1.0
  lr_adam: 0.001
  n_warmup_steps: 10
  grad_accumulation_factor: 1
  max_batch_length: 10.0
  num_buckets: 2
  max_batch_ex: 8
  ckpt_interval_minutes: 999
augment:
  speed_perturb: false
""")
    return recipe


def _run_train(recipe, manifest, out, env, steps=2, extra_env=None):
    e = dict(env)
    if extra_env:
        e.update(extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "recipes/train.py"), str(recipe),
         "--train-manifest", manifest, "--valid-manifest", manifest,
         "--output", str(out), "--steps", str(steps)],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        env=e, cwd=REPO)


def _val_loss(log_path):
    text = log_path.read_text()
    m = re.findall(r"valid loss: ([0-9.eE+-]+)", text)
    assert m, text
    return float(m[-1])


def test_two_process_training_matches_single(tmp_path):
    from tests.test_recipes import _make_dataset

    manifest = _make_dataset(str(tmp_path))
    recipe = _tiny_recipe(tmp_path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("SMT_COORDINATOR", None)

    # single-process run: 4 virtual devices (the same global mesh size)
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    out1 = tmp_path / "single"
    p = _run_train(recipe, manifest, out1, env1)
    _, err = p.communicate(timeout=560)
    assert p.returncode == 0, err[-3000:]

    # 2 processes x 2 devices: same 4-device global mesh. The
    # coordinator port is grabbed free-then-bound, so retry once on a
    # connect race.
    env2 = dict(env)
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    for attempt in range(2):
        port = _free_port()
        out2 = tmp_path / f"dist{attempt}"
        procs = [
            _run_train(recipe, manifest, out2, env2, extra_env={
                "SMT_COORDINATOR": f"127.0.0.1:{port}",
                "SMT_NUM_PROCESSES": "2",
                "SMT_PROCESS_ID": str(i),
            })
            for i in range(2)
        ]
        errs = [p.communicate(timeout=560)[1] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        assert attempt == 0, "\n".join(e[-3000:] for e in errs)

    # one-writer contract: canonical log + checkpoint from process 0,
    # per-process log from process 1, ONE checkpoint tree
    assert (out2 / "train_log.txt").exists()
    assert (out2 / "train_log.p1.txt").exists()
    assert (out2 / "save").exists()

    # the distributed run must train identically to single-process:
    # same global mesh, same batch sequence, same replicated-loss value
    l1 = _val_loss(out1 / "train_log.txt")
    l2 = _val_loss(out2 / "train_log.txt")
    l2b = _val_loss(out2 / "train_log.p1.txt")
    assert abs(l2 - l2b) < 1e-6, "processes disagree on the loss"
    assert abs(l1 - l2) / max(abs(l1), 1e-9) < 1e-4, (l1, l2)
