"""Preemption-safe training (training/preempt.py): signal/budget unit
behaviour plus a CLI integration check that a budget-stopped run
checkpoints and resumes exactly."""

import os
import signal
import subprocess
import sys

import pytest

from summarymixing_tpu.training.preempt import TrainStopper

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_sigterm_sets_requested_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with TrainStopper() as stopper:
        assert not stopper.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)
        assert stopper.requested
        assert stopper.should_stop()
        assert stopper.signame == "SIGTERM"
    assert signal.getsignal(signal.SIGTERM) is prev


def test_second_sigint_raises():
    with TrainStopper() as stopper:
        os.kill(os.getpid(), signal.SIGINT)
        assert stopper.requested
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
    # handler restored by __exit__ even after the hard-exit path
    signal.signal(signal.SIGINT, signal.default_int_handler)


def test_wallclock_budget_latches():
    with TrainStopper(max_hours=0.0) as stopper:
        assert stopper.should_stop()
        assert stopper.signame == "WALLCLOCK"
        assert stopper.should_stop()  # still true, message printed once


def test_no_budget_never_stops():
    with TrainStopper() as stopper:
        assert not stopper.should_stop()
        assert not stopper.over_budget()


def test_budget_stop_checkpoints_and_resumes(tmp_path):
    from tests.test_recipes import _make_dataset

    manifest = _make_dataset(str(tmp_path))
    recipe = tmp_path / "tiny.yaml"
    recipe.write_text(
        """
name: tiny_preempt
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
"""
    )
    out = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    base = [sys.executable, os.path.join(REPO, "recipes/train.py"),
            str(recipe), "--train-manifest", manifest,
            "--valid-manifest", manifest, "--output", str(out)]

    # zero budget: exactly one step, then checkpoint + clean exit
    res = subprocess.run(base + ["--max-hours", "0"], capture_output=True,
                         text=True, timeout=560, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "[preempt] checkpoint saved at step 1 (WALLCLOCK)" in res.stdout
    assert (out / "save").exists()

    # resume: restores step 1 WITHOUT re-running the device init (the
    # eval_shape template fast path — 6-7 min/attempt on the flagship
    # through the tunnel), runs one more step
    res = subprocess.run(base + ["--steps", "2"], capture_output=True,
                         text=True, timeout=560, env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "[restore] resumed from step 1 (template restore, " \
           "no device init)" in res.stdout, res.stdout[-3000:]
    assert "training done: 2 steps" in res.stdout

    # a finished run resumed with the same command trains ZERO further
    # epochs: the restored epoch count seeds the EpochCounter (it used
    # to restart at epoch 1 and re-run the whole epoch budget)
    res = subprocess.run(base, capture_output=True, text=True, timeout=560,
                         env=env, cwd=REPO)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "training done: 2 steps" in res.stdout


def test_should_stop_accepts_step_cadence():
    # single-process: the step argument is accepted and ignored
    with TrainStopper(max_hours=0.0) as stopper:
        assert stopper.should_stop(step=7)
    with TrainStopper() as stopper:
        assert not stopper.should_stop(step=7)
