"""Tests for batching, metrics, schedules, checkpointing, logger."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.data.batching import (
    BucketSpec,
    DynamicBucketBatcher,
    make_buckets,
    pad_batch,
)
from summarymixing_tpu.data.tokenizer import CharTokenizer
from summarymixing_tpu.training.checkpoint import CheckpointManager, average_checkpoints
from summarymixing_tpu.training.logger import EpochCounter, FileTrainLogger
from summarymixing_tpu.training.metrics import AccuracyStats, ErrorRateStats, edit_distance
from summarymixing_tpu.training.optim import (
    make_two_stage_adam_sgd,
    noam_schedule,
    warm_and_exp_decay_schedule,
)


def test_edit_distance():
    d = edit_distance("abc", "abc")
    assert d == {"ins": 0, "del": 0, "sub": 0, "num_ref": 3}
    d = edit_distance(list("kitten"), list("sitting"))
    assert d["sub"] + d["ins"] + d["del"] == 3


def test_wer_cer():
    stats = ErrorRateStats()
    stats.append(["the cat sat".split()], ["the cat sit".split()])
    s = stats.summarize()
    assert abs(s["WER"] - 100.0 / 3) < 1e-6
    cer = ErrorRateStats(split_tokens=True)
    cer.append([["ab", "cd"]], [["ab", "ce"]])
    assert abs(cer.summarize()["WER"] - 25.0) < 1e-6


def test_edit_distance_ops_alignment():
    d = edit_distance("abc".split() if False else list("abc"),
                      list("axbcd"), return_ops=True)
    # counts and ops must agree
    assert sum(1 for op, _, _ in d["ops"] if op == "I") == d["ins"]
    assert sum(1 for op, _, _ in d["ops"] if op == "D") == d["del"]
    assert sum(1 for op, _, _ in d["ops"] if op == "S") == d["sub"]
    # ops replay ref and hyp in order
    assert [r for _, r, _ in d["ops"] if r is not None] == list("abc")
    assert [h for _, _, h in d["ops"] if h is not None] == list("axbcd")


def test_write_stats_details(tmp_path):
    stats = ErrorRateStats(keep_details=True)
    stats.append([["the", "cat", "sat"], ["a", "dog"]],
                 [["the", "bat", "sat"], ["a", "dog"]],
                 ids=[7, 3])
    path = tmp_path / "wer_details.txt"
    stats.write_stats(str(path), id_map={7: "utt-seven", 3: "utt-three"})
    text = path.read_text()
    assert text.startswith("%WER")
    # worst-first ordering: the errorful utterance block comes first
    assert text.index("utt-seven") < text.index("utt-three")
    assert "1 sub" in text
    assert "cat" in text and "bat" in text
    # details off -> write_stats refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ErrorRateStats().write_stats(str(path))


def test_accuracy():
    acc = AccuracyStats()
    lp = np.zeros((1, 3, 4))
    lp[0, :, 2] = 1.0
    acc.append(lp, np.array([[2, 2, 0]]), np.array([3]))
    assert abs(acc.summarize() - 2 / 3) < 1e-6


def test_noam_schedule():
    s = noam_schedule(1e-3, 100)
    peak = float(s(100))
    assert abs(peak - 1e-3) / 1e-3 < 1e-5
    assert float(s(10)) < peak and float(s(1000)) < peak


def test_warm_exp_decay():
    s = warm_and_exp_decay_schedule(1e-3, 100, 1000, decay_factor=0.05)
    assert float(s(50)) == pytest.approx(5e-4)
    assert float(s(100)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(1000)) == pytest.approx(5e-5, rel=1e-4)


def test_two_stage_optimizer():
    # momentum-free variant: the post-switch update is exactly -lr * g
    tx = make_two_stage_adam_sgd(1e-3, sgd_lr=1e-2, switch_step=2,
                                 max_grad_norm=None, sgd_momentum=0.0,
                                 sgd_nesterov=False)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    u3, state = tx.update(g, state, params)  # now SGD
    np.testing.assert_allclose(np.asarray(u3["w"]), -1e-2 * np.ones(3), rtol=1e-6)
    assert not np.allclose(np.asarray(u1["w"]), np.asarray(u3["w"]))


def test_two_stage_sgd_matches_reference_nesterov():
    """Default second stage == SGD(momentum 0.99, nesterov) exactly
    (reference AISHELL yaml:173-176)."""
    import optax

    tx = make_two_stage_adam_sgd(1e-3, sgd_lr=1e-2, switch_step=0,
                                 max_grad_norm=None)
    ref = optax.sgd(1e-2, momentum=0.99, nesterov=True)
    params = {"w": jnp.ones((3,))}
    s, rs = tx.init(params), ref.init(params)
    for i in range(3):
        g = {"w": jnp.full((3,), float(i + 1))}
        u, s = tx.update(g, s, params)
        ru, rs = ref.update(g, rs, params)
        np.testing.assert_allclose(np.asarray(u["w"]), np.asarray(ru["w"]),
                                   rtol=1e-6)


def test_two_stage_sgd_momentum_fresh_at_switch():
    """The SGD momentum trace must stay at init through the Adam phase: the
    first post-switch update equals a fresh SGD's first update, however many
    Adam steps ran before (regression: the trace used to accumulate the
    whole stage-1 gradient history)."""
    import optax

    tx = make_two_stage_adam_sgd(1e-3, sgd_lr=1e-2, switch_step=5,
                                 max_grad_norm=None)
    ref = optax.sgd(1e-2, momentum=0.99, nesterov=True)
    params = {"w": jnp.ones((3,))}
    s = tx.init(params)
    for i in range(5):  # adam phase, large non-zero grads
        g = {"w": jnp.full((3,), 100.0 * (i + 1))}
        _, s = tx.update(g, s, params)
    g = {"w": jnp.full((3,), 2.0)}
    u, s = tx.update(g, s, params)  # first SGD step
    ru, _ = ref.update(g, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(u["w"]), np.asarray(ru["w"]),
                               rtol=1e-6)


def test_two_stage_grad_accumulation():
    """accum_steps wraps the two-stage optimizer in MultiSteps: updates are
    zero on micro-steps and applied on every k-th (CommonVoice yaml:44)."""
    tx = make_two_stage_adam_sgd(1e-3, sgd_lr=1e-2, switch_step=100,
                                 max_grad_norm=None, accum_steps=2)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    u1, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), 0.0)  # micro-step
    u2, state = tx.update(g, state, params)
    assert float(np.abs(np.asarray(u2["w"])).max()) > 0.0  # applied


def test_buckets_and_batcher():
    buckets = make_buckets(
        max_batch_length=1000, num_buckets=5, min_len=50, max_len=800,
        batch_multiple=2,
    )
    assert all(b.batch_size % 2 == 0 or b.batch_size == 2 for b in buckets)
    lengths = np.concatenate([
        np.random.default_rng(0).integers(50, 790, 100), [60] * 20])
    batcher = DynamicBucketBatcher(lengths, buckets, seed=1)
    seen = 0
    for spec, idx in batcher:
        assert len(idx) == spec.batch_size
        assert (lengths[idx] <= spec.max_len).all()
        seen += 1
    assert seen == batcher.num_batches() and seen > 0


def test_pad_batch():
    arrays = [np.ones(5), np.ones(9) * 2]
    out, lens = pad_batch(arrays, max_len=8)
    assert out.shape == (2, 8)
    assert list(lens) == [5, 8]
    assert out[0, 5:].sum() == 0 and out[1].sum() == 16


def test_char_tokenizer():
    tok = CharTokenizer.build(["hello", "world"])
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    assert tok.encode("z")[0] == tok.unk_id


def test_checkpoint_roundtrip_and_averaging(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    state = {
        "params": {"w": np.ones((2, 2), np.float32)},
        "step": np.asarray(0, np.int32),
    }
    for step in range(3):
        state["params"]["w"] = np.full((2, 2), float(step + 1), np.float32)
        state["step"] = np.asarray(step, np.int32)
        assert mgr.save(step, state, force=True)
    restored = mgr.restore(state)
    assert float(restored["params"]["w"][0, 0]) == 3.0
    avg = average_checkpoints(mgr, state, num=3)
    assert float(avg["params"]["w"][0, 0]) == pytest.approx(2.0)
    assert int(avg["step"]) == 2


def test_checkpoint_async_save(tmp_path):
    """blocking=False dispatches the write to orbax's background thread;
    a subsequent restore/latest_step joins the in-flight write first, so
    readers never observe a half-written checkpoint (VERDICT r3 weak #4:
    save cost off the step path)."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    state = {
        "params": {"w": np.full((64, 64), 7.0, np.float32)},
        "step": np.asarray(0, np.int32),
    }
    for step in range(3):
        state["step"] = np.asarray(step, np.int32)
        assert mgr.save(step, state, force=True, blocking=False)
    # latest_step/restore must join the pending write
    assert mgr.latest_step() == 2
    restored = mgr.restore(state)
    assert int(restored["step"]) == 2
    assert float(restored["params"]["w"][0, 0]) == 7.0
    # a fresh manager over the same dir sees all three steps complete
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=5)
    assert mgr2.all_steps() == [0, 1, 2]


def test_logger(tmp_path):
    log = FileTrainLogger(str(tmp_path / "train_log.txt"))
    log.log_stats({"epoch": 1, "lr": 1e-4}, {"loss": 3.2}, {"WER": 12.5})
    text = open(tmp_path / "train_log.txt").read()
    assert "epoch: 1" in text and "valid WER: 12.5" in text
    assert os.path.exists(tmp_path / "train_log.jsonl")
    assert list(EpochCounter(3)) == [1, 2, 3]


def test_pretrainer(tmp_path):
    from summarymixing_tpu.utils.pretrained import Pretrainer
    np.savez(tmp_path / "lm.npz", w=np.ones((2, 2)))
    pt = Pretrainer(collect_in=str(tmp_path), loadables={"lm": "lm.npz"})
    out = pt.collect()
    assert np.allclose(out["lm"]["w"], 1.0)
    pt2 = Pretrainer(collect_in=str(tmp_path),
                     loadables={"lm": "https://hf.co/x/lm.ckpt"})
    with pytest.raises(RuntimeError):
        pt2.load("lm")
    pt3 = Pretrainer(collect_in=str(tmp_path), loadables={"x": "missing.npz"})
    with pytest.raises(FileNotFoundError):
        pt3.load("x")


def test_step_timer_and_memory_stats():
    import time as _time
    from summarymixing_tpu.training.profiling import StepTimer, device_memory_stats
    timer = StepTimer(window=10)
    assert timer.tick() is None
    _time.sleep(0.01)
    dt = timer.tick()
    assert dt is not None and dt > 0
    stats = timer.stats()
    assert stats["steps_per_sec"] > 0 and stats["p50_s"] > 0
    mem = device_memory_stats()
    assert isinstance(mem, dict) and len(mem) >= 1


def test_batcher_reshuffles_each_epoch():
    """Regression: each __iter__ must yield a fresh shuffle."""
    buckets = make_buckets(max_batch_length=100, num_buckets=2,
                           min_len=10, max_len=20)
    lengths = np.random.default_rng(0).integers(10, 20, 64)
    batcher = DynamicBucketBatcher(lengths, buckets, shuffle=True, seed=3)
    e1 = [tuple(idx) for _, idx in batcher]
    e2 = [tuple(idx) for _, idx in batcher]
    assert e1 != e2
    # eval mode stays deterministic
    ev = DynamicBucketBatcher(lengths, buckets, shuffle=False, drop_last=False)
    a = [tuple(idx) for _, idx in ev]
    b = [tuple(idx) for _, idx in ev]
    assert a == b


def test_prefetch_preserves_order_and_errors():
    from summarymixing_tpu.data.batching import prefetch
    assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("inner")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="inner"):
        list(it)


def test_fetch_to_host_matches_leafwise():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from summarymixing_tpu.training.checkpoint import fetch_to_host

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros((3,))},
            "step": jnp.asarray(7), "epoch": 2}
    out = fetch_to_host(tree)
    ref = jax.tree.map(np.asarray, tree)
    assert jax.tree.structure(out) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(a, b)
        assert isinstance(a, (np.ndarray, np.generic))


def test_interval_save_waits_from_construction(tmp_path):
    from summarymixing_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), interval_minutes=999)
    # a fresh manager must NOT save at step 1 (first interval counts
    # from construction, not epoch 0 of 1970)
    assert not mgr.should_save()
    mgr2 = CheckpointManager(str(tmp_path / "ck2"), interval_minutes=None)
    assert mgr2.should_save()


def test_bucket_shape_grid_manifest_independent():
    """quantize=True must yield IDENTICAL bucket shapes for a manifest and
    a random subset of it (the whole point: subsets/new splits reuse the
    persistent compile cache instead of recompiling shifted boundaries).
    Motivated by the round-5 transducer flagship: a 8k-utterance subset of
    hard26h shifted 3 of 4 boundaries -> 3 fresh multi-minute compiles."""
    from summarymixing_tpu.data.batching import quantize_len

    rng = np.random.default_rng(7)
    full = rng.integers(12_000, 66_000, 5_000)
    sub = rng.choice(full, 800, replace=False)

    def specs(lengths):
        return make_buckets(
            max_batch_length=150.0 * 16_000, num_buckets=4,
            min_len=int(min(lengths)), max_len=int(max(lengths)),
            max_batch_size=256, quantize=True,
        )

    assert specs(full) == specs(sub)
    # boundaries all sit on the fixed grid
    for spec in specs(full):
        assert spec.max_len == quantize_len(spec.max_len)
    # un-quantized boundaries differ for the same pair (the failure mode)
    def raw(lengths):
        return make_buckets(
            max_batch_length=150.0 * 16_000, num_buckets=4,
            min_len=int(min(lengths)), max_len=int(max(lengths)),
            max_batch_size=256,
        )
    assert raw(full) != raw(sub)


def test_quantize_len_grid_properties():
    from summarymixing_tpu.data.batching import quantize_len

    # idempotent, monotone, >= n, and <= 10% padding overhead
    prev = 0
    for n in [1, 4000, 4001, 17_500, 65_849, 640_000]:
        q = quantize_len(n)
        assert q >= n
        assert q == quantize_len(q), n
        assert q <= max(4000, int(np.ceil(n * 1.1))), (n, q)
        assert q >= prev
        prev = q
