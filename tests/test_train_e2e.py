"""End-to-end slice test (SURVEY.md §7 step 4): a tiny SummaryMixing-lite
Branchformer CTC model must overfit a synthetic dataset and decode it back
with greedy CTC, with the train step running data-parallel on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.frontend.features import Fbank
from summarymixing_tpu.models.asr import TransformerASR
from summarymixing_tpu.models.speech_recognizer import SpeechRecognizer
from summarymixing_tpu.training.optim import make_adamw, noam_schedule
from summarymixing_tpu.training.trainer import ASRTrainer, TrainerConfig
from summarymixing_tpu.training.metrics import ErrorRateStats
from summarymixing_tpu.parallel.mesh import make_mesh

VOCAB = 8


def synth_batch(rng, b=8, n=4000):
    """Synthetic utterances: each token k in the label paints a band of
    energy at mel region k — learnable mapping for a tiny model."""
    sr = 16000
    labels = rng.integers(4, VOCAB, (b, 3)).astype(np.int32)
    wavs = np.zeros((b, n), np.float32)
    t = np.arange(n) / sr
    seg = n // 3
    for i in range(b):
        for j, lab in enumerate(labels[i]):
            f0 = 300.0 * (lab - 3)  # distinct frequencies per token
            wavs[i, j * seg : (j + 1) * seg] = np.sin(
                2 * np.pi * f0 * t[: seg]
            )
    return {
        "wav": jnp.asarray(wavs),
        "wav_lens": jnp.full((b,), n, jnp.int32),
        "tokens": jnp.asarray(labels),
        "token_lens": jnp.full((b,), 3, jnp.int32),
    }


def make_trainer(num_decoder_layers=0, mesh=None,
                 decoder_attention_type="regularMHA"):
    asr = TransformerASR(
        tgt_vocab=VOCAB,
        input_size=32 * 20,  # 80 mels / 4 subsample * 32 ch -> but tiny below
        d_model=32,
        nhead=2,
        num_encoder_layers=2,
        num_decoder_layers=num_decoder_layers,
        decoder_attention_type=decoder_attention_type,
        d_ffn=64,
        encoder_module="branchformer",
        attention_type="SummaryMixing",
        mode="SummaryMixing-lite",
        causal=False,
        csgu_linear_units=64,
        kernel_size=5,
        local_proj_hid_dim=(16,),
        local_proj_out_dim=32,
        summary_hid_dim=(24,),
        summary_out_dim=24,
        dropout_rate=0.0,
    )
    model = SpeechRecognizer(
        asr=asr, vocab_size=VOCAB,
        frontend_channels=(8, 4), frontend_dropout=0.0,
    )
    tx = make_adamw(3e-3, max_grad_norm=5.0)
    cfg = TrainerConfig(ctc_weight=1.0 if num_decoder_layers == 0 else 0.3,
                        augment=None)
    return ASRTrainer(model, tx, Fbank(), cfg, mesh=mesh)


def test_ctc_overfit_and_greedy_decode(rng):
    trainer = make_trainer(num_decoder_layers=0)
    batch = synth_batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses0 = None
    for i in range(150):
        state, metrics = trainer.train_step(state, batch)
        if i == 0:
            losses0 = float(metrics["loss"])
    final = float(metrics["loss"])
    assert final < losses0 * 0.2, (losses0, final)

    losses, hyps = trainer.eval_step(state, batch)
    refs = [list(map(int, row)) for row in np.asarray(batch["tokens"])]
    stats = ErrorRateStats()
    stats.append(refs, hyps)
    wer = stats.summarize()["WER"]
    assert wer < 15.0, (wer, refs[:2], hyps[:2])


def test_joint_ctc_attention_trains(rng):
    trainer = make_trainer(
        num_decoder_layers=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m0 = trainer.train_step(state, batch)
    for _ in range(30):
        state, m = trainer.train_step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["ctc"])) and np.isfinite(float(m["att"]))


def test_train_step_on_8_device_mesh(rng):
    """DP over the virtual mesh: same math, batch sharded over 8 devices."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    trainer = make_trainer(num_decoder_layers=0, mesh=mesh)
    batch = synth_batch(rng, b=8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated; batch-sharded loss is the global mean
    trainer_single = make_trainer(
        num_decoder_layers=0, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state_s = trainer_single.init_state(jax.random.PRNGKey(0), batch)
    _, metrics_s = trainer_single.train_step(state_s, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_s["loss"]), rtol=1e-4
    )


def test_grad_accumulation_matches_large_batch(rng):
    """optax.MultiSteps accumulation: two half-batches must produce the same
    update as one full batch (up to averaging)."""
    import optax
    from summarymixing_tpu.training.optim import make_adamw

    def loss_fn(p, x):
        return jnp.mean((x @ p["w"]) ** 2)

    p0 = {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}
    xa = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    x1, x2 = xa[:4], xa[4:]

    # accumulate 2 half-batch grads
    tx = make_adamw(1e-2, max_grad_norm=None, accum_steps=2)
    st = tx.init(p0)
    g1 = jax.grad(loss_fn)(p0, x1)
    up, st = tx.update(g1, st, p0)
    assert float(jnp.abs(up["w"]).max()) == 0.0  # no update yet
    g2 = jax.grad(loss_fn)(p0, x2)
    up_acc, st = tx.update(g2, st, p0)

    # one full-batch step
    tx_f = make_adamw(1e-2, max_grad_norm=None, accum_steps=1)
    st_f = tx_f.init(p0)
    gf = jax.grad(loss_fn)(p0, xa)
    up_full, _ = tx_f.update(gf, st_f, p0)

    np.testing.assert_allclose(np.asarray(up_acc["w"]),
                               np.asarray(up_full["w"]), rtol=1e-5, atol=1e-6)


def test_bf16_training_path(rng):
    """Mixed precision: bf16 activations with fp32 params/optimizer must
    train stably (the recipes' precision: bf16)."""
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=64,
        kernel_size=5, local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(24,), summary_out_dim=24, dropout_rate=0.0,
        dtype=jnp.bfloat16,
    )
    model = SpeechRecognizer(asr=asr, vocab_size=VOCAB,
                             frontend_channels=(8, 4), frontend_dropout=0.0,
                             dtype=jnp.bfloat16)
    trainer = ASRTrainer(
        model, make_adamw(3e-3), Fbank(),
        TrainerConfig(ctc_weight=1.0, augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # params stay fp32 (master weights)
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree.leaves(state["params"])
    )
    state, m0 = trainer.train_step(state, batch)
    for _ in range(20):
        state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_tensor_parallel_param_sharding(rng):
    """DP x TP mesh: wide kernels column-sharded over the 'model' axis, the
    same train step runs with GSPMD-inserted collectives, loss matches pure
    DP."""
    from summarymixing_tpu.parallel.mesh import tensor_parallel_param_sharding

    mesh = make_mesh(n_data=4, n_model=2)
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=128,
        kernel_size=5, local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(24,), summary_out_dim=24, dropout_rate=0.0,
    )
    model = SpeechRecognizer(asr=asr, vocab_size=VOCAB,
                             frontend_channels=(8, 4), frontend_dropout=0.0)
    trainer = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=mesh,
        param_sharding_fn=tensor_parallel_param_sharding(mesh, min_dim=128),
    )
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # at least one kernel actually sharded over "model"
    shardings = jax.tree.map(lambda x: x.sharding.spec, state["params"])
    specs = [str(s) for s in jax.tree.leaves(shardings,
                                             is_leaf=lambda x: x is None)]
    assert any("model" in s for s in map(str, jax.tree.leaves(
        jax.tree.map(lambda x: str(x.sharding.spec), state["params"])))), specs
    state, metrics = trainer.train_step(state, batch)
    tp_loss = float(metrics["loss"])
    assert np.isfinite(tp_loss)

    # pure-DP baseline must agree
    trainer_dp = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    state_dp = trainer_dp.init_state(jax.random.PRNGKey(0), batch)
    _, metrics_dp = trainer_dp.train_step(state_dp, batch)
    np.testing.assert_allclose(tp_loss, float(metrics_dp["loss"]), rtol=1e-4)


def test_fsdp_param_sharding(rng):
    """FSDP over the 8-device 'data' axis: large params + optimizer moments
    sharded (ZeRO-3 style), GSPMD all-gathers per use; loss matches pure
    DP."""
    from summarymixing_tpu.parallel.mesh import fsdp_param_sharding

    mesh = make_mesh(n_data=8, n_model=1)
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=128,
        kernel_size=5, local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(24,), summary_out_dim=24, dropout_rate=0.0,
    )
    model = SpeechRecognizer(asr=asr, vocab_size=VOCAB,
                             frontend_channels=(8, 4), frontend_dropout=0.0)
    trainer = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=mesh,
        param_sharding_fn=fsdp_param_sharding(mesh, min_size=1024),
    )
    batch = synth_batch(rng, b=8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    specs = [str(x.sharding.spec) for x in jax.tree.leaves(state["params"])]
    assert any("data" in s for s in specs), specs
    # optimizer moments sharded too (that's the ZeRO memory win)
    opt_specs = [str(x.sharding.spec)
                 for x in jax.tree.leaves(state["opt_state"])]
    assert any("data" in s for s in opt_specs), opt_specs
    state, metrics = trainer.train_step(state, batch)
    fsdp_loss = float(metrics["loss"])
    assert np.isfinite(fsdp_loss)

    trainer_dp = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    state_dp = trainer_dp.init_state(jax.random.PRNGKey(0), batch)
    _, metrics_dp = trainer_dp.train_step(state_dp, batch)
    np.testing.assert_allclose(fsdp_loss, float(metrics_dp["loss"]),
                               rtol=1e-4)


def test_composite_tp_fsdp_sharding(rng):
    """TP (wide kernels over 'model') + FSDP (other large params over
    'data') on a 4x2 mesh: all three collective families in one step, loss
    matches pure DP."""
    from summarymixing_tpu.parallel.mesh import composite_param_sharding

    mesh = make_mesh(n_data=4, n_model=2)
    asr = TransformerASR(
        tgt_vocab=VOCAB, input_size=80, d_model=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        mode="SummaryMixing", causal=False, csgu_linear_units=128,
        kernel_size=5, local_proj_hid_dim=(16,), local_proj_out_dim=32,
        summary_hid_dim=(24,), summary_out_dim=24, dropout_rate=0.0,
    )
    model = SpeechRecognizer(asr=asr, vocab_size=VOCAB,
                             frontend_channels=(8, 4), frontend_dropout=0.0)
    trainer = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=mesh,
        param_sharding_fn=composite_param_sharding(
            mesh, tp_min_dim=128, fsdp_min_size=512),
    )
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    specs = [str(x.sharding.spec) for x in jax.tree.leaves(state["params"])]
    assert any("model" in s for s in specs), specs   # TP kernels
    assert any("data" in s for s in specs), specs    # FSDP params
    state, metrics = trainer.train_step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    trainer_dp = ASRTrainer(
        model, make_adamw(3e-3), Fbank(), TrainerConfig(ctc_weight=1.0,
                                                        augment=None),
        mesh=make_mesh(devices=jax.devices()[:1]),
    )
    state_dp = trainer_dp.init_state(jax.random.PRNGKey(0), batch)
    _, metrics_dp = trainer_dp.train_step(state_dp, batch)
    np.testing.assert_allclose(loss, float(metrics_dp["loss"]), rtol=1e-4)


def test_concat_original_batch_doubling(rng):
    """Augmenter concat_original (AISHELL yaml:274): the train step runs on
    [original; augmented] with replicated targets, and still trains."""
    from summarymixing_tpu.frontend.augment import SpecAugmentConfig

    asr_mesh = make_mesh(devices=jax.devices()[:1])
    trainer = make_trainer(num_decoder_layers=0, mesh=asr_mesh)
    trainer.config = TrainerConfig(
        ctc_weight=1.0,
        augment=SpecAugmentConfig(min_augmentations=1, max_augmentations=1,
                                  replace="zeros"),
        concat_original=True,
    )
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m0 = trainer.train_step(state, batch)
    for _ in range(5):
        state, m = trainer.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"]) * 1.5


def test_nonfinite_step_skipped(rng):
    """A batch that produces a non-finite loss must leave params and
    optimizer state untouched (reference Brain.fit_batch skips non-finite
    losses) and report nonfinite_skipped=1; training then continues."""
    trainer = make_trainer(num_decoder_layers=0,
                           mesh=make_mesh(devices=jax.devices()[:1]))
    batch = synth_batch(rng, b=4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, batch)  # one good step
    params_before = jax.tree.map(np.asarray, state["params"])

    poisoned = dict(batch, wav=batch["wav"].at[0, 0].set(jnp.nan))
    state, m = trainer.train_step(state, poisoned)
    assert int(m["nonfinite_skipped"]) == 1
    assert not np.isfinite(float(m["loss"]))
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 state["params"]))):
        np.testing.assert_array_equal(a, b)

    # recovery: the next good step updates params again
    state, m2 = trainer.train_step(state, batch)
    assert int(m2["nonfinite_skipped"]) == 0
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(params_before),
                        jax.tree.leaves(jax.tree.map(np.asarray,
                                                     state["params"])))
    )
    assert changed


def test_xavier_overwrite_applied_to_asr_subtree(rng):
    """The reference's model-level xavier-normal re-init
    (TransformerASR.py:681-684) runs at trainer init: ASR params differ
    from the flax/module init, CNN frontend params are untouched, and
    disabling the flag restores the module init."""
    mesh = make_mesh(devices=jax.devices()[:1])
    batch = synth_batch(rng, b=2)

    def init_params(xavier):
        trainer = make_trainer(num_decoder_layers=0, mesh=mesh)
        trainer.config = TrainerConfig(ctc_weight=1.0, augment=None,
                                       xavier_init_overwrite=xavier)
        return trainer.init_state(jax.random.PRNGKey(0), batch)["params"]

    p_on = init_params(True)
    p_off = init_params(False)
    asr_same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_on["asr"]),
                        jax.tree.leaves(p_off["asr"]))
    )
    assert not asr_same
    for a, b in zip(jax.tree.leaves(p_on["cnn"]),
                    jax.tree.leaves(p_off["cnn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # only >1-D leaves are redrawn (biases/norm scales untouched)
    for a, b in zip(jax.tree.leaves(p_on["asr"]),
                    jax.tree.leaves(p_off["asr"])):
        if np.asarray(a).ndim <= 1:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
