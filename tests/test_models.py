"""Encoder/decoder model tests: shapes, masking properties, DCConv
equivalence, rel-shift correctness, ASR wrapper end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.models import (
    BranchformerEncoder,
    ConformerEncoder,
    TransformerASR,
    TransformerDecoder,
    TransformerEncoder,
)
from summarymixing_tpu.models.asr import DynChunkTrainConfig, EncoderASR
from summarymixing_tpu.ops.attention import rel_shift
from summarymixing_tpu.ops.convolution import ConvolutionModule, _dcconv_depthwise
from summarymixing_tpu.ops.masks import chunked_context_mask, length_to_mask
from summarymixing_tpu.ops.positional import relpos_xl_table

D = 32


def _x(rng, b=2, t=12, d=D):
    return jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)


SM_KW = dict(
    local_proj_hid_dim=(16,), local_proj_out_dim=D,
    summary_hid_dim=(24,), summary_out_dim=24,
)


@pytest.mark.parametrize(
    "attention_type", ["SummaryMixing", "regularMHA", "RelPosMHAXL", "hypermixing", "cnnonly"]
)
def test_branchformer_shapes(attention_type, rng):
    x = _x(rng)
    enc = BranchformerEncoder(
        num_layers=2, d_model=D, nhead=4, csgu_linear_units=64,
        attention_type=attention_type, **SM_KW,
    )
    pos = relpos_xl_table(x.shape[1], D) if attention_type == "RelPosMHAXL" else None
    params = enc.init(jax.random.PRNGKey(0), x, pos_embs=pos)
    out = enc.apply(params, x, pos_embs=pos)
    assert out.shape == x.shape


@pytest.mark.parametrize("attention_type", ["SummaryMixing", "RelPosMHAXL"])
@pytest.mark.parametrize("mode", ["SummaryMixing", "SummaryMixing-fast"])
def test_conformer_shapes(attention_type, mode, rng):
    x = _x(rng)
    enc = ConformerEncoder(
        num_layers=2, d_model=D, d_ffn=64, nhead=4, kernel_size=5,
        attention_type=attention_type, mode=mode,
        local_proj_hid_dim=(16,), local_proj_out_dim=D, summary_hid_dim=(24,),
    )
    pos = relpos_xl_table(x.shape[1], D) if attention_type == "RelPosMHAXL" else None
    params = enc.init(jax.random.PRNGKey(0), x, pos_embs=pos)
    out = enc.apply(params, x, pos_embs=pos)
    assert out.shape == x.shape


@pytest.mark.parametrize("encoder_module", ["branchformer", "conformer", "transformer"])
def test_encoder_padding_invariance(encoder_module, rng):
    """Valid-frame outputs of a full encoder must not depend on padding
    content (the SummaryMixing mean + conv masking discipline, SURVEY.md §7)."""
    b, t = 2, 16
    x = rng.standard_normal((b, t, D)).astype(np.float32)
    lens = np.array([16, 10])
    pad = np.asarray(length_to_mask(jnp.asarray(lens), t))

    if encoder_module == "branchformer":
        enc = BranchformerEncoder(
            num_layers=2, d_model=D, nhead=2, csgu_linear_units=64,
            kernel_size=5, attention_type="SummaryMixing", **SM_KW)
    elif encoder_module == "conformer":
        enc = ConformerEncoder(
            num_layers=2, d_model=D, d_ffn=64, nhead=2, kernel_size=5,
            attention_type="SummaryMixing",
            local_proj_hid_dim=(16,), local_proj_out_dim=D, summary_hid_dim=(24,))
    else:
        enc = TransformerEncoder(
            num_layers=2, d_model=D, d_ffn=64, nhead=2,
            attention_type="SummaryMixing", normalize_before=True,
            local_proj_hid_dim=(16,), local_proj_out_dim=D,
            summary_hid_dim=(24,), summary_out_dim=24)

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), pad_mask=jnp.asarray(pad))
    o1 = enc.apply(params, jnp.asarray(x), pad_mask=jnp.asarray(pad))
    x2 = x.copy()
    x2[1, 10:] = 77.7  # poison padding
    o2 = enc.apply(params, jnp.asarray(x2), pad_mask=jnp.asarray(pad))

    # STRICT invariance on every valid frame: conv inputs are pad-masked
    # (an intentional improvement over the reference, which lets conv kernels
    # read padding content near the boundary).
    np.testing.assert_allclose(
        np.asarray(o1)[1, :10], np.asarray(o2)[1, :10], atol=2e-5, rtol=2e-5
    )


def test_conv_module_respects_pad_mask(rng):
    x = _x(rng, t=10)
    pad = length_to_mask(jnp.asarray([10, 6]), 10)
    m = ConvolutionModule(input_size=D, kernel_size=5)
    params = m.init(jax.random.PRNGKey(0), x, pad_mask=pad)
    out = m.apply(params, x, pad_mask=pad)
    assert np.abs(np.asarray(out)[1, 6:]).max() == 0.0


def test_dcconv_equals_unfold_oracle(rng):
    """Mask-based DCConv == the reference's unfold formulation
    (Conformer.py:190-313), checked with a numpy re-derivation."""
    b, t, c, k = 2, 20, 8, 5
    pad = (k - 1) // 2
    chunk = 6
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((k, c)).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)

    got = np.asarray(
        _dcconv_depthwise(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                          jnp.asarray(chunk))
    )

    # oracle: per output frame, taps clipped to [0, chunk_end)
    want = np.zeros_like(x)
    for tt in range(t):
        chunk_end = (tt // chunk + 1) * chunk
        for o in range(-pad, pad + 1):
            s = tt + o
            if 0 <= s < t and s < chunk_end:
                want[:, tt] += w[o + pad] * x[:, s]
    want += bias
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dcconv_traced_chunk_one_program(rng):
    """chunk_size may vary per call without recompiling (traced scalar)."""
    x = _x(rng, t=16, d=8)
    w = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    b = jnp.zeros((8,))
    f = jax.jit(_dcconv_depthwise)
    o1 = f(x, w, b, jnp.asarray(4))
    o2 = f(x, w, b, jnp.asarray(8))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_rel_shift():
    t = 5
    x = jnp.arange(2 * t - 1, dtype=jnp.float32)[None, None, None, :]
    x = jnp.broadcast_to(x, (1, 1, t, 2 * t - 1))
    out = np.asarray(rel_shift(x))
    for tt in range(t):
        for s in range(t):
            assert out[0, 0, tt, s] == (t - 1) - tt + s


def test_chunked_context_mask():
    m = np.asarray(chunked_context_mask(8, 3, 1))
    for tt in range(8):
        chunk = tt // 3
        for s in range(8):
            allowed = s < (chunk + 1) * 3 and s >= (chunk - 1) * 3
            assert m[tt, s] == float(allowed), (tt, s)


def test_transformer_asr_forward_and_decode(rng):
    b, t, vocab = 2, 12, 40
    src = _x(rng, b=b, t=t, d=24)
    tgt = jnp.asarray(rng.integers(1, vocab, (b, 5)), jnp.int32)
    wav_len = jnp.asarray([1.0, 0.7])
    asr = TransformerASR(
        tgt_vocab=vocab, input_size=24, d_model=D, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        causal=False, csgu_linear_units=64, **SM_KW,
    )
    params = asr.init(jax.random.PRNGKey(0), src, tgt, wav_len)
    enc_out, dec_out = asr.apply(params, src, tgt, wav_len)
    assert enc_out.shape == (b, t, D)
    assert dec_out.shape == (b, 5, D)

    enc_only = asr.apply(params, src, wav_len=wav_len, method=asr.encode)
    np.testing.assert_allclose(np.asarray(enc_only), np.asarray(enc_out), atol=1e-6)

    step = asr.apply(params, tgt, enc_out, jnp.array([t, 8]),
                     method=asr.decode_step)
    assert step.shape == (b, D)

    wrapper = EncoderASR(asr=asr)
    wparams = {"params": {"asr": params["params"]}}
    enc_w = wrapper.apply(wparams, src, wav_len)
    np.testing.assert_allclose(np.asarray(enc_w), np.asarray(enc_out), atol=1e-6)


def test_conformer_dynchunk_streaming_equivalence(rng):
    """A chunked-context conformer must give identical outputs whether the
    suffix beyond a chunk boundary exists or not (the property that makes
    chunked training match streaming inference) — for frames whose chunk is
    fully inside the prefix."""
    t, chunk = 12, 4
    x = _x(rng, b=1, t=t)
    enc = ConformerEncoder(
        num_layers=1, d_model=D, d_ffn=64, nhead=2, kernel_size=5,
        attention_type="SummaryMixing",
        local_proj_hid_dim=(16,), local_proj_out_dim=D, summary_hid_dim=(24,),
    )
    mask_full = chunked_context_mask(t, chunk, None)
    params = enc.init(jax.random.PRNGKey(0), x, src_mask=mask_full,
                      chunk_size=jnp.asarray(chunk))
    out_full = enc.apply(params, x, src_mask=mask_full,
                         chunk_size=jnp.asarray(chunk))

    t2 = 8  # first two chunks only
    mask_pre = chunked_context_mask(t2, chunk, None)
    out_pre = enc.apply(params, x[:, :t2], src_mask=mask_pre,
                        chunk_size=jnp.asarray(chunk))
    np.testing.assert_allclose(
        np.asarray(out_full)[0, :t2], np.asarray(out_pre)[0], atol=2e-5, rtol=2e-5
    )


def test_transformer_decoder_causality(rng):
    """Changing a future target token must not change past decoder outputs."""
    b, u, t = 1, 6, 8
    mem = _x(rng, b=b, t=t)
    dec = TransformerDecoder(num_layers=2, d_model=D, d_ffn=64, nhead=2,
                             normalize_before=True)
    tgt = _x(rng, b=b, t=u)
    from summarymixing_tpu.ops.masks import lookahead_mask
    params = dec.init(jax.random.PRNGKey(0), tgt, mem, tgt_mask=lookahead_mask(u))
    o1 = dec.apply(params, tgt, mem, tgt_mask=lookahead_mask(u))
    tgt2 = tgt.at[:, 4].set(99.0)
    o2 = dec.apply(params, tgt2, mem, tgt_mask=lookahead_mask(u))
    np.testing.assert_allclose(np.asarray(o1)[:, :4], np.asarray(o2)[:, :4],
                               atol=1e-5, rtol=1e-5)


def test_conformer_decoder_shapes(rng):
    from summarymixing_tpu.models import ConformerDecoder
    tgt = _x(rng, b=2, t=6)
    mem = _x(rng, b=2, t=9)
    dec = ConformerDecoder(num_layers=2, d_model=D, d_ffn=64, nhead=2,
                           kernel_size=3, attention_type="regularMHA")
    params = dec.init(jax.random.PRNGKey(0), tgt, mem)
    out = dec.apply(params, tgt, mem)
    assert out.shape == tgt.shape


def test_summary_decoder_variant(rng):
    """The paper's Summary Decoder (README.md:35): SummaryMixing replaces
    decoder self-attention; causality must hold."""
    from summarymixing_tpu.ops.masks import lookahead_mask
    tgt = _x(rng, b=1, t=6)
    mem = _x(rng, b=1, t=8)
    dec = TransformerDecoder(
        num_layers=2, d_model=D, d_ffn=64, nhead=2,
        normalize_before=True, attention_type="SummaryMixing",
        local_proj_hid_dim=(16,), local_proj_out_dim=D, summary_hid_dim=(24,),
    )
    params = dec.init(jax.random.PRNGKey(0), tgt, mem,
                      tgt_mask=lookahead_mask(6))
    o1 = dec.apply(params, tgt, mem, tgt_mask=lookahead_mask(6))
    tgt2 = tgt.at[:, 4].set(55.0)
    o2 = dec.apply(params, tgt2, mem, tgt_mask=lookahead_mask(6))
    np.testing.assert_allclose(np.asarray(o1)[:, :4], np.asarray(o2)[:, :4],
                               atol=1e-5, rtol=1e-5)


def test_branchformer_scan_layers(rng):
    """scan_layers=True: same math as the unrolled loop when the stacked
    params are copied layer-wise."""
    x = _x(rng, b=1, t=8)
    kw = dict(num_layers=3, d_model=D, nhead=2, csgu_linear_units=64,
              kernel_size=5, attention_type="SummaryMixing", **SM_KW)
    loop_enc = BranchformerEncoder(**kw)
    scan_enc = BranchformerEncoder(**kw, scan_layers=True)
    lp = loop_enc.init(jax.random.PRNGKey(0), x)["params"]
    # build scan params by stacking the loop layers
    import numpy as _np
    stacked = jax.tree.map(
        lambda *ls: _np.stack([_np.asarray(l) for l in ls]),
        lp["layer_0"], lp["layer_1"], lp["layer_2"],
    )
    sp = {"params": {"layers": stacked, "norm": lp["norm"]}}
    out_loop = loop_enc.apply({"params": lp}, x)
    out_scan = scan_enc.apply(sp, x)
    np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                               atol=1e-5, rtol=1e-5)


def test_dct_rejected_for_non_conformer(rng):
    src = _x(rng, b=1, t=8, d=24)
    asr = TransformerASR(
        tgt_vocab=10, input_size=24, d_model=D, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        causal=False, csgu_linear_units=64, kernel_size=5, **SM_KW,
    )
    params = asr.init(jax.random.PRNGKey(0), src)
    with pytest.raises(ValueError, match="conformer"):
        asr.apply(params, src,
                  dynchunktrain=DynChunkTrainConfig(chunk_size=4,
                                                    left_context_size=1),
                  method=asr.encode)


@pytest.mark.parametrize("encoder_module", ["branchformer", "conformer",
                                            "transformer"])
def test_remat_bitwise_identical(encoder_module, rng):
    """remat=True recomputes activations in the backward pass: forward
    outputs are bit-identical to the plain encoder; gradients match up to
    float reassociation (the recomputed backward is a different XLA
    program, so accumulation order differs in the last bits)."""
    src = _x(rng, b=2, t=10, d=24)
    kw = dict(
        tgt_vocab=10, input_size=24, d_model=D, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=64,
        encoder_module=encoder_module, attention_type="SummaryMixing",
        causal=False, csgu_linear_units=64, kernel_size=5,
        dropout_rate=0.0, **SM_KW,
    )
    plain = TransformerASR(**kw)
    remat = TransformerASR(**kw, remat=True)
    params = plain.init(jax.random.PRNGKey(0), src)

    def loss(model, p):
        out = model.apply(p, src, method=model.encode)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    o1 = plain.apply(params, src, method=plain.encode)
    o2 = remat.apply(params, src, method=remat.encode)
    assert jnp.array_equal(o1, o2)
    g1 = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
    g2 = jax.jit(jax.grad(lambda p: loss(remat, p)))(params)
    # jitted plain vs remat backward are different XLA programs: fusion +
    # accumulation order differ, so tiny-magnitude grad leaves see ~1e-6
    # absolute noise; a real bug (wrong mask/layer) would be O(1)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_summary_decoder_through_asr(rng):
    """decoder_attention_type="SummaryMixing" (the paper's Summary Decoder,
    reference README.md:35) is drivable through TransformerASR: forward
    works and the full-prefix decode step is causal."""
    src = _x(rng, b=2, t=8, d=24)
    tgt = jnp.asarray(rng.integers(1, 10, (2, 5)), jnp.int32)
    asr = TransformerASR(
        tgt_vocab=10, input_size=24, d_model=D, nhead=2,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
        encoder_module="branchformer", attention_type="SummaryMixing",
        decoder_attention_type="SummaryMixing", mode="SummaryMixing",
        causal=False, csgu_linear_units=64, kernel_size=5,
        dropout_rate=0.0, **SM_KW,
    )
    params = asr.init(jax.random.PRNGKey(0), src, tgt)
    enc_out, dec_out = asr.apply(params, src, tgt)
    assert dec_out.shape == (2, 5, D)
    # causality of the decoder: changing tgt[t>=3] must not affect dec[:, :3]
    tgt2 = tgt.at[:, 4].set(7)
    _, dec2 = asr.apply(params, src, tgt2)
    np.testing.assert_allclose(np.asarray(dec_out)[:, :4],
                               np.asarray(dec2)[:, :4], atol=1e-5, rtol=1e-5)
    # cached stepping works for the Summary Decoder too (running-mean
    # carry; step==prefix parity is pinned in test_decoding.py)
    cache = asr.apply(params, jnp.zeros((2, 3, D)), 4,
                      method=asr.decode_cache_init)
    h, cache = asr.apply(params, tgt[:, 0], 0, cache,
                         method=asr.decode_step_cached)
    assert h.shape == (2, D)


def test_invalid_config_surface_rejected(rng):
    """Unusable option combinations fail loudly at construction instead of
    crashing deep in the first forward (or silently returning None
    mixers)."""
    from summarymixing_tpu.models.mixers import make_mixer

    with pytest.raises(ValueError, match="Branchformer"):
        ConformerEncoder(
            num_layers=1, d_model=D, d_ffn=64, nhead=2, kernel_size=5,
            attention_type="cnnonly",
            local_proj_hid_dim=(16,), local_proj_out_dim=D,
            summary_hid_dim=(24,),
        ).init(jax.random.PRNGKey(0), _x(rng))
    with pytest.raises(ValueError, match="decoder_attention_type"):
        TransformerASR(
            tgt_vocab=10, input_size=24, d_model=D, nhead=2,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
            encoder_module="branchformer", attention_type="SummaryMixing",
            decoder_attention_type="RelPosMHAXL", causal=False,
            csgu_linear_units=64, kernel_size=5, **SM_KW,
        ).init(jax.random.PRNGKey(0), _x(rng, d=24),
               jnp.ones((2, 3), jnp.int32))


def test_rnnlm_dropout_active(rng):
    """RNNLM dropout regularises training forwards (non-deterministic
    draws differ) and is off for deterministic fusion stepping."""
    from summarymixing_tpu.models.lm import RNNLM

    lm = RNNLM(vocab=12, embedding_dim=6, rnn_layers=1, rnn_neurons=10,
               dnn_neurons=8, dropout_rate=0.5)
    toks = jnp.asarray(rng.integers(0, 12, (2, 5)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), toks)
    o1 = lm.apply(params, toks, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = lm.apply(params, toks, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    d1 = lm.apply(params, toks)
    d2 = lm.apply(params, toks)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_mha_grouped_cross_step_matches_tiled(rng):
    """ops/attention.py::_step_grouped — cross-attention step with a
    per-utterance K/V cache ([B, S, H, hd]) against N = B*beam query
    rows — must equal the per-row step on a beam-tiled cache exactly
    (same math, the beam axis rides as extra query positions). This is
    the kernel of the beam-66 HBM fix."""
    from summarymixing_tpu.ops.attention import MultiheadAttention

    b, s, d, h, beam = 3, 7, 16, 4, 5
    n = b * beam
    mha = MultiheadAttention(d_model=d, nhead=h)
    mem = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    x_t = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), mem, mem, mem)
    bound = mha.bind(params)
    k_b, v_b = bound.kv(mem)                       # [B, S, H, hd]
    k_n = jnp.repeat(k_b, beam, axis=0)            # legacy beam tile
    v_n = jnp.repeat(v_b, beam, axis=0)
    lens = jnp.asarray([s, s - 2, s - 5], jnp.int32)
    pad_b = length_to_mask(lens, s)                # [B, S]
    pad_n = jnp.repeat(pad_b, beam, axis=0)        # [N, S]

    out_t, _, _ = bound.step(x_t, k_n, v_n, 0, pad_mask=pad_n, append=False)
    out_g, k2, v2 = bound.step(x_t, k_b, v_b, 0, pad_mask=pad_b,
                               append=False)
    assert k2.shape == k_b.shape                   # cache stays untiled
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_g),
                               rtol=1e-5, atol=1e-6)
    # a beam-tiled pad mask is folded back ([::beam]) — same result
    out_g2, _, _ = bound.step(x_t, k_b, v_b, 0, pad_mask=pad_n,
                              append=False)
    np.testing.assert_allclose(np.asarray(out_g2), np.asarray(out_g),
                               rtol=0, atol=0)
