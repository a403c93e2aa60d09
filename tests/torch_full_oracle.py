"""Clean-room PyTorch build of the reference flagship model
(CNN -> Branchformer-SummaryMixing -> Transformer decoder -> heads), used
ONLY as a conversion/parity oracle (tests/test_convert_full.py).

It is assembled from standard torch modules following the reference
TOPOLOGY and state-dict NAMING (module attribute names read from the
vendored sources: TransformerASR.py:349-357, Branchformer.py:184-241,
Transformer.py:743-772, summary_mixing.py:112-157, VanillaNN.py) — no
reference code is copied. `model.state_dict()` therefore has the same key
layout as a real SpeechBrain `model.ckpt`, which is exactly what
utils/convert.py::convert_full_model consumes."""

from __future__ import annotations

import math

import torch
import torch.nn as nn


class SBLinear(nn.Module):
    """speechbrain.nnet.linear.Linear: torch Linear at attr `w`."""

    def __init__(self, n_in, n_out, bias=True):
        super().__init__()
        self.w = nn.Linear(n_in, n_out, bias=bias)

    def forward(self, x):
        return self.w(x)


class SBLayerNorm(nn.Module):
    """speechbrain.nnet.normalization.LayerNorm: torch LayerNorm at `norm`."""

    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps=eps)

    def forward(self, x):
        return self.norm(x)


class VanillaNNTorch(nn.Module):
    """Reference VanillaNN (n_split=1): sb Sequential of Linear blocks named
    `linear`, `linear_0`, ... with TRAILING activation after every layer
    including the last (VanillaNN.py:196)."""

    def __init__(self, in_dim, dims):
        super().__init__()
        self.block_names = []
        d = in_dim
        for i, out in enumerate(dims):
            name = "linear" if i == 0 else f"linear_{i - 1}"
            setattr(self, name, SBLinear(d, out))
            self.block_names.append(name)
            d = out

    def forward(self, x):
        for name in self.block_names:
            x = torch.nn.functional.gelu(getattr(self, name)(x))
        return x


class SummaryMixingTorch(nn.Module):
    """Full-mode cell (summary_mixing.py:112-127,190-239), nhead=1."""

    def __init__(self, enc_dim, hid, local_out, sum_hid, sum_out):
        super().__init__()
        self.local_proj = VanillaNNTorch(enc_dim, list(hid) + [local_out])
        self.summary_proj = VanillaNNTorch(enc_dim, list(sum_hid) + [sum_out])
        self.summary_local_merging = VanillaNNTorch(
            local_out + sum_out, [sum_out])

    def forward(self, x):
        local = self.local_proj(x)
        summ = self.summary_proj(x)
        mean = summ.mean(dim=1, keepdim=True).expand(-1, x.shape[1], -1)
        return self.summary_local_merging(
            torch.cat([local, mean], dim=-1))


class CSGUTorch(nn.Module):
    """ConvolutionalSpatialGatingUnit: half-split, LN -> depthwise conv,
    identity gate activation, elementwise product."""

    def __init__(self, input_size, kernel_size):
        super().__init__()
        half = input_size // 2
        self.norm = SBLayerNorm(half)
        self.conv = nn.Conv1d(half, half, kernel_size,
                              padding=kernel_size // 2, groups=half)

    def forward(self, x):
        x_res, x_gate = x.chunk(2, dim=-1)
        g = self.norm(x_gate).transpose(1, 2)
        g = self.conv(g).transpose(1, 2)
        return x_res * g


class ConvolutionBranchTorch(nn.Module):
    def __init__(self, d_model, linear_units, kernel_size):
        super().__init__()
        self.pre_channel_proj = nn.Linear(d_model, linear_units)
        self.post_channel_proj = nn.Linear(linear_units // 2, d_model)
        self.csgu = CSGUTorch(linear_units, kernel_size)

    def forward(self, x):
        x = torch.nn.functional.gelu(self.pre_channel_proj(x))
        return self.post_channel_proj(self.csgu(x))


class BranchformerLayerTorch(nn.Module):
    def __init__(self, d_model, hid, local_out, sum_hid, sum_out,
                 csgu_units, kernel_size):
        super().__init__()
        self.mha_layer = SummaryMixingTorch(d_model, hid, local_out,
                                            sum_hid, sum_out)
        # the mixing branch's output dim is sum_out (the cell's merging
        # MLP output — SummaryMixingTorch above), NOT local_out; the two
        # coincide in every current parity config, but the formula must
        # not rely on that
        self.merge_proj = VanillaNNTorch(sum_out + d_model,
                                         list(sum_hid) + [d_model])
        self.norm_mhsa = SBLayerNorm(d_model)
        self.convolution_branch = ConvolutionBranchTorch(
            d_model, csgu_units, kernel_size)
        self.norm_conv = SBLayerNorm(d_model)

    def forward(self, x):
        x1 = self.mha_layer(self.norm_mhsa(x))
        x2 = self.convolution_branch(self.norm_conv(x))
        return x + self.merge_proj(torch.cat([x1, x2], dim=-1))


class BranchformerEncoderTorch(nn.Module):
    def __init__(self, n_layers, **kw):
        super().__init__()
        self.layers = nn.ModuleList(
            [BranchformerLayerTorch(**kw) for _ in range(n_layers)])
        self.norm = SBLayerNorm(kw["d_model"], eps=1e-6)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)


class SBMha(nn.Module):
    """speechbrain MultiheadAttention: torch MHA at attr `att`."""

    def __init__(self, d_model, nhead):
        super().__init__()
        self.att = nn.MultiheadAttention(d_model, nhead, batch_first=True)

    def forward(self, q, k, v, attn_mask=None):
        out, _ = self.att(q, k, v, attn_mask=attn_mask, need_weights=False)
        return out


class PosFFNTorch(nn.Module):
    """PositionalwiseFeedForward: `.ffn` Sequential(Linear, act, Drop, Linear)."""

    def __init__(self, d_model, d_ffn):
        super().__init__()
        self.ffn = nn.Sequential(nn.Linear(d_model, d_ffn), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(d_ffn, d_model))

    def forward(self, x):
        return self.ffn(x)


class DecoderLayerTorch(nn.Module):
    """Pre-norm decoder layer (Transformer.py:743-830, normalize_before
    True per the recipes)."""

    def __init__(self, d_model, nhead, d_ffn):
        super().__init__()
        self.self_attn = SBMha(d_model, nhead)
        self.multihead_attn = SBMha(d_model, nhead)
        self.pos_ffn = PosFFNTorch(d_model, d_ffn)
        self.norm1 = SBLayerNorm(d_model, eps=1e-6)
        self.norm2 = SBLayerNorm(d_model, eps=1e-6)
        self.norm3 = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, x, memory, causal_mask):
        t1 = self.norm1(x)
        x = x + self.self_attn(t1, t1, t1, attn_mask=causal_mask)
        t1 = self.norm2(x)
        x = x + self.multihead_attn(t1, memory, memory)
        t1 = self.norm3(x)
        return x + self.pos_ffn(t1)


class DecoderTorch(nn.Module):
    def __init__(self, n_layers, d_model, nhead, d_ffn):
        super().__init__()
        self.layers = nn.ModuleList(
            [DecoderLayerTorch(d_model, nhead, d_ffn) for _ in range(n_layers)])
        self.norm = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, x, memory, causal_mask):
        for layer in self.layers:
            x = layer(x, memory, causal_mask)
        return self.norm(x)


class SBEmbedding(nn.Module):
    def __init__(self, vocab, d_model):
        super().__init__()
        self.Embedding = nn.Embedding(vocab, d_model)

    def forward(self, x):
        return self.Embedding(x)


class NormalizedEmbeddingTorch(nn.Module):
    def __init__(self, d_model, vocab):
        super().__init__()
        self.emb = SBEmbedding(vocab, d_model)
        self.d_model = d_model

    def forward(self, x):
        return self.emb(x) * math.sqrt(self.d_model)


class ConvBlockTorch(nn.Module):
    """One frontend block: Conv2d stride 2 (symmetric k//2 padding, the sb
    "same" for strided convs) -> LayerNorm over channels -> LeakyReLU."""

    def __init__(self, cin, cout, k=3, s=2):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=k // 2)
        self.norm = nn.LayerNorm(cout)
        self.act = nn.LeakyReLU()

    def forward(self, x):  # x [B, C, T, F]
        x = self.conv(x)
        x = x.permute(0, 2, 3, 1)        # [B, T, F, C]
        x = self.act(self.norm(x))
        return x.permute(0, 3, 1, 2)


class CNNTorch(nn.Module):
    def __init__(self, channels=(8, 4)):
        super().__init__()
        blocks, cin = [], 1
        for c in channels:
            blocks.append(ConvBlockTorch(cin, c))
            cin = c
        self.blocks = nn.ModuleList(blocks)

    def forward(self, feats):  # [B, T, F]
        x = feats[:, None]     # [B, 1, T, F]
        for blk in self.blocks:
            x = blk(x)
        # -> [B, T', F'*C] flattened freq-major like the flax frontend
        return x.permute(0, 2, 3, 1).flatten(2)


def sinusoid_table_torch(length, dim):
    pos = torch.arange(length, dtype=torch.float32)[:, None]
    inv = torch.exp(torch.arange(0, dim, 2, dtype=torch.float32)
                    * -(math.log(10000.0) / dim))
    ang = pos * inv[None]
    pe = torch.zeros(length, dim)
    pe[:, 0::2] = torch.sin(ang)
    pe[:, 1::2] = torch.cos(ang)
    return pe


class TransformerASRTorch(nn.Module):
    """Reference TransformerASR topology with SpeechBrain attr names."""

    def __init__(self, input_size, d_model, nhead, n_enc, n_dec, d_ffn,
                 vocab, hid, local_out, sum_hid, sum_out, csgu_units,
                 kernel_size):
        super().__init__()
        self.d_model = d_model
        self.custom_src_module = nn.ModuleList(
            [SBLinear(input_size, d_model)])
        self.encoder = BranchformerEncoderTorch(
            n_enc, d_model=d_model, hid=hid, local_out=local_out,
            sum_hid=sum_hid, sum_out=sum_out, csgu_units=csgu_units,
            kernel_size=kernel_size)
        self.custom_tgt_module = nn.ModuleList(
            [NormalizedEmbeddingTorch(d_model, vocab)])
        self.decoder = DecoderTorch(n_dec, d_model, nhead, d_ffn)

    def encode(self, src):
        x = self.custom_src_module[0](src)
        x = x + sinusoid_table_torch(x.shape[1], self.d_model)[None]
        return self.encoder(x)

    def decode(self, tgt, enc_out):
        u = tgt.shape[1]
        x = self.custom_tgt_module[0](tgt)
        x = x + sinusoid_table_torch(u, self.d_model)[None]
        causal = torch.triu(torch.ones(u, u, dtype=torch.bool), diagonal=1)
        return self.decoder(x, enc_out, causal)


def build_oracle(input_size=40, d_model=16, nhead=2, n_enc=2, n_dec=1,
                 d_ffn=24, vocab=12, hid=(8,), local_out=16, sum_hid=(8,),
                 sum_out=16, csgu_units=16, kernel_size=5,
                 frontend_channels=(4, 2), seed=0):
    """Full ModuleList model [CNN, Transformer, seq_lin, ctc_lin] like the
    recipe's `model:` object (yaml:214-215)."""
    torch.manual_seed(seed)
    asr = TransformerASRTorch(input_size, d_model, nhead, n_enc, n_dec,
                              d_ffn, vocab, hid, local_out, sum_hid,
                              sum_out, csgu_units, kernel_size)
    model = nn.ModuleList([
        CNNTorch(frontend_channels),
        asr,
        SBLinear(d_model, vocab),   # seq_lin
        SBLinear(d_model, vocab),   # ctc_lin
    ])
    model.eval()
    return model


@torch.no_grad()
def oracle_forward(model, feats, tokens_bos):
    """feats [B, T, F] float32, tokens_bos [B, U] int64 ->
    (enc_out, ctc_log_probs, seq_log_probs) as numpy."""
    cnn, asr, seq_lin, ctc_lin = model
    src = cnn(torch.as_tensor(feats))
    enc = asr.encode(src)
    ctc_lp = torch.log_softmax(ctc_lin(enc), dim=-1)
    dec = asr.decode(torch.as_tensor(tokens_bos), enc)
    seq_lp = torch.log_softmax(seq_lin(dec), dim=-1)
    return (enc.numpy(), ctc_lp.numpy(), seq_lp.numpy())


# --------------------------------------------------------------------------
# Conformer-transducer oracle (reference transducer yaml:369-370 model list)
# --------------------------------------------------------------------------


class SummaryMixingFastTorch(nn.Module):
    """-fast mode (summary_mixing.py:129-143,241-284): one fused projection
    split in two halves."""

    def __init__(self, enc_dim, local_out, sum_out):
        super().__init__()
        self.local_out = local_out
        self.global_proj = VanillaNNTorch(enc_dim, [2 * local_out])
        self.summary_local_merging = VanillaNNTorch(2 * local_out, [sum_out])

    def forward(self, x):
        gp = self.global_proj(x)
        local, summ = gp[..., : self.local_out], gp[..., self.local_out:]
        mean = summ.mean(dim=1, keepdim=True).expand(-1, x.shape[1], -1)
        return self.summary_local_merging(torch.cat([local, mean], dim=-1))


class ConformerConvModuleTorch(nn.Module):
    def __init__(self, d_model, kernel_size):
        super().__init__()
        self.layer_norm = nn.LayerNorm(d_model)
        self.bottleneck = nn.Sequential(
            nn.Conv1d(d_model, 2 * d_model, kernel_size=1), nn.GLU(dim=1))
        self.conv = nn.Conv1d(d_model, d_model, kernel_size,
                              padding=(kernel_size - 1) // 2, groups=d_model)
        self.after_conv = nn.Sequential(
            nn.LayerNorm(d_model), nn.GELU(), nn.Linear(d_model, d_model),
            nn.Dropout(0.0))

    def forward(self, x):
        out = self.layer_norm(x).transpose(1, 2)
        out = self.bottleneck(out)
        out = self.conv(out).transpose(1, 2)
        return self.after_conv(out)


class ConformerLayerTorch(nn.Module):
    def __init__(self, d_model, d_ffn, local_out, kernel_size):
        super().__init__()
        self.ffn_module1 = nn.Sequential(
            nn.LayerNorm(d_model), PosFFNTorch(d_model, d_ffn),
            nn.Dropout(0.0))
        self.ffn_module2 = nn.Sequential(
            nn.LayerNorm(d_model), PosFFNTorch(d_model, d_ffn),
            nn.Dropout(0.0))
        self.mha_layer = SummaryMixingFastTorch(d_model, local_out, d_model)
        self.convolution_module = ConformerConvModuleTorch(d_model,
                                                           kernel_size)
        self.norm1 = SBLayerNorm(d_model)
        self.norm2 = SBLayerNorm(d_model)

    def forward(self, x):
        x = x + 0.5 * self.ffn_module1(x)
        skip = x
        x = self.mha_layer(self.norm1(x)) + skip
        x = x + self.convolution_module(x)
        return self.norm2(x + 0.5 * self.ffn_module2(x))


class ConformerEncoderTorch(nn.Module):
    def __init__(self, n_layers, d_model, d_ffn, local_out, kernel_size):
        super().__init__()
        self.layers = nn.ModuleList([
            ConformerLayerTorch(d_model, d_ffn, local_out, kernel_size)
            for _ in range(n_layers)])
        self.norm = SBLayerNorm(d_model, eps=1e-6)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)


class TransducerEncTorch(nn.Module):
    """EncoderWrapper(TransformerASR) with a conformer encoder
    (TransformerASR.py:687: attr `transformer`)."""

    def __init__(self, input_size, d_model, n_layers, d_ffn, local_out,
                 kernel_size):
        super().__init__()

        class _Inner(nn.Module):
            def __init__(inner):
                super().__init__()
                inner.d_model = d_model
                inner.custom_src_module = nn.ModuleList(
                    [SBLinear(input_size, d_model)])
                inner.encoder = ConformerEncoderTorch(
                    n_layers, d_model, d_ffn, local_out, kernel_size)

            def encode(inner, src):
                x = inner.custom_src_module[0](src)
                x = x + sinusoid_table_torch(x.shape[1], d_model)[None]
                return inner.encoder(x)

        self.transformer = _Inner()

    def forward(self, src):
        return self.transformer.encode(src)


class SBLSTM(nn.Module):
    """speechbrain.nnet.RNN.LSTM: torch nn.LSTM at attr `rnn`."""

    def __init__(self, input_size, hidden):
        super().__init__()
        self.rnn = nn.LSTM(input_size, hidden, batch_first=True)

    def forward(self, x):
        out, _ = self.rnn(x)
        return out


def build_transducer_oracle(input_size=40, d_model=16, n_layers=2, d_ffn=24,
                            local_out=16, kernel_size=5, vocab=10,
                            dec_dim=12, joint_dim=20,
                            frontend_channels=(4, 2), seed=0):
    torch.manual_seed(seed)
    model = nn.ModuleList([
        CNNTorch(frontend_channels),                       # 0 CNN
        TransducerEncTorch(input_size, d_model, n_layers, d_ffn,
                           local_out, kernel_size),        # 1 enc
        nn.Identity(),                                     # 2 emb (one-hot)
        SBLSTM(vocab - 1, dec_dim),                        # 3 dec
        SBLinear(d_model, joint_dim, bias=False),          # 4 proj_enc
        SBLinear(dec_dim, joint_dim, bias=False),          # 5 proj_dec
        SBLinear(joint_dim, vocab),                        # 6 proj_ctc
        SBLinear(joint_dim, vocab, bias=False),            # 7 transducer_lin
    ])
    model.eval()
    return model


@torch.no_grad()
def transducer_oracle_forward(model, feats, tokens_bos, vocab, blank_id=0):
    """-> (enc_out, joint_log_probs [B,T,U+1,V], ctc_log_probs) numpy."""
    cnn, enc, _, dec, proj_enc, proj_dec, proj_ctc, td_lin = model
    src = cnn(torch.as_tensor(feats))
    enc_out = enc(src)
    ep = proj_enc(enc_out)
    toks = torch.as_tensor(tokens_bos)
    oh = torch.nn.functional.one_hot(toks, vocab).float()
    oh = torch.cat([oh[..., :blank_id], oh[..., blank_id + 1:]], dim=-1)
    dp = proj_dec(dec(oh))
    joint = torch.nn.functional.gelu(ep[:, :, None] + dp[:, None])
    lp = torch.log_softmax(td_lin(joint), dim=-1)
    ctc = torch.log_softmax(proj_ctc(ep), dim=-1)
    return enc_out.numpy(), lp.numpy(), ctc.numpy()
