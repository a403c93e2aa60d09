"""Branchformer encoder with SummaryMixing (and MHA / RelPos / HyperMixing /
cnn-only) token-mixing branch.

Capability parity with reference Branchformer.py:100-491:
- Two parallel branches on the same input: token mixing (norm_mhsa -> mixer
  -> dropout) and cgMLP (norm_conv -> ConvolutionBranch -> dropout), merged by
  a projection and added residually (reference :243-281).
- With SummaryMixing, the merge projection is a deep trailing-activation MLP
  (SummaryNet) of dims summary_hid_dim + [d_model] over the concatenated
  [summary_out_dim + d_model] features (reference :211-226, requires
  local_proj_out_dim == d_model for the shapes to line up, as in all recipes);
  for other mixers it is a single Linear(2*d_model -> d_model).
- Stack applies a final LayerNorm with eps 1e-6 (reference :445).
- Dynamic Chunk Training is rejected like the reference (:469-471), but a
  [T, T] sum/attention mask restricting context IS supported.

Example (mirrors the reference doctest, Branchformer.py:148-156):

    >>> import jax, jax.numpy as jnp
    >>> from summarymixing_tpu.models.branchformer import BranchformerEncoder
    >>> enc = BranchformerEncoder(num_layers=2, d_model=32, nhead=1,
    ...     csgu_linear_units=64, kernel_size=5,
    ...     local_proj_hid_dim=(16,), local_proj_out_dim=32,
    ...     summary_hid_dim=(16,), summary_out_dim=16)
    >>> x = jnp.ones((2, 12, 32))
    >>> params = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(params, x).shape
    (2, 12, 32)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from summarymixing_tpu.ops.convolution import ConvolutionBranch
from summarymixing_tpu.ops.linear import SummaryNet, gelu_exact
from summarymixing_tpu.models.mixers import apply_mixer, make_mixer

Array = jax.Array


class BranchformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    kernel_size: int = 31
    dropout_rate: float = 0.0
    attention_type: str = "SummaryMixing"
    csgu_linear_units: int = 3072
    gate_activation: Callable = lambda x: x
    use_linear_after_conv: bool = False
    act_int8: bool = False  # W8A8 cgMLP projections (ops/quant.py)
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    summary_out_dim: int = 1024
    mode: str = "SummaryMixing"
    activation: Callable = gelu_exact
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.attention_type != "cnnonly":
            self.mixer = make_mixer(
                self.attention_type,
                self.d_model,
                self.nhead,
                self.dropout_rate,
                local_proj_hid_dim=self.local_proj_hid_dim,
                local_proj_out_dim=self.local_proj_out_dim,
                summary_hid_dim=self.summary_hid_dim,
                summary_out_dim=self.summary_out_dim,
                mode=self.mode,
                activation=self.activation,
                name="mixer",
                **common,
            )
            if self.attention_type == "SummaryMixing":
                # Deep merge MLP (reference Branchformer.py:221-226). Shapes
                # require local_proj_out_dim == d_model (true in all recipes).
                self.merge_proj = SummaryNet(
                    features=tuple(self.summary_hid_dim) + (self.d_model,),
                    activation=self.activation,
                    name="merge_proj",
                    **common,
                )
            else:
                self.merge_proj = nn.Dense(self.d_model, name="merge_proj", **common)
            self.norm_mhsa = nn.LayerNorm(epsilon=1e-5, name="norm_mhsa", **common)
        self.convolution_branch = ConvolutionBranch(
            input_size=self.d_model,
            linear_units=self.csgu_linear_units,
            kernel_size=self.kernel_size,
            activation=self.activation,
            gate_activation=self.gate_activation,
            dropout_rate=self.dropout_rate,
            use_linear_after_conv=self.use_linear_after_conv,
            act_int8=self.act_int8,
            name="convolution_branch",
            **common,
        )
        self.norm_conv = nn.LayerNorm(epsilon=1e-5, name="norm_conv", **common)
        self.dropout = nn.Dropout(rate=self.dropout_rate)

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if self.attention_type == "cnnonly":
            x2 = self.dropout(
                self.convolution_branch(
                    self.norm_conv(x), pad_mask=pad_mask, deterministic=deterministic
                ),
                deterministic=deterministic,
            )
            return x + x2
        x1 = apply_mixer(
            self.mixer,
            self.attention_type,
            self.norm_mhsa(x),
            attn_mask=src_mask,
            pad_mask=pad_mask,
            pos_embs=pos_embs,
            deterministic=deterministic,
        )
        x1 = self.dropout(x1, deterministic=deterministic)
        x2 = self.dropout(
            self.convolution_branch(
                self.norm_conv(x), pad_mask=pad_mask, deterministic=deterministic
            ),
            deterministic=deterministic,
        )
        merged = self.merge_proj(jnp.concatenate([x1, x2], axis=-1))
        return x + self.dropout(merged, deterministic=deterministic)


class BranchformerEncoder(nn.Module):
    """Stack of BranchformerEncoderLayer + final LayerNorm.

    scan_layers=True stacks the (structurally identical) layers with
    nn.scan — params get a leading [num_layers] axis and the layer body is
    traced ONCE, cutting compile time ~num_layers-fold (the remote-compile
    path in some environments takes minutes per trace; see CLAUDE.md).
    Numerics are identical to the unrolled loop; only the param-tree layout
    differs (layer_i/... vs layers/...[i])."""

    num_layers: int
    d_model: int
    nhead: int
    kernel_size: int = 31
    dropout_rate: float = 0.0
    attention_type: str = "SummaryMixing"
    csgu_linear_units: int = 3072
    gate_activation: Callable = lambda x: x
    use_linear_after_conv: bool = False
    act_int8: bool = False  # W8A8 cgMLP projections (ops/quant.py)
    local_proj_hid_dim: Sequence[int] = (512,)
    local_proj_out_dim: int = 512
    summary_hid_dim: Sequence[int] = (1024,)
    summary_out_dim: int = 1024
    mode: str = "SummaryMixing"
    activation: Callable = gelu_exact
    scan_layers: bool = False
    remat: bool = False
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    def _layer_kwargs(self):
        return dict(
            d_model=self.d_model,
            nhead=self.nhead,
            kernel_size=self.kernel_size,
            dropout_rate=self.dropout_rate,
            attention_type=self.attention_type,
            csgu_linear_units=self.csgu_linear_units,
            gate_activation=self.gate_activation,
            use_linear_after_conv=self.use_linear_after_conv,
            act_int8=self.act_int8,
            local_proj_hid_dim=self.local_proj_hid_dim,
            local_proj_out_dim=self.local_proj_out_dim,
            summary_hid_dim=self.summary_hid_dim,
            summary_out_dim=self.summary_out_dim,
            mode=self.mode,
            activation=self.activation,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    @nn.compact
    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        pad_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if self.attention_type == "RelPosMHAXL" and pos_embs is None:
            raise ValueError("RelPosMHAXL requires pos_embs [1, 2T-1, D]")
        # remat: recompute each layer's activations in the backward pass
        # instead of keeping them live — peak activation memory drops from
        # O(num_layers * T) to O(T) for one extra forward's FLOPs (the
        # standard jax.checkpoint memory/compute trade; longest-utterance
        # training and >18-layer variants fit in HBM this way). Forward is
        # bit-identical; grads match up to float reassociation
        # (tests/test_models.py::test_remat_bitwise_identical).
        layer_cls = (nn.remat(BranchformerEncoderLayer, static_argnums=(5,))
                     if self.remat else BranchformerEncoderLayer)
        if self.scan_layers:
            def body(layer, carry, _):
                return layer(
                    carry, src_mask, pad_mask, pos_embs, deterministic
                ), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
            )
            x, _ = scan(
                layer_cls(**self._layer_kwargs(), name="layers"),
                x, None,
            )
        else:
            for i in range(self.num_layers):
                x = layer_cls(
                    **self._layer_kwargs(), name=f"layer_{i}"
                )(x, src_mask, pad_mask, pos_embs, deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="norm")(x)
