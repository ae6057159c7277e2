"""Typed configuration layer.

Replaces the reference's two-tier config system — module-global constants in
``global_configs.py`` (modality dims at :10-17, device pin at :4-7, XLNet
injection index at :19) plus the argparse flag block
(``multimodal_driver.py:35-57``) — with unified, serializable dataclasses.
Dataset presets carry their modality dims so the "edit global_configs.py by
hand when switching datasets" footgun (reference README.md:30-56) is gone.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Modality dimensions and identity of one dataset.

    Mirrors global_configs.py:10-17 of the reference (MOSI: acoustic 74,
    visual 47, text 768; MOSEI: visual 35).
    """

    name: str
    acoustic_dim: int
    visual_dim: int
    text_dim: int = 768
    # Split sizes as recorded by the reference's examine.ipynb (cell-3 output);
    # informational only.
    split_sizes: Tuple[int, int, int] = (0, 0, 0)

    @staticmethod
    def mosi() -> "DatasetConfig":
        return DatasetConfig(
            name="mosi", acoustic_dim=74, visual_dim=47, text_dim=768,
            split_sizes=(1281, 229, 685),
        )

    @staticmethod
    def mosei() -> "DatasetConfig":
        return DatasetConfig(
            name="mosei", acoustic_dim=74, visual_dim=35, text_dim=768,
            split_sizes=(16265, 1869, 4643),
        )

    @staticmethod
    def from_name(name: str) -> "DatasetConfig":
        presets = {"mosi": DatasetConfig.mosi, "mosei": DatasetConfig.mosei}
        if name not in presets:
            raise ValueError(
                f"Unknown dataset {name!r}; expected one of {sorted(presets)}"
            )
        return presets[name]()


@dataclasses.dataclass(frozen=True)
class MultimodalConfig:
    """MAG gate hyperparameters (reference MultimodalConfig,
    multimodal_driver.py:76-79, consumed at modeling.py:7-23)."""

    beta_shift: float = 1.0
    dropout_prob: float = 0.5
    # Which encoder layer the gate is injected before. For BERT the reference
    # applies the gate to the embedding output, i.e. before layer 0
    # (bert.py:219); for XLNet before layer 1 (global_configs.py:19,
    # xlnet.py:371-372).
    injection_index: int = 0
    # Use the fused Pallas kernel for the gate when True; plain-JAX otherwise.
    use_fused_kernel: bool = False


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """BERT encoder hyperparameters, matching HF transformers==3.0.2 defaults
    for bert-base-uncased (imported by the reference at bert.py:13-17)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    num_labels: int = 1
    # "einsum" (exact HF semantics incl. attention-prob dropout),
    # "fused" (short-seq Pallas kernel: softmax + prob-dropout in VMEM,
    # recompute backward — no [B,H,S,S] tensors in HBM; ops/
    # fused_attention.py), or "flash" (official Pallas blockwise kernel,
    # O(S) memory, for long sequences; no attention-prob dropout inside
    # the kernel).
    attention_impl: str = "einsum"
    # With attention_impl="fused": also fuse the QKV projection gemm into
    # the attention kernel (qkv = x·W + b computed in VMEM; backward
    # emits dqkv once and does dx = dqkv·Wᵀ in-kernel —
    # ops/fused_attention.py::fused_attention_qkvproj). Opt-in pending
    # hardware timing (tools/exp_qkv_fusion.py). Ignored under TP
    # attention sharding / head_mask / output_attentions (those fall
    # back to the split projection).
    qkv_fusion: bool = False
    # With qkv_fusion: save the VMEM-computed qkv to HBM as a backward
    # residual (True) or recompute the projection in the backward kernel
    # (False — drops the B·S·3D residual entirely).
    qkv_residual: bool = False
    # Tensor-parallel attention: when set (a jax.sharding.Mesh with a
    # "model" axis), self-attention shards heads over that axis — the
    # fused kernel via shard_map, the einsum path via GSPMD sharding
    # constraints (parallel/tp.py). None = attention replicated over the
    # model axis (FFN-only TP).
    tp_attention_mesh: Optional[object] = dataclasses.field(
        default=None, repr=False, compare=False)

    @staticmethod
    def bert_base_uncased() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def bert_large_uncased() -> "BertConfig":
        return BertConfig(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096,
        )

    @staticmethod
    def tiny(vocab_size: int = 128) -> "BertConfig":
        """Small config for tests."""
        return BertConfig(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
        )


@dataclasses.dataclass(frozen=True)
class XLNetConfig:
    """XLNet hyperparameters, matching HF transformers==3.0.2 defaults for
    xlnet-base-cased (imported by the reference at xlnet.py:8-12)."""

    vocab_size: int = 32000
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    d_inner: int = 3072
    ff_activation: str = "gelu"
    dropout: float = 0.1
    mem_len: Optional[int] = None
    reuse_len: Optional[int] = None
    attn_type: str = "bi"
    same_length: bool = False
    bi_data: bool = False
    clamp_len: int = -1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # SequenceSummary settings (HF XLNetConfig: summary_type="last",
    # summary_use_proj=True, summary_activation="tanh",
    # summary_last_dropout=0.1).
    summary_last_dropout: float = 0.1
    num_labels: int = 1
    # "einsum" (reference math via XLA) or "fused" (Pallas rel-attention
    # kernel for the content stream: in-VMEM softmax + prob-dropout,
    # ebias-streamed scores — ops/fused_attention.py::fused_rel_attention)
    attention_impl: str = "einsum"
    # Fused-path score-bias assembly: "stream" materializes the [B,H,Q,K]
    # ebias in XLA and streams it through HBM; "inkernel" hands the raw
    # ingredients to the kernel, which assembles bd/rel-shift/segment/mask
    # in VMEM (ops/fused_attention.py::fused_rel_attention_ingredients).
    # "inkernel" applies to the bi-attention content path, incl. under
    # tensor parallelism (shard_map'd wrapper); bi_data and uni attention
    # fall back to "stream" forms (per-example position streams / P < Q+K).
    # "auto" (default) keeps the long-validated stream assembly wherever
    # the full-H ebias kernel fits (measured neutral there) and switches
    # to the ingredients flash-streamed tier past it — the long-S
    # geometry where host-side rel_shift assembly is ~70% relayout and
    # the in-VMEM assembly measured ~2x end to end (BENCHMARKS.md
    # "Ingredients flash-streamed tier").
    rel_bias_impl: str = "auto"
    # Pack the q/k/v projection into one [D, 3·H·Dh] dot when mems is
    # None and attention is not head-sharded (models/xlnet.py) — same
    # per-element math as the three split dots. Measured NEGATIVE at
    # xlnet-base b256 (2538 vs 2638 ex/s, −3.8%: the weight concat +
    # downstream lane slices cost more than the larger dot saves —
    # BENCHMARKS.md "XLNet step attribution"); opt-in, off by default.
    pack_qkv: bool = False

    def __post_init__(self):
        # A typo'd impl string would otherwise silently select the
        # default path and mislabel benchmarks/runs.
        if self.attention_impl not in ("einsum", "fused"):
            raise ValueError(
                f"unknown attention_impl {self.attention_impl!r} "
                "(XLNet: einsum | fused)")
        if self.rel_bias_impl not in ("auto", "stream", "inkernel"):
            raise ValueError(
                f"unknown rel_bias_impl {self.rel_bias_impl!r} "
                "(auto | stream | inkernel)")
    # Tensor-parallel attention mesh (see BertConfig.tp_attention_mesh):
    # routes the fused rel-attention kernel through shard_map with heads
    # sharded over the "model" axis. The einsum path needs no mesh here —
    # GSPMD propagates the P(None, "model") weight shardings on its own.
    tp_attention_mesh: Optional[object] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    @staticmethod
    def xlnet_base_cased() -> "XLNetConfig":
        return XLNetConfig()

    @staticmethod
    def tiny(vocab_size: int = 128) -> "XLNetConfig":
        return XLNetConfig(
            vocab_size=vocab_size, d_model=32, n_layer=2, n_head=2, d_inner=64,
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for SPMD execution.

    The reference is single-device (global_configs.py:4-7); here data
    parallelism is first-class (SURVEY §2d) with hooks for a model axis.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 means "all available devices" on that axis.
    data_parallel: int = -1
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Trainer flags; defaults mirror the reference argparse block
    (multimodal_driver.py:35-57)."""

    dataset: str = "mosi"
    max_seq_length: int = 50
    train_batch_size: int = 48
    dev_batch_size: int = 128
    test_batch_size: int = 128
    n_epochs: int = 40
    beta_shift: float = 1.0
    dropout_prob: float = 0.5
    model: str = "bert-base-uncased"
    learning_rate: float = 1e-5
    gradient_accumulation_step: int = 1
    warmup_proportion: float = 0.1
    seed: int = 42
    weight_decay: float = 0.01
    # TPU-native knobs (no reference counterpart):
    compute_dtype: str = "float32"  # "bfloat16" on real TPU runs
    use_fused_mag: bool = False
    checkpoint_dir: Optional[str] = None

    @property
    def dataset_config(self) -> DatasetConfig:
        return DatasetConfig.from_name(self.dataset)

    @property
    def multimodal_config(self) -> MultimodalConfig:
        injection = 1 if self.model.startswith("xlnet") else 0
        return MultimodalConfig(
            beta_shift=self.beta_shift,
            dropout_prob=self.dropout_prob,
            injection_index=injection,
            use_fused_kernel=self.use_fused_mag,
        )

    @property
    def jnp_compute_dtype(self):
        return {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
        }[self.compute_dtype]


def dtype_from_str(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16}[name]
