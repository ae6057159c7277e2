"""Tensor (model-axis) parallelism: parameter sharding rules.

The reference is single-device (SURVEY §2d) — TP is a capability this
framework adds for scaling past one chip's FLOPs (bert-large and up).
v1 shards the FFN of both model families Megatron-style over the mesh's
``model`` axis and lets XLA's SPMD partitioner insert the collectives:

  * first FFN matmul column-parallel — kernel ``[D, 4D]`` becomes
    ``P(None, "model")``, bias ``P("model")``; the ``[B, S, 4D]``
    activation comes out sharded on its last dim, GELU stays local;
  * second FFN matmul row-parallel — kernel ``[4D, D]`` becomes
    ``P("model", None)``; the contraction is sharded, XLA emits one
    psum over ICI per layer to rebuild the replicated residual.

By default everything else (embeddings, attention, MAG, heads,
LayerNorms) stays replicated, so the fused Pallas attention kernels keep
working unchanged (their operands are replicated over ``model`` and
sharded over ``data`` exactly as in plain DP). The FFN is ~2/3 of encoder
FLOPs, so that already splits the bulk of per-chip compute.

With ``shard_attention`` (CLI ``--tp_shard_attention``) attention is
head-sharded too, for BOTH families and BOTH attention impls: the einsum
paths through GSPMD (weight shardings below + the sharding constraints in
models/bert.py), the fused Pallas kernels through shard_map over the
model axis (ops/fused_attention.py TP wrappers; pallas_call is opaque to
GSPMD, so the kernels are explicitly mapped with H/mp local heads each).
Set ``{Bert,XLNet}Config.tp_attention_mesh`` to the mesh to activate the
model-side constraints/shard_map (the driver does this).

The rules key on parameter paths:
  BERT  — ``encoder/layer_i/intermediate_dense`` (column) and the
          layer-level ``output_dense`` (row; the attention-internal
          ``attention/output_dense`` is excluded and replicated) —
          models/bert.py::BertLayer.
  XLNet — ``layer_i/ff/layer_1`` (column) and ``ff/layer_2`` (row) —
          models/xlnet.py::XLNetFeedForward.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bert_multimodal_transformer_tpu.parallel.mesh import MODEL_AXIS


def tp_pspec_for_path(path: str, *, shard_attention: bool = False) -> P:
    """PartitionSpec for one parameter (or optimizer-moment) leaf.

    ``path`` is ``jax.tree_util.keystr`` of the leaf's path — optimizer
    moments (mu/nu) mirror the param tree, so the same suffix rules
    apply wherever the leaf sits in the state pytree.

    ``shard_attention`` additionally head-shards attention:

      * XLNet rel-attention weights get P(None, "model") — clean through
        GSPMD because the flat ``[D, H·Dh]`` packing is head-major, so a
        contiguous model-axis chunk is whole heads; the fused kernel runs
        under shard_map via ``XLNetConfig.tp_attention_mesh``.
      * BERT's attention OUTPUT projection ``[D, D]`` goes row-parallel
        (rows are head-major flat — whole heads per chunk); the packed
        ``[D, 3D]`` qkv kernel stays replicated because its q|k|v column
        blocks cannot be head-aligned by one contiguous chunk — the
        attention COMPUTE is still head-sharded via the
        ``BertConfig.tp_attention_mesh`` sharding constraints /
        shard_map'd fused kernel (models/bert.py).

    Requires n_head divisible by the model-axis size.
    """
    ffn_in = ("['intermediate_dense']" in path
              or "['ff']['layer_1']" in path)
    ffn_out = (("['output_dense']" in path
                and "['attention']" not in path)
               or "['ff']['layer_2']" in path)
    if ffn_in and path.endswith("['kernel']"):
        return P(None, MODEL_AXIS)
    if ffn_in and path.endswith("['bias']"):
        return P(MODEL_AXIS)
    if ffn_out and path.endswith("['kernel']"):
        return P(MODEL_AXIS, None)
    if shard_attention and "['rel_attn']" in path:
        # q/k/v/r: column-parallel on the flat head axis; o: row-parallel
        # (its contraction axis IS the flat head axis, also axis 1).
        if path.endswith(("['q']", "['k']", "['v']", "['r']", "['o']")):
            return P(None, MODEL_AXIS)
        if path.endswith(("['r_w_bias']", "['r_r_bias']", "['r_s_bias']")):
            return P(MODEL_AXIS, None)             # [H, Dh] — shard heads
        if path.endswith("['seg_embed']"):
            return P(None, MODEL_AXIS, None)       # [2, H, Dh]
    if (shard_attention and "['attention']['output_dense']" in path
            and path.endswith("['kernel']")):
        return P(MODEL_AXIS, None)  # bias added after the psum: replicated
    # ffn_out bias is added AFTER the psum — replicated, like the rest
    return P()


def make_state_shardings(state: Any, mesh: Mesh, *,
                         shard_attention: bool = False) -> Any:
    """NamedSharding pytree for a TrainState (params + optimizer moments
    sharded per tp rules, everything else replicated)."""

    def leaf_sharding(path, leaf):
        del leaf
        spec = tp_pspec_for_path(
            jax.tree_util.keystr(path),
            shard_attention=shard_attention)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
