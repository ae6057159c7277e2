"""Attention primitives shared by the BERT and XLNet encoders.

The reference gets its attention math from HF transformers 3.0.2
(BertSelfAttention via bert.py:17; XLNetRelativeAttention via xlnet.py:9).
Here the scaled-dot-product core is one function, computed with fp32
softmax accumulation so bf16 compute runs keep softmax numerics stable, and
expressed as einsums XLA maps directly onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,              # [B, H, Sq, Dh]
    k: jax.Array,              # [B, H, Sk, Dh]
    v: jax.Array,              # [B, H, Sk, Dh]
    bias: Optional[jax.Array],  # additive, broadcastable to [B, H, Sq, Sk]
    *,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    head_mask: Optional[jax.Array] = None,  # [H] or broadcastable, 1=keep
    return_probs: bool = False,
):
    """Masked scaled-dot-product attention with fp32 softmax.

    Matches HF BertSelfAttention semantics: scores = QKᵀ·scale + bias
    (bias is the additive −10000-style extended mask), softmax, dropout on
    the probabilities, optional multiplicative head_mask (HF get_head_mask
    contract, reference bert.py:208-209), then context = probs·V.
    With ``return_probs`` also returns the (post-dropout, post-head-mask)
    fp32 attention probabilities — the reference's output_attentions
    surface (bert.py:233-237).
    """
    dtype = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    if head_mask is not None:
        probs = probs * head_mask.astype(probs.dtype).reshape(1, -1, 1, 1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v)
    if return_probs:
        return ctx, probs
    return ctx


def extended_attention_mask(attention_mask: jax.Array,
                            dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} mask → additive [B, 1, 1, S] with (1−m)·−10000.

    Exact semantics of HF ``get_extended_attention_mask`` used by the
    reference at bert.py:180-182.
    """
    m = attention_mask.astype(dtype)
    return ((1.0 - m) * -10000.0)[:, None, None, :]


def flash_attention(
    q: jax.Array,              # [B, H, Sq, Dh]
    k: jax.Array,              # [B, H, Sk, Dh]
    v: jax.Array,              # [B, H, Sk, Dh]
    attention_mask: Optional[jax.Array],  # [B, S] {0,1}, 1 = real token
    *,
    scale: float,
    causal: bool = False,
) -> jax.Array:
    """Blockwise flash attention via the official Pallas TPU kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) — O(S) memory, for
    long-sequence configs (the reference caps sequences at 50 by
    truncation, multimodal_driver.py:109-112; this backend lifts that
    scaling limit the TPU-native way).

    Padding is enforced with SegmentIds (pad tokens attend only among
    themselves — real-token outputs match the additive-mask semantics
    exactly; pad-row outputs may differ, and they are masked downstream).
    Note: no attention-prob dropout inside the kernel.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    segment_ids = None
    if attention_mask is not None:
        seg = attention_mask.astype(jnp.int32)
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    return fa.flash_attention(
        q, k, v,
        segment_ids=segment_ids,
        causal=causal,
        sm_scale=scale,
    )
