"""PyTorch→JAX checkpoint conversion.

The reference warm-starts from HF hub checkpoints via ``from_pretrained``
with missing-key tolerance — MAG and the classifier head stay randomly
initialized (bert.py:90,249; multimodal_driver.py:316-323). This module
replicates that contract from a *local* ``pytorch_model.bin`` (zero network
access): every encoder weight is mapped into the Flax param tree, while
params with no counterpart (MAG, classifier) keep their fresh values.

torch (CPU) is only imported here — the compute path never touches it.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint into numpy: torch-pickle
    ``pytorch_model.bin`` OR ``model.safetensors`` (what current HF
    checkpoints ship; parsed pure-numpy, no torch needed). A directory
    is searched for either file, .bin first for backward compatibility."""
    if os.path.isdir(path):
        for candidate in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, candidate)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                f"{path}: no pytorch_model.bin or model.safetensors")
    if path.endswith(".safetensors"):
        from .safetensors_io import load_safetensors

        return load_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _strip_prefix(sd: Dict[str, np.ndarray], prefixes=("bert.",
                                                       "transformer.")):
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def convert_bert_params(
    flax_params: Any,
    torch_sd: Dict[str, np.ndarray],
    num_layers: int,
) -> Any:
    """Map an HF BERT state_dict onto our MagBert param tree.

    Linear weights transpose torch's [out, in] → flax [in, out]; per-layer
    q/k/v pack into the fused qkv kernel [D, 3D] (query features first,
    matching the (b, s, 3, h, dh) unpack in models/bert.py).
    """
    sd = _strip_prefix(torch_sd)
    params = jax.tree_util.tree_map(np.asarray, flax_params)
    # Unfreeze into plain nested dicts.
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") \
        else params

    def get(name):
        if name not in sd:
            raise KeyError(f"checkpoint missing {name}")
        return sd[name]

    root = params["bert"] if "bert" in params else params

    emb = root["embeddings"]
    emb["word_embeddings"] = get("embeddings.word_embeddings.weight")
    emb["position_embeddings"] = get("embeddings.position_embeddings.weight")
    emb["token_type_embeddings"] = get(
        "embeddings.token_type_embeddings.weight")
    emb["LayerNorm"]["scale"] = get("embeddings.LayerNorm.weight")
    emb["LayerNorm"]["bias"] = get("embeddings.LayerNorm.bias")

    for i in range(num_layers):
        src = f"encoder.layer.{i}."
        dst = root["encoder"][f"layer_{i}"]
        q_w = get(src + "attention.self.query.weight").T
        k_w = get(src + "attention.self.key.weight").T
        v_w = get(src + "attention.self.value.weight").T
        dst["attention"]["qkv"]["kernel"] = np.concatenate(
            [q_w, k_w, v_w], axis=1)
        dst["attention"]["qkv"]["bias"] = np.concatenate([
            get(src + "attention.self.query.bias"),
            get(src + "attention.self.key.bias"),
            get(src + "attention.self.value.bias"),
        ])
        dst["attention"]["output_dense"]["kernel"] = get(
            src + "attention.output.dense.weight").T
        dst["attention"]["output_dense"]["bias"] = get(
            src + "attention.output.dense.bias")
        dst["attention"]["output_LayerNorm"]["scale"] = get(
            src + "attention.output.LayerNorm.weight")
        dst["attention"]["output_LayerNorm"]["bias"] = get(
            src + "attention.output.LayerNorm.bias")
        dst["intermediate_dense"]["kernel"] = get(
            src + "intermediate.dense.weight").T
        dst["intermediate_dense"]["bias"] = get(
            src + "intermediate.dense.bias")
        dst["output_dense"]["kernel"] = get(src + "output.dense.weight").T
        dst["output_dense"]["bias"] = get(src + "output.dense.bias")
        dst["output_LayerNorm"]["scale"] = get(
            src + "output.LayerNorm.weight")
        dst["output_LayerNorm"]["bias"] = get(src + "output.LayerNorm.bias")

    if "pooler" in root:
        root["pooler"]["dense"]["kernel"] = get("pooler.dense.weight").T
        root["pooler"]["dense"]["bias"] = get("pooler.dense.bias")

    return jax.tree_util.tree_map(np.asarray, params)


def convert_xlnet_params(
    flax_params: Any,
    torch_sd: Dict[str, np.ndarray],
    num_layers: int,
) -> Any:
    """Map an HF XLNet state_dict onto our MagXLNet param tree.

    HF XLNetRelativeAttention stores q/k/v/o/r as [d_model, n_head, d_head]
    einsum weights (no transpose needed) and biases r_w/r_r/r_s as
    [n_head, d_head]; seg_embed is [2, n_head, d_head].
    """
    sd = _strip_prefix(torch_sd)
    params = jax.tree_util.tree_map(np.asarray, flax_params)

    def get(name):
        if name not in sd:
            raise KeyError(f"checkpoint missing {name}")
        return sd[name]

    root = params["transformer"] if "transformer" in params else params
    root["word_embedding"]["embedding"] = get("word_embedding.weight")
    # mask_emb only exists in the flax tree when the query stream was
    # initialized (target_mapping path); tolerate its absence.
    if "mask_emb" in root and "mask_emb" in sd:
        root["mask_emb"] = sd["mask_emb"].reshape(
            np.asarray(root["mask_emb"]).shape)

    for i in range(num_layers):
        src = f"layer.{i}."
        dst = root[f"layer_{i}"]
        attn = dst["rel_attn"]
        for name in ("q", "k", "v", "o", "r"):
            # HF stores [D, H, Dh] einsum weights; we store them FLAT
            # [D, H·Dh] (models/xlnet.py setup — tile-layout efficiency)
            w = get(src + f"rel_attn.{name}")
            attn[name] = w.reshape(w.shape[0], -1)
        for name in ("r_w_bias", "r_r_bias", "r_s_bias"):
            attn[name] = get(src + f"rel_attn.{name}")
        attn["seg_embed"] = get(src + "rel_attn.seg_embed")
        attn["layer_norm"]["scale"] = get(src + "rel_attn.layer_norm.weight")
        attn["layer_norm"]["bias"] = get(src + "rel_attn.layer_norm.bias")
        ff = dst["ff"]
        ff["layer_1"]["kernel"] = get(src + "ff.layer_1.weight").T
        ff["layer_1"]["bias"] = get(src + "ff.layer_1.bias")
        ff["layer_2"]["kernel"] = get(src + "ff.layer_2.weight").T
        ff["layer_2"]["bias"] = get(src + "ff.layer_2.bias")
        ff["layer_norm"]["scale"] = get(src + "ff.layer_norm.weight")
        ff["layer_norm"]["bias"] = get(src + "ff.layer_norm.bias")

    # Head weights are optional: a backbone-only XLNetModel checkpoint has
    # no sequence_summary/logits_proj; those stay freshly initialized
    # (reference missing-key tolerance, multimodal_driver.py:321-323).
    if ("sequence_summary" in params
            and "sequence_summary.summary.weight" in sd):
        ss = params["sequence_summary"]
        ss["summary"]["kernel"] = get("sequence_summary.summary.weight").T
        ss["summary"]["bias"] = get("sequence_summary.summary.bias")
    if "logits_proj" in params and "logits_proj.weight" in sd:
        params["logits_proj"]["kernel"] = get("logits_proj.weight").T
        params["logits_proj"]["bias"] = get("logits_proj.bias")

    return jax.tree_util.tree_map(np.asarray, params)


def load_pretrained_into_params(flax_params: Any, checkpoint_path: str,
                                family: str = "bert") -> Any:
    """from_pretrained-equivalent: encoder weights from the local torch
    checkpoint, MAG/classifier keep their fresh init."""
    sd = load_torch_state_dict(checkpoint_path)

    def count_layers(prefix_fmt):
        i = 0
        stripped = _strip_prefix(sd)
        while any(k.startswith(prefix_fmt.format(i)) for k in stripped):
            i += 1
        return i

    if family == "bert":
        n = count_layers("encoder.layer.{}.")
        return convert_bert_params(flax_params, sd, n)
    n = count_layers("layer.{}.")
    return convert_xlnet_params(flax_params, sd, n)


def export_bert_state_dict(flax_params: Any,
                           num_layers: int) -> Dict[str, np.ndarray]:
    """Reverse conversion: our MagBert param tree → HF BertModel state-dict
    naming (numpy values; `torch.save({k: torch.tensor(v)})`-ready).
    MAG/classifier params are framework-specific and not exported."""
    p = jax.tree_util.tree_map(np.asarray, flax_params)
    root = p["bert"] if "bert" in p else p
    sd: Dict[str, np.ndarray] = {}

    emb = root["embeddings"]
    sd["embeddings.word_embeddings.weight"] = emb["word_embeddings"]
    sd["embeddings.position_embeddings.weight"] = emb["position_embeddings"]
    sd["embeddings.token_type_embeddings.weight"] = emb[
        "token_type_embeddings"]
    sd["embeddings.LayerNorm.weight"] = emb["LayerNorm"]["scale"]
    sd["embeddings.LayerNorm.bias"] = emb["LayerNorm"]["bias"]

    for i in range(num_layers):
        src = root["encoder"][f"layer_{i}"]
        dst = f"encoder.layer.{i}."
        qkv_w = src["attention"]["qkv"]["kernel"]  # [D, 3D]
        d = qkv_w.shape[0]
        q_w, k_w, v_w = (qkv_w[:, :d], qkv_w[:, d:2 * d], qkv_w[:, 2 * d:])
        qkv_b = src["attention"]["qkv"]["bias"]
        sd[dst + "attention.self.query.weight"] = q_w.T
        sd[dst + "attention.self.key.weight"] = k_w.T
        sd[dst + "attention.self.value.weight"] = v_w.T
        sd[dst + "attention.self.query.bias"] = qkv_b[:d]
        sd[dst + "attention.self.key.bias"] = qkv_b[d:2 * d]
        sd[dst + "attention.self.value.bias"] = qkv_b[2 * d:]
        sd[dst + "attention.output.dense.weight"] = \
            src["attention"]["output_dense"]["kernel"].T
        sd[dst + "attention.output.dense.bias"] = \
            src["attention"]["output_dense"]["bias"]
        sd[dst + "attention.output.LayerNorm.weight"] = \
            src["attention"]["output_LayerNorm"]["scale"]
        sd[dst + "attention.output.LayerNorm.bias"] = \
            src["attention"]["output_LayerNorm"]["bias"]
        sd[dst + "intermediate.dense.weight"] = \
            src["intermediate_dense"]["kernel"].T
        sd[dst + "intermediate.dense.bias"] = src["intermediate_dense"]["bias"]
        sd[dst + "output.dense.weight"] = src["output_dense"]["kernel"].T
        sd[dst + "output.dense.bias"] = src["output_dense"]["bias"]
        sd[dst + "output.LayerNorm.weight"] = \
            src["output_LayerNorm"]["scale"]
        sd[dst + "output.LayerNorm.bias"] = src["output_LayerNorm"]["bias"]

    if "pooler" in root:
        sd["pooler.dense.weight"] = root["pooler"]["dense"]["kernel"].T
        sd["pooler.dense.bias"] = root["pooler"]["dense"]["bias"]
    return sd


def export_xlnet_state_dict(flax_params: Any,
                            num_layers: int) -> Dict[str, np.ndarray]:
    """Reverse conversion: our MagXLNet param tree → HF XLNetModel
    state-dict naming (einsum weights pass through untransposed)."""
    p = jax.tree_util.tree_map(np.asarray, flax_params)
    root = p["transformer"] if "transformer" in p else p
    sd: Dict[str, np.ndarray] = {}
    sd["word_embedding.weight"] = root["word_embedding"]["embedding"]
    if "mask_emb" in root:
        sd["mask_emb"] = root["mask_emb"].reshape(1, 1, -1)
    for i in range(num_layers):
        src = root[f"layer_{i}"]
        dst = f"layer.{i}."
        attn = src["rel_attn"]
        for name in ("q", "k", "v", "o", "r"):
            # flat [D, H·Dh] here → HF [D, H, Dh] (n_head from the
            # [H, Dh]-shaped r_w_bias)
            nh, dh = np.asarray(attn["r_w_bias"]).shape
            w = attn[name]
            sd[dst + f"rel_attn.{name}"] = w.reshape(w.shape[0], nh, dh)
        for name in ("r_w_bias", "r_r_bias", "r_s_bias", "seg_embed"):
            sd[dst + f"rel_attn.{name}"] = attn[name]
        sd[dst + "rel_attn.layer_norm.weight"] = attn["layer_norm"]["scale"]
        sd[dst + "rel_attn.layer_norm.bias"] = attn["layer_norm"]["bias"]
        ff = src["ff"]
        sd[dst + "ff.layer_1.weight"] = ff["layer_1"]["kernel"].T
        sd[dst + "ff.layer_1.bias"] = ff["layer_1"]["bias"]
        sd[dst + "ff.layer_2.weight"] = ff["layer_2"]["kernel"].T
        sd[dst + "ff.layer_2.bias"] = ff["layer_2"]["bias"]
        sd[dst + "ff.layer_norm.weight"] = ff["layer_norm"]["scale"]
        sd[dst + "ff.layer_norm.bias"] = ff["layer_norm"]["bias"]
    return sd
