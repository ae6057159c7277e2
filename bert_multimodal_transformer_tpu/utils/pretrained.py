"""from_pretrained-style constructors.

One-call mirror of the reference's model creation
(``MAG_BertForSequenceClassification.from_pretrained(name,
multimodal_config=..., num_labels=1)``, multimodal_driver.py:316-323):
builds the Flax model, initializes all params, then overwrites every
encoder weight from a local torch checkpoint with missing-key tolerance —
MAG and the classifier head keep their fresh initialization
(bert.py:90,249).

Zero network: ``path`` must be a local ``pytorch_model.bin`` or a directory
containing one (plus optionally a config.json, which overrides geometry).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    MultimodalConfig,
    XLNetConfig,
)


def _load_config_json(path: str) -> Optional[dict]:
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                return json.load(f)
    return None


def _apply_config_overrides(cfg, raw: Optional[dict]):
    if not raw:
        return cfg
    fields = {f.name for f in dataclasses.fields(cfg)}
    overrides = {k: v for k, v in raw.items()
                 if k in fields and v is not None}
    return dataclasses.replace(cfg, **overrides)


def _from_pretrained(model_cls_path, default_cfg, family: str, path: str,
                     multimodal_config: MultimodalConfig, *,
                     visual_dim: int, acoustic_dim: int,
                     config=None, num_labels: int = 1, dtype=jnp.float32,
                     seed: int = 0, max_seq_length: int = 50):
    """Shared loading recipe for both families: config.json overrides →
    model build → init on a dummy batch → checkpoint overlay with
    missing-key tolerance."""
    from bert_multimodal_transformer_tpu.utils.convert import (
        load_pretrained_into_params,
    )

    module_name, cls_name = model_cls_path
    import importlib

    model_cls = getattr(importlib.import_module(module_name), cls_name)
    cfg = config or default_cfg
    cfg = _apply_config_overrides(cfg, _load_config_json(path))
    cfg = dataclasses.replace(cfg, num_labels=num_labels)
    model = model_cls(cfg, multimodal_config, visual_dim=visual_dim,
                      acoustic_dim=acoustic_dim, dtype=dtype)

    rng = np.random.RandomState(seed)
    vocab = cfg.vocab_size
    ids = rng.randint(0, vocab, (1, max_seq_length)).astype(np.int32)
    vis = rng.randn(1, max_seq_length, visual_dim).astype(np.float32)
    ac = rng.randn(1, max_seq_length, acoustic_dim).astype(np.float32)
    params = model.init(jax.random.PRNGKey(seed), ids, vis, ac)["params"]
    params = load_pretrained_into_params(params, path, family=family)
    return model, params


def bert_from_pretrained(path: str, multimodal_config: MultimodalConfig,
                         **kw):
    """Returns (model, params) with encoder weights loaded from ``path``."""
    return _from_pretrained(
        ("bert_multimodal_transformer_tpu.models.bert",
         "MagBertForSequenceClassification"),
        BertConfig.bert_base_uncased(), "bert", path, multimodal_config,
        **kw)


def xlnet_from_pretrained(path: str, multimodal_config: MultimodalConfig,
                          **kw):
    """Returns (model, params) with transformer weights loaded from
    ``path`` (sequence_summary/logits_proj load too when present)."""
    return _from_pretrained(
        ("bert_multimodal_transformer_tpu.models.xlnet",
         "MagXLNetForSequenceClassification"),
        XLNetConfig.xlnet_base_cased(), "xlnet", path, multimodal_config,
        **kw)


def from_pretrained(path: str, model_name: str,
                    multimodal_config: MultimodalConfig, **kw):
    """Name-dispatched variant mirroring prep_for_training
    (multimodal_driver.py:316-323)."""
    if model_name.startswith("bert"):
        kw.setdefault(
            "config",
            BertConfig.bert_large_uncased() if "large" in model_name
            else BertConfig.bert_base_uncased())
        return bert_from_pretrained(path, multimodal_config, **kw)
    if model_name.startswith("xlnet"):
        return xlnet_from_pretrained(path, multimodal_config, **kw)
    raise ValueError(f"unknown model family for {model_name!r}")
