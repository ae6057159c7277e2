"""Build a local HF-format BERT checkpoint for warm-start runs.

This environment has no network egress, so the real
``bert-base-uncased/pytorch_model.bin`` cannot be fetched (the reference
downloads it through ``from_pretrained`` at multimodal_driver.py:317-319).
This tool builds a deterministic stand-in at full bert-base geometry —
an HF ``BertModel`` state dict with HF's own init (seeded) — so the
``--pretrained_checkpoint`` loading path, shape mapping, and full-geometry
training can be exercised end to end. With network access, point
``--pretrained_checkpoint`` at the real .bin instead; the loader
(`utils/convert.py::load_pretrained_into_params`) is identical either way.

Usage:
    python tools/make_warm_start_checkpoint.py [out.bin] [vocab_size]

Defaults: .artifacts/bert_base_v128.bin, vocab 128 (the driver shrinks
the model's vocab to the synthetic tokenizer's under --synthetic,
driver.py:231, so the checkpoint must match).
"""

import os
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else ".artifacts/bert_base_v128.bin"
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=vocab,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        max_position_embeddings=512,
        type_vocab_size=2,
    )
    model = BertModel(cfg)
    sd = {k: v for k, v in model.state_dict().items()}
    # drop HF-4.x-only buffers the 3.0.2-era loader contract doesn't have
    sd = {k: v for k, v in sd.items() if "position_ids" not in k}
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    torch.save(sd, out)
    print(f"wrote {out}: {len(sd)} tensors, vocab {vocab}")


if __name__ == "__main__":
    main()
