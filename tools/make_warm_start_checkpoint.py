"""Build a local HF-format BERT or XLNet checkpoint for warm-start runs.

This environment has no network egress, so the real
``bert-base-uncased/pytorch_model.bin`` / ``xlnet-base-cased`` weights
cannot be fetched (the reference downloads them through ``from_pretrained``
at multimodal_driver.py:317-323). This tool builds a deterministic
stand-in at full base geometry — an HF ``BertModel`` / ``XLNetModel``
state dict with HF's own init (seeded) — so the ``--pretrained_checkpoint``
loading path, shape mapping, and full-geometry training can be exercised
end to end. With network access, point ``--pretrained_checkpoint`` at the
real .bin instead; the loader
(`utils/convert.py::load_pretrained_into_params`) is identical either way.

Usage:
    python tools/make_warm_start_checkpoint.py [out.bin] [vocab_size] [family]

Defaults: .artifacts/bert_base_v128.bin, vocab 128 (the driver shrinks
the model's vocab to the synthetic tokenizer's under --synthetic,
driver.py:260-262 — max(tokenizer_vocab, 128) — so the checkpoint must
match), family inferred from the output name (``xlnet`` in the path →
xlnet-base geometry, else bert-base).
"""

import os
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else ".artifacts/bert_base_v128.bin"
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    family = (sys.argv[3] if len(sys.argv) > 3
              else ("xlnet" if "xlnet" in os.path.basename(out) else "bert"))

    import torch

    torch.manual_seed(0)
    if family == "xlnet":
        from transformers import XLNetConfig, XLNetModel

        cfg = XLNetConfig(
            vocab_size=vocab,
            d_model=768,
            n_layer=12,
            n_head=12,
            d_inner=3072,
        )
        model = XLNetModel(cfg)
    else:
        from transformers import BertConfig, BertModel

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
    print(f"wrote {out}: {len(sd)} tensors, vocab {vocab}, family {family}")


if __name__ == "__main__":
    main()
