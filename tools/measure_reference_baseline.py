"""Measure the PyTorch reference's training throughput on CPU.

The reference repo publishes no performance numbers (BASELINE.md), and its
code cannot run here (its transformers==3.0.2 import paths don't exist in
the installed 4.x, and there is no GPU). This tool measures a functionally
equivalent PyTorch MAG-BERT train step — HF 4.x BertModel + an independent
torch implementation of the published MAG equations + AdamW — at the
reference's default shape (batch 48, seq 50, bert-base, MOSI dims;
multimodal_driver.py:38-53) on CPU, per BASELINE.json config #1.

Writes BASELINE_measured.json at the repo root; bench.py reads it for its
vs_baseline ratio.

Usage: python tools/measure_reference_baseline.py [--steps 5] [--batch 48]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--seq", type=int, default=50)
    args = ap.parse_args()

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    import torch
    import torch.nn as nn
    import transformers

    DV, DA, D = 47, 74, 768

    class TorchMAG(nn.Module):
        """Independent torch implementation of the published MAG equations
        (for baseline timing only — the JAX framework never uses torch)."""

        def __init__(self, beta_shift=1.0, dropout_prob=0.5):
            super().__init__()
            self.w_hv = nn.Linear(DV + D, D)
            self.w_ha = nn.Linear(DA + D, D)
            self.w_v = nn.Linear(DV, D)
            self.w_a = nn.Linear(DA, D)
            self.beta_shift = beta_shift
            self.ln = nn.LayerNorm(D)
            self.drop = nn.Dropout(dropout_prob)

        def forward(self, text, visual, acoustic):
            eps = 1e-6
            gv = torch.relu(self.w_hv(torch.cat((visual, text), -1)))
            ga = torch.relu(self.w_ha(torch.cat((acoustic, text), -1)))
            hm = gv * self.w_v(visual) + ga * self.w_a(acoustic)
            em = text.norm(2, dim=-1)
            hn = hm.norm(2, dim=-1)
            hn = torch.where(hn == 0, torch.ones_like(hn), hn)
            alpha = torch.clamp(em / (hn + eps) * self.beta_shift,
                                max=1.0).unsqueeze(-1)
            return self.drop(self.ln(alpha * hm + text))

    class TorchMagBert(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = transformers.BertConfig(attn_implementation="eager")
            self.bert = transformers.BertModel(cfg)
            self.mag = TorchMAG()
            self.drop = nn.Dropout(0.1)
            self.classifier = nn.Linear(D, 1)

        def forward(self, ids, visual, acoustic, mask, segs):
            emb = self.bert.embeddings(ids, token_type_ids=segs)
            fused = self.mag(emb, visual, acoustic)
            ext = (1.0 - mask.float()) * -10000.0
            ext = ext[:, None, None, :]
            enc = self.bert.encoder(fused, attention_mask=ext)
            pooled = self.bert.pooler(enc.last_hidden_state)
            return self.classifier(self.drop(pooled))

    torch.manual_seed(0)
    model = TorchMagBert().train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-5, eps=1e-6,
                            weight_decay=0.01)
    loss_fct = nn.MSELoss()

    B, S = args.batch, args.seq
    ids = torch.randint(0, 30522, (B, S))
    visual = torch.randn(B, S, DV)
    acoustic = torch.randn(B, S, DA)
    mask = torch.ones(B, S, dtype=torch.long)
    segs = torch.zeros(B, S, dtype=torch.long)
    labels = torch.rand(B) * 6 - 3

    def step():
        opt.zero_grad()
        logits = model(ids, visual, acoustic, mask, segs)
        loss = loss_fct(logits.view(-1), labels.view(-1))
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0

    result = {
        "examples_per_sec_per_chip": round(B * args.steps / dt, 3),
        "seconds_per_step": round(dt / args.steps, 3),
        "config": {
            "model": "torch CPU MAG-BERT equivalent (transformers "
                     + transformers.__version__ + ", torch "
                     + torch.__version__ + ")",
            "batch": B, "seq": S, "steps": args.steps,
            "note": "BASELINE.json config #1 — reference CPU run "
                    "equivalent; the reference repo publishes no numbers",
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_measured.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
