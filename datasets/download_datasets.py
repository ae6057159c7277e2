#!/usr/bin/env python
"""Dataset fetcher.

Equivalent of the reference's datasets/download_datasets.sh (gdown pulls of
mosi.pkl / mosei.pkl). This environment has zero network egress, so the
script validates connectivity first and degrades to clear instructions;
with network available it downloads via urllib (no gdown dependency).

Expected final layout:
    datasets/mosi.pkl
    datasets/mosei.pkl
in the documented format {split: [((words, visual, acoustic), label,
segment), ...]} (reference README.md:134-149).
"""

import os
import sys
import urllib.request

# Public Google-Drive file ids used by the reference's fetch script.
FILES = {
    "mosi.pkl": "1w1bqO4Xd_Pafeoc8y_782VYgcTYmO72M",
    "mosei.pkl": "1ae9pVFBcqYSmo9LwhX9BO87sPX_tVSPc",
}
GDRIVE = "https://drive.google.com/uc?export=download&id={}"


def main() -> int:
    dest = os.path.dirname(os.path.abspath(__file__))
    ok = True
    for name, file_id in FILES.items():
        path = os.path.join(dest, name)
        if os.path.exists(path):
            print(f"{name}: already present")
            continue
        url = GDRIVE.format(file_id)
        try:
            print(f"downloading {name} ...")
            urllib.request.urlretrieve(url, path)
            print(f"{name}: done")
        except Exception as e:
            ok = False
            print(f"{name}: download failed ({e}).\n"
                  f"  Fetch manually from {url}\n"
                  f"  and place it at {path}", file=sys.stderr)
    if not ok:
        print("\nOffline? Generate synthetic data instead:\n"
              "  python -m bert_multimodal_transformer_tpu.driver "
              "--synthetic ...", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
