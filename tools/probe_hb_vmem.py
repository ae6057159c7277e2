"""Empirical scoped-VMEM boundary probe for the packed fused-attention
kernels (full-H and head-blocked).

Motivation: the nb/hb planners (ops/fused_attention.py::_pick_nb_packed /
_resolve_hb) model the per-program VMEM footprint as scratch +
double-buffered operand blocks, but Mosaic's actual stack allocation
includes compiler temporaries the model does not see. Measured miss:
the S=320 hb=6 nb=4 forward planned 10.8 MB yet allocated 16.04 MB —
40 KB over the 16 MB scoped limit — and failed to COMPILE (r3h stage
e2e_s320, 2026-08-19), while S=512 hb=4 nb=4 (planned 12.6 MB)
compiled. No clean closed form fits both points, so this probe
AOT-compiles the real kernels across the boundary region and prints
one PASS/FAIL line per configuration (with the reported scoped size on
failure). The planner constants are then set from this table, not from
theory; tools/check_fused_attention_tpu.py regression-locks the result.

Compile-only (jit .lower().compile()), so each probe costs one remote
compile and never touches the chip's step loop.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

D, H, DH = 768, 12, 64
RATE = 0.1


def main():
    import jax
    import jax.numpy as jnp

    from bert_multimodal_transformer_tpu.ops import fused_attention as fa

    def shapes(b, s, with_g=False):
        qkv = jax.ShapeDtypeStruct((b, s, 3 * D), jnp.bfloat16)
        bias = jax.ShapeDtypeStruct((b, 1, s), jnp.float32)
        seed = jax.ShapeDtypeStruct((1, 1), jnp.int32)
        if with_g:
            return qkv, bias, seed, jax.ShapeDtypeStruct(
                (b, s, D), jnp.bfloat16)
        return qkv, bias, seed

    def probe(tag, fn, args, **kw):
        try:
            fn.lower(*args, **kw).compile()
            print(f"PASS {tag}")
            return True
        except Exception as e:  # noqa: BLE001 - report any compile failure
            m = re.search(r"size ([0-9.]+[KMG]?) and limit", str(e))
            size = m.group(1) if m else "?"
            print(f"FAIL {tag} (scoped {size})")
            return False

    common = dict(scale=0.125, rate=RATE, n_heads=H, interpret=False)

    # -- head-blocked kernels across the boundary region ------------------
    for s, hb, nbs in [
        (320, 6, (1, 2, 4)),
        (320, 4, (2, 4, 8)),
        (384, 6, (1, 2)),
        (384, 4, (2, 4)),
        (448, 6, (1,)),
        (448, 4, (1, 2)),
        (512, 4, (2, 4)),
        (512, 2, (4, 8)),
        (640, 2, (1, 2)),
        (768, 2, (1,)),
    ]:
        for nb in nbs:
            b = nb  # one grid step along the batch axis is enough
            probe(f"hb_fwd S={s} hb={hb} nb={nb}",
                  fa._fwd_packed_hb_pallas, shapes(b, s),
                  hb=hb, nb=nb, **common)
            probe(f"hb_bwd S={s} hb={hb} nb={nb}",
                  fa._bwd_packed_hb_pallas, shapes(b, s, with_g=True),
                  hb=hb, nb=nb, **common)

    # -- full-H kernels near their S boundary ------------------------------
    for s, nbs in [(224, (1, 2)), (256, (1, 2)), (272, (1,)),
                   (288, (1,)), (320, (1,))]:
        for nb in nbs:
            probe(f"fullH_fwd S={s} nb={nb}",
                  fa._fwd_packed_pallas, shapes(nb, s), nb=nb, **common)
            probe(f"fullH_bwd S={s} nb={nb}",
                  fa._bwd_packed_pallas, shapes(nb, s, with_g=True),
                  nb=nb, **common)


if __name__ == "__main__":
    main()
