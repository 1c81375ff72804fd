"""Print every backbone's multi-scale tap shapes + parameter counts.

The reference generated its backbone feature-tap table offline with
model/build_model/collect_pretrained_outputs.py:16-70 (keras layer sweep
-> scaled_layers.json consumed by pretrained_nets.py:25-27). Our Flax
backbones (models/backbones/) bake the stride-2..32 taps into the
modules themselves, so the JSON indirection is gone -- this tool is the
equivalent *audit*: build each backbone, run a dummy forward, verify the
5 feature maps land exactly on strides (2, 4, 8, 16, 32), and print the
reference's markdown summary table (name | params | taps). Writes
``backbone_taps.json`` next to this script when run as a program.

Usage:  JAX_PLATFORMS=cpu python scripts/collect_backbone_taps.py
(CPU is fine -- shapes only; unset PALLAS_AXON_POOL_IPS, see CLAUDE.md.)
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

IMG_SHAPE = (256, 384, 3)  # collect_pretrained_outputs.py:11
STRIDES = (2, 4, 8, 16, 32)


def collect_taps(names=None, img_shape=IMG_SHAPE):
    """{backbone: {"params": N, "taps": [[H, W, C] x5]}} with the
    stride contract asserted per tap."""
    import jax
    import jax.numpy as jnp

    from xpt_mde_tpu.models.backbones import (BACKBONE_NAMES,
                                              backbone_factory)

    table = {}
    x = jnp.zeros((1,) + tuple(img_shape), jnp.float32)
    for name in names or BACKBONE_NAMES:
        net = backbone_factory(name, dtype=jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, train=False)
        feats = net.apply(variables, x, train=False)
        assert len(feats) == len(STRIDES), (name, len(feats))
        taps = []
        for feat, stride in zip(feats, STRIDES):
            expect = (img_shape[0] // stride, img_shape[1] // stride)
            got = tuple(feat.shape[1:3])
            assert got == expect, (name, stride, got, expect)
            taps.append(list(feat.shape[1:]))
        params = sum(leaf.size for leaf in
                     jax.tree_util.tree_leaves(variables["params"]))
        table[name] = {"params": int(params), "taps": taps}
    return table


def main():
    table = collect_taps()
    print("model name | # parameters | taps (stride 2..32)")
    print("--- | --- | ---")
    for name, row in table.items():
        taps = ", ".join("x".join(map(str, t)) for t in row["taps"])
        print(f"{name} | {row['params'] / 1e6:.1f}M | {taps}")
    out = Path(__file__).parent / "backbone_taps.json"
    out.write_text(json.dumps(table, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
