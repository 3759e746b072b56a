"""big-lama torch checkpoint -> Flax parameter conversion.

Maps the released big-lama generator state dict (`generator.model.<i>.*`
inside the pytorch-lightning `best.ckpt`, the checkpoint the reference's
`saicinpainting.LamaInpainter` loads — reference: test/remove_foreground.py
:11-42) onto models/lama.LamaGenerator, whose module names mirror the same
sequential indices (`m<i>`).

Discriminator / optimizer entries in the lightning checkpoint are ignored;
the conversion of the generator itself is validated as an exact bijection
(params AND batch_stats) against the model's init tree and fails loudly on
any mismatch (same policy as models/weights.py).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# torch BatchNorm leaf -> (collection, flax leaf)
_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

# convg2g sub-sequential naming -> flax module names (do these first; the
# resblock prefix reuses the names conv1/conv2)
_G2G_RENAMES = (
    ("ffc.convg2g.conv1.0", "ffc.convg2g.conv1_conv"),
    ("ffc.convg2g.conv1.1", "ffc.convg2g.conv1_bn"),
)


def convert_lama(state: Dict[str, np.ndarray], config) -> dict:
    """Generator state dict (keys `model.<i>.*`, optionally prefixed
    `generator.`) -> {'params': ..., 'batch_stats': ...} for LamaGenerator.
    """
    nd, nb = config.n_downsampling, config.n_blocks
    base = 3 + nd + nb
    upconv_idx = {base + 3 * i for i in range(nd)}
    upbn_idx = {base + 3 * i + 1 for i in range(nd)}
    final_idx = base + 3 * nd + 1

    tree: dict = {"params": {}, "batch_stats": {}}

    def put(coll: str, path: str, leaf: str, value: np.ndarray):
        tree[coll][tuple(path.split("/")) + (leaf,)] = \
            value.astype(np.float32)

    for tkey, value in state.items():
        k = tkey[len("generator."):] if tkey.startswith("generator.") \
            else tkey
        if k.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        m = re.match(r"model\.(\d+)\.(.+)", k)
        if not m:
            raise ValueError(f"Unmapped LaMa checkpoint key: {tkey}")
        idx, rest = int(m.group(1)), m.group(2)
        name = f"m{idx}"

        if idx == final_idx:                       # 7x7 out conv (bias=True)
            if rest == "weight":
                put("params", name, "kernel",
                    np.transpose(value, (2, 3, 1, 0)))
            else:
                put("params", name, "bias", value)
            continue
        if idx in upconv_idx:                      # ConvTranspose2d
            if rest == "weight":
                # torch [I, O, kh, kw] -> flax [kh, kw, I, O], spatially
                # flipped (torch computes the gradient-of-conv; flax's
                # default does not mirror the kernel) — same fix verified
                # numerically in weights_zoedepth._assign.
                put("params", name, "kernel",
                    np.transpose(value, (2, 3, 0, 1))[::-1, ::-1].copy())
            else:
                put("params", name, "bias", value)
            continue
        if idx in upbn_idx:                        # top-level BatchNorm2d
            coll, leaf = _BN_LEAVES[rest]
            put(coll, name, leaf, value)
            continue

        # FFC_BN_ACT (stem / downsamples) or FFCResnetBlock interior.
        for old, new in _G2G_RENAMES:
            rest = rest.replace(old, new)
        parts = rest.split(".")
        leaf = parts[-1]
        path = "/".join([name] + parts[:-1])
        if leaf in ("running_mean", "running_var") or \
                parts[-2] in ("bn_l", "bn_g", "conv1_bn", "bn"):
            coll, flax_leaf = _BN_LEAVES[leaf]
            put(coll, path, flax_leaf, value)
        elif leaf == "weight" and value.ndim == 4:
            put("params", path, "kernel", np.transpose(value, (2, 3, 1, 0)))
        elif leaf == "bias":
            put("params", path, "bias", value)
        else:
            raise ValueError(f"Unmapped LaMa checkpoint key: {tkey} "
                             f"shape {value.shape}")

    return {coll: unflatten_dict(flat) for coll, flat in tree.items()}


def validate_lama_bijection(converted: dict, expected: dict):
    conv = flatten_dict(converted)
    init = flatten_dict(expected)
    missing = sorted(set(init) - set(conv))
    orphans = sorted(set(conv) - set(init))
    if missing or orphans:
        raise ValueError(
            f"lama checkpoint conversion mismatch: {len(missing)} model "
            f"params unassigned (e.g. {missing[:4]}), {len(orphans)} "
            f"checkpoint keys unconsumed (e.g. {orphans[:4]}).")
    shape_bad = [(k, conv[k].shape, init[k].shape) for k in init
                 if tuple(conv[k].shape) != tuple(init[k].shape)]
    if shape_bad:
        raise ValueError(f"lama checkpoint conversion shape mismatches: "
                         f"{shape_bad[:4]}")


def load_lama_checkpoint(path: str, config=None):
    """Load a big-lama checkpoint (lightning `best.ckpt` or a bare generator
    state dict) and validate bijection against the model init."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    state = {k: v for k, v in sd.items() if hasattr(v, "numpy")}
    if any(k.startswith("generator.") for k in state):
        state = {k: v for k, v in state.items()
                 if k.startswith("generator.")}
    state = {k: v.float().numpy() for k, v in state.items()}

    from diffusionhandles_tpu.models.lama import LamaConfig, LamaGenerator
    config = config or LamaConfig()
    converted = convert_lama(state, config)

    import jax
    import jax.numpy as jnp
    model = LamaGenerator(config)
    init = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros(
            (1, 2 ** (config.n_downsampling + 2),
             2 ** (config.n_downsampling + 2), config.input_nc),
            jnp.float32)),
        jax.random.PRNGKey(0))
    validate_lama_bijection(converted, init)
    return converted
