"""Weight conversion: torch/HF state dicts → framework param pytrees.

Covers (SURVEY.md §2.2, §7.7):
  * HF ``BertModel`` / ``RobertaModel`` state dicts → :mod:`mtvaf_tpu.nn.bert`
    params (linear kernels transposed to (in, out)).
  * torchvision ResNet ``.pth`` state dicts → :mod:`mtvaf_tpu.nn.resnet`.
  * ``psdProbe`` checkpoints → probe params.
  * The reference's selective NER-transplant loading
    (modules/train.py:495-521) as an explicit key-mapping transplant.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → an OWNED numpy copy.

    The copy is load-bearing: ``tensor.numpy()`` is a view of torch's
    buffer and ``jnp.asarray`` zero-copies host memory on the CPU backend,
    so without it the converted params would alias live torch storage —
    any later in-place torch update (e.g. an optimizer step on the source
    model) would silently mutate the "converted" JAX params, and donating
    them to a jitted step could scribble over torch's memory.
    """
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.array(t, copy=True)


def _lin(sd: Mapping, prefix: str) -> Dict:
    """torch nn.Linear (out,in) → {'kernel': (in,out), 'bias': (out,)}."""
    return {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def bert_params_from_torch(sd: Mapping, num_layers: int) -> Dict:
    """HF BertModel/RobertaModel state dict → bert params pytree.

    Accepts dicts with or without the leading ``bert.``/``roberta.`` scope.
    """
    # Normalize scope.
    keys = list(sd.keys())
    for scope in ("bert.", "roberta.", "model."):
        if any(k.startswith(scope + "embeddings") for k in keys):
            sd = {k[len(scope):]: v for k, v in sd.items() if k.startswith(scope)}
            break

    def stack(fn):
        per_layer = [fn(i) for i in range(num_layers)]
        import jax
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    def layer(i: int) -> Dict:
        p = f"encoder.layer.{i}."
        q = _lin(sd, p + "attention.self.query")
        k = _lin(sd, p + "attention.self.key")
        v = _lin(sd, p + "attention.self.value")
        return {
            "attn": {
                # Fused QKV (see nn/bert._layer_init).
                "qkv": {
                    "kernel": jnp.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": jnp.concatenate(
                        [q["bias"], k["bias"], v["bias"]]),
                },
                "out": _lin(sd, p + "attention.output.dense"),
                "ln": _ln(sd, p + "attention.output.LayerNorm"),
            },
            "mlp": {
                "in": _lin(sd, p + "intermediate.dense"),
                "out": _lin(sd, p + "output.dense"),
                "ln": _ln(sd, p + "output.LayerNorm"),
            },
        }

    params = {
        "embeddings": {
            "word": jnp.asarray(_np(sd["embeddings.word_embeddings.weight"])),
            "position": jnp.asarray(_np(sd["embeddings.position_embeddings.weight"])),
            "token_type": jnp.asarray(
                _np(sd["embeddings.token_type_embeddings.weight"])),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "layers": stack(layer),
    }
    if "pooler.dense.weight" in sd:
        params["pooler"] = _lin(sd, "pooler.dense")
    else:
        h = params["embeddings"]["word"].shape[1]
        params["pooler"] = {"kernel": jnp.zeros((h, h)), "bias": jnp.zeros((h,))}
    return params


def resnet_params_from_torch(sd: Mapping, block_counts) -> Dict:
    """torchvision ResNet state dict → resnet params pytree.

    Conv weights (out, in, kh, kw) → (kh, kw, in, out); BN running stats kept.
    """
    def conv(prefix):
        w = _np(sd[prefix + ".weight"])
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}

    def bn(prefix):
        return {
            "scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
            "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
            "var": jnp.asarray(_np(sd[prefix + ".running_var"])),
        }

    bottleneck = any("layer1.0.conv3.weight" in k for k in sd.keys())
    params = {"conv1": conv("conv1"), "bn1": bn("bn1"), "stages": []}
    for stage_idx, n_blocks in enumerate(block_counts, start=1):
        blocks = []
        for b in range(n_blocks):
            p = f"layer{stage_idx}.{b}"
            block = {"conv1": conv(p + ".conv1"), "bn1": bn(p + ".bn1"),
                     "conv2": conv(p + ".conv2"), "bn2": bn(p + ".bn2")}
            if bottleneck:
                block["conv3"] = conv(p + ".conv3")
                block["bn3"] = bn(p + ".bn3")
            if p + ".downsample.0.weight" in sd:
                block["downsample"] = {"conv": conv(p + ".downsample.0"),
                                       "bn": bn(p + ".downsample.1")}
            blocks.append(block)
        params["stages"].append(blocks)
    return params


def load_probe_checkpoint(path: str) -> Dict:
    """Load a reference psdProbe checkpoint (.pt pickling the ``probe``
    wrapper module) and convert it.

    The reference checkpoints pickle instances of classes from its local
    ``probe_trainModel``/``probe``/``constructLabel`` modules; stub modules
    with matching class names are registered so unpickling succeeds without
    the reference on the path.
    """
    import sys
    import types

    import torch
    from torch import nn

    stubs = {}
    for mod_name, class_names in (
            ("probe_trainModel", ("probe",)),
            ("probe", ("OneWordPSDProbe", "TwoWordPSDProbe",
                       "OneWordNonPSDProbe", "TwoWordNonPSDProbe", "Probe")),
            ("constructLabel", ("ConstructLabelGaget",)),
            ("loss", ("CombineLoss",)),
            ("probe_loss", ("buff_Loss",))):
        if mod_name in sys.modules:
            continue
        mod = types.ModuleType(mod_name)
        for cname in class_names:
            mod.__dict__[cname] = type(cname, (nn.Module,), {})
        sys.modules[mod_name] = mod
        stubs[mod_name] = mod
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return probe_params_from_torch(obj)


def probe_params_from_torch(obj) -> Dict:
    """psdProbe checkpoint (state dict or module) → {'proj': (768, rank)}.

    Reference checkpoints store the ``probe`` wrapper module
    (models/bert_model.py:474-475 loads with ``.state_dict()``).
    """
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("oneWordpsdProbe.proj", "proj"):
        if key in obj:
            return {"proj": jnp.asarray(_np(obj[key]))}
    raise KeyError(f"no probe projection found in checkpoint keys {list(obj)[:8]}")


def transplant_named(target_flat: Dict[str, np.ndarray],
                     source_flat: Dict[str, np.ndarray],
                     skip_substrings=("crf",),
                     head_substrings=("dense", "unary_affine", "binary_affine",
                                      "classifier")) -> Dict[str, np.ndarray]:
    """Explicit-key NER→ABSA weight transplant.

    Replaces the reference's positional state-dict surgery
    (modules/train.py:495-521): copy every source entry whose name exists in
    the target with a matching shape, skipping CRF weights and task heads.
    """
    out = dict(target_flat)
    for name, value in source_flat.items():
        if any(s in name for s in skip_substrings):
            continue
        if any(h in name for h in head_substrings) and "bert" not in name:
            continue
        if name in out and tuple(out[name].shape) == tuple(np.shape(value)):
            out[name] = value
    return out


def load_resnet(cfg):
    """Frozen-backbone params for ``cfg.resnet_depth`` from
    ``cfg.resnet_root/resnet{depth}.pth`` (torchvision layout), or random
    init when absent.  Shared by the CLI and ``infer.load_predictor``."""
    import logging
    import os

    import jax

    from ..nn.resnet import BLOCK_COUNTS, init_resnet_params
    depth = cfg.resnet_depth
    if cfg.resnet_root:
        path = os.path.join(cfg.resnet_root, f"resnet{depth}.pth")
        if os.path.exists(path):
            from .checkpoint import load_torch_file
            return resnet_params_from_torch(load_torch_file(path),
                                            BLOCK_COUNTS[depth])
    logging.getLogger(__name__).warning(
        "no resnet weights at %s — random init", cfg.resnet_root)
    return init_resnet_params(jax.random.PRNGKey(0), depth=depth)
