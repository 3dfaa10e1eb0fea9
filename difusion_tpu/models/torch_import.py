"""Import of reference PyTorch checkpoints into difusion-tpu parameter pytrees.

Reads the ``.pth.tar`` files shipped with the reference
(``ckpt/default/model_300.pth.tar`` / ``encoder_300.pth.tar``, loader parity
with pytorch/network/utility.py:22-57) so a user of the reference can drop
their trained prior straight into this framework.  Torch (CPU) is only needed
at import time; converted priors are cached as ``.npz`` and loaded with numpy
thereafter.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from .decoder import DecoderSpec
from .encoder import EncoderSpec


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def decoder_params_from_state_dict(state: Dict[str, Any], spec: DecoderSpec) -> Dict[str, Any]:
    """Torch state dict -> train-form decoder params (weight-norm preserved)."""
    n_layers = len(spec.dims) + 1
    layers = []
    for i in range(n_layers):
        prefix = f"lin{i}"
        if f"{prefix}.weight_g" in state:
            layers.append({
                "g": _to_np(state[f"{prefix}.weight_g"]).reshape(-1),
                "v": _to_np(state[f"{prefix}.weight_v"]),
                "b": _to_np(state[f"{prefix}.bias"]),
            })
        else:
            layers.append({
                "w": _to_np(state[f"{prefix}.weight"]),
                "b": _to_np(state[f"{prefix}.bias"]),
            })
    return {
        "layers": layers,
        "uncertainty": {
            "w": _to_np(state["uncertainty_layer.weight"]),
            "b": _to_np(state["uncertainty_layer.bias"]),
        },
    }


def encoder_params_from_state_dict(state: Dict[str, Any], spec: EncoderSpec) -> Dict[str, Any]:
    """Torch state dict -> train-form encoder params (BN stats preserved)."""
    n_layers = len(spec.all_dims) - 1
    layers = []
    for i in range(n_layers):
        prefix = f"mlp.layer{i}"
        w = _to_np(state[f"{prefix}.conv.weight"])[:, :, 0]  # (out, in, 1) -> (out, in)
        if f"{prefix}.normlayer.bn.weight" in state:
            layers.append({
                "w": w,
                "bn_scale": _to_np(state[f"{prefix}.normlayer.bn.weight"]),
                "bn_bias": _to_np(state[f"{prefix}.normlayer.bn.bias"]),
                "bn_mean": _to_np(state[f"{prefix}.normlayer.bn.running_mean"]),
                "bn_var": _to_np(state[f"{prefix}.normlayer.bn.running_var"]),
            })
        else:
            layers.append({"w": w, "b": _to_np(state[f"{prefix}.conv.bias"])})
    return {"layers": layers}


def load_torch_prior(hyper_path: str, use_epoch: int = -1,
                     ) -> Tuple[Dict[str, Any], Dict[str, Any], DecoderSpec, EncoderSpec, dict]:
    """Load a reference-format prior directory.

    ``hyper_path`` points at the ``hyper.json`` next to the ``model_E.pth.tar``
    / ``encoder_E.pth.tar`` files (reference layout, utility.py:29-57).
    Returns (decoder_params, encoder_params, decoder_spec, encoder_spec, hyper).
    """
    import torch

    hyper_path = Path(hyper_path)
    hyper = json.loads(hyper_path.read_text())
    spec_d = DecoderSpec.from_hyper(hyper)
    spec_e = EncoderSpec.from_hyper(hyper)

    exp_dir = hyper_path.parent
    models = {int(p.name.split("model_")[-1].split(".pth")[0]): p
              for p in exp_dir.glob("model_*.pth.tar")}
    if use_epoch == -1:
        use_epoch = max(models)
    assert use_epoch in models, f"epoch {use_epoch} not in {sorted(models)}"

    dec_state = torch.load(models[use_epoch], map_location="cpu", weights_only=True)["model_state"]
    enc_state = torch.load(exp_dir / f"encoder_{use_epoch}.pth.tar",
                           map_location="cpu", weights_only=True)["model_state"]
    dec_params = decoder_params_from_state_dict(dec_state, spec_d)
    enc_params = encoder_params_from_state_dict(enc_state, spec_e)
    return dec_params, enc_params, spec_d, spec_e, hyper


# ---------------------------------------------------------------------------
# npz round-trip (torch-free cache of converted priors)
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, out)
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}#{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    # list markers live inside composite keys: re-split on '#'
    def expand(node):
        if not isinstance(node, dict):
            return node
        out: Dict[str, Any] = {}
        lists: Dict[str, Dict[int, Any]] = {}
        for k, v in node.items():
            v = expand(v)
            if "#" in k:
                name, idx = k.rsplit("#", 1)
                lists.setdefault(name, {})[int(idx)] = v
            else:
                out[k] = v
        for name, items in lists.items():
            out[name] = [items[i] for i in sorted(items)]
        return out

    return expand(root)


def save_params_npz(path: str, **trees: Any):
    flat: Dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        _flatten(tree, name, flat)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict[str, Any]:
    data = np.load(path)
    grouped: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        top, rest = key.split(".", 1)
        grouped.setdefault(top, {})[rest] = data[key]
    return {name: _unflatten(flat) for name, flat in grouped.items()}


# ---------------------------------------------------------------------------
# Export back to the reference's torch checkpoint format (the reverse of the
# import above; analog of the Jittor tree's convert.py, jittor/convert.py:5-33)
# ---------------------------------------------------------------------------


def decoder_state_dict_from_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Train-form decoder params -> torch state dict (weight-norm split)."""
    import torch
    state = {}
    for i, layer in enumerate(params["layers"]):
        prefix = f"lin{i}"
        if "g" in layer:
            state[f"{prefix}.weight_g"] = torch.from_numpy(
                np.asarray(layer["g"]).reshape(-1, 1).copy())
            state[f"{prefix}.weight_v"] = torch.from_numpy(np.asarray(layer["v"]).copy())
        else:
            state[f"{prefix}.weight"] = torch.from_numpy(np.asarray(layer["w"]).copy())
        state[f"{prefix}.bias"] = torch.from_numpy(np.asarray(layer["b"]).copy())
    state["uncertainty_layer.weight"] = torch.from_numpy(
        np.asarray(params["uncertainty"]["w"]).copy())
    state["uncertainty_layer.bias"] = torch.from_numpy(
        np.asarray(params["uncertainty"]["b"]).copy())
    return state


def encoder_state_dict_from_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Train-form encoder params -> torch state dict (BN stats preserved)."""
    import torch
    state = {}
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        prefix = f"mlp.layer{i}"
        w = np.asarray(layer["w"])[:, :, None]          # (out, in, 1) conv1d
        state[f"{prefix}.conv.weight"] = torch.from_numpy(w.copy())
        if "bn_mean" in layer:
            state[f"{prefix}.normlayer.bn.weight"] = torch.from_numpy(
                np.asarray(layer["bn_scale"]).copy())
            state[f"{prefix}.normlayer.bn.bias"] = torch.from_numpy(
                np.asarray(layer["bn_bias"]).copy())
            state[f"{prefix}.normlayer.bn.running_mean"] = torch.from_numpy(
                np.asarray(layer["bn_mean"]).copy())
            state[f"{prefix}.normlayer.bn.running_var"] = torch.from_numpy(
                np.asarray(layer["bn_var"]).copy())
            state[f"{prefix}.normlayer.bn.num_batches_tracked"] = torch.zeros(
                (), dtype=torch.long)
        else:
            state[f"{prefix}.conv.bias"] = torch.from_numpy(
                np.asarray(layer["b"]).copy())
    return state


def save_torch_prior(exp_dir: str, epoch: int, dec_params: Dict[str, Any],
                     enc_params: Dict[str, Any], hyper: dict):
    """Write model_E.pth.tar / encoder_E.pth.tar / hyper.json in the
    reference layout (network_trainer.py:206-219) so a prior trained here
    drops into the reference PyTorch runtime."""
    import torch
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    torch.save({"epoch": epoch,
                "model_state": decoder_state_dict_from_params(dec_params)},
               exp_dir / f"model_{epoch}.pth.tar")
    torch.save({"epoch": epoch,
                "model_state": encoder_state_dict_from_params(enc_params)},
               exp_dir / f"encoder_{epoch}.pth.tar")
    hyper_path = exp_dir / "hyper.json"
    if not hyper_path.exists():
        hyper_path.write_text(json.dumps(hyper, indent=2, default=str))
