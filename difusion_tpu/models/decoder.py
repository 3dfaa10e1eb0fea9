"""Probabilistic-SDF decoder (DeepSDF-style MLP with an uncertainty head).

Architecture parity with the reference decoder (pytorch/network/di_decoder.py,
hyper at pytorch/ckpt/default/hyper.json): input is ``concat(latent, xyz)`` of
width ``L+3``; hidden dims ``[128]*4``; the layer listed in ``latent_in``
re-concatenates the input; all linear layers carry weight normalization; the
std head reads the last hidden activation and maps through
``0.05 + 0.5*softplus``; the SDF output goes through ``tanh``.

TPU-first design: parameters are stored in two forms.

* **train params**: ``{g, v, b}`` per layer (weight-norm parametrization), used
  by :func:`decode_train` with dropout -- the training path differentiates
  through the normalization exactly like the reference.
* **folded params**: ``{w, b}`` with ``w = g * v / ||v||_row`` pre-computed,
  used by :func:`decode` on the hot SLAM path (tracking/meshing). Folding is a
  pure host-side transform, so the per-frame jitted step sees plain dense
  matmuls that XLA maps straight onto the MXU.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DecoderSpec(NamedTuple):
    latent_size: int = 29
    dims: Tuple[int, ...] = (128, 128, 128, 128)
    dropout: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    dropout_prob: float = 0.2
    norm_layers: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    latent_in: Tuple[int, ...] = (3,)
    weight_norm: bool = True

    @property
    def input_dim(self) -> int:
        return self.latent_size + 3

    def layer_dims(self) -> Tuple[Sequence[int], Sequence[int]]:
        """Per-layer (in_dim, out_dim) honouring the latent re-injection: the
        layer before a ``latent_in`` layer shrinks so the concat stays at the
        nominal width (reference: di_decoder.py:29-42)."""
        dims = [self.input_dim] + list(self.dims) + [1]
        ins, outs = [], []
        for layer in range(len(dims) - 1):
            out_dim = dims[layer + 1]
            if layer + 1 in self.latent_in:
                out_dim -= dims[0]
            ins.append(dims[layer])
            outs.append(out_dim)
        return ins, outs

    @classmethod
    def from_hyper(cls, hyper: dict) -> "DecoderSpec":
        spec = hyper["network_specs"]
        return cls(
            latent_size=hyper["code_length"],
            dims=tuple(spec["dims"]),
            dropout=tuple(spec.get("dropout") or ()),
            dropout_prob=spec.get("dropout_prob", 0.0),
            norm_layers=tuple(spec.get("norm_layers") or ()),
            latent_in=tuple(spec.get("latent_in") or ()),
            weight_norm=spec.get("weight_norm", False),
        )


def init_decoder_params(spec: DecoderSpec, key: jax.Array) -> Dict[str, Any]:
    """Initialize train-form (weight-norm) parameters.

    Matches torch defaults: Linear weights ~ U(-k, k), k = 1/sqrt(fan_in); the
    weight-norm split stores g = ||w||_row and v = w.
    """
    ins, outs = spec.layer_dims()
    params: Dict[str, Any] = {"layers": []}
    n_layers = len(ins)
    keys = jax.random.split(key, n_layers + 1)
    for i, (din, dout) in enumerate(zip(ins, outs)):
        k = 1.0 / np.sqrt(din)
        w = jax.random.uniform(keys[i], (dout, din), minval=-k, maxval=k, dtype=jnp.float32)
        b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (dout,), minval=-k, maxval=k, dtype=jnp.float32)
        if spec.weight_norm and i in spec.norm_layers:
            g = jnp.linalg.norm(w, axis=1)
            params["layers"].append({"g": g, "v": w, "b": b})
        else:
            params["layers"].append({"w": w, "b": b})
    k = 1.0 / np.sqrt(spec.dims[-1])
    ku = jax.random.split(keys[-1])
    params["uncertainty"] = {
        "w": jax.random.uniform(ku[0], (1, spec.dims[-1]), minval=-k, maxval=k, dtype=jnp.float32),
        "b": jax.random.uniform(ku[1], (1,), minval=-k, maxval=k, dtype=jnp.float32),
    }
    return params


def fold_decoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold weight-norm (g, v) -> dense w for the inference path."""
    folded = {"layers": [], "uncertainty": dict(params["uncertainty"])}
    for layer in params["layers"]:
        if "g" in layer:
            v = layer["v"]
            w = layer["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            folded["layers"].append({"w": w, "b": layer["b"]})
        else:
            folded["layers"].append(dict(layer))
    return folded


def _layer_weight(layer: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    if "g" in layer:
        v = layer["v"]
        return layer["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return layer["w"]


def _forward(params, spec: DecoderSpec, net_input: jnp.ndarray,
             dropout_key=None, compute_dtype=jnp.float32):
    """Shared forward. net_input: (N, L+3). Returns (sdf (N,1), std (N,1))."""
    n_layers = len(params["layers"])
    x = net_input.astype(compute_dtype)
    inp = x
    std = None
    for layer_idx in range(n_layers):
        layer = params["layers"][layer_idx]
        if layer_idx in spec.latent_in:
            x = jnp.concatenate([x, inp], axis=1)
        if layer_idx == n_layers - 1:
            uw = params["uncertainty"]["w"].astype(compute_dtype)
            ub = params["uncertainty"]["b"].astype(compute_dtype)
            std_raw = x @ uw.T + ub
            std = 0.05 + 0.5 * jax.nn.softplus(std_raw.astype(jnp.float32))
        w = _layer_weight(layer).astype(compute_dtype)
        b = layer["b"].astype(compute_dtype)
        x = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
        if layer_idx < n_layers - 1:
            x = jax.nn.relu(x)
            if dropout_key is not None and layer_idx in spec.dropout and spec.dropout_prob > 0:
                keep = 1.0 - spec.dropout_prob
                mask = jax.random.bernoulli(jax.random.fold_in(dropout_key, layer_idx), keep, x.shape)
                x = jnp.where(mask, x / keep, 0.0)
            x = x.astype(compute_dtype)
    sdf = jnp.tanh(x.astype(jnp.float32))
    return sdf, std


def decode(params: Dict[str, Any], spec: DecoderSpec, latent: jnp.ndarray,
           xyz: jnp.ndarray, compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference decode: (N, L), (N, 3) -> sdf (N,), std (N,).

    Use folded params for best throughput (no renormalization inside jit).
    """
    net_input = jnp.concatenate([latent, xyz], axis=1)
    sdf, std = _forward(params, spec, net_input, dropout_key=None, compute_dtype=compute_dtype)
    return sdf[:, 0], std[:, 0]


def decode_train(params: Dict[str, Any], spec: DecoderSpec, net_input: jnp.ndarray,
                 dropout_key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training decode with dropout and live weight-norm. net_input: (N, L+3)."""
    return _forward(params, spec, net_input, dropout_key=dropout_key)
