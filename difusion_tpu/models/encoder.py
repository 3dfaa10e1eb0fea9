"""Point encoder (PointNet-style shared MLP with BatchNorm).

Architecture parity with the reference encoder (pytorch/network/di_encoder.py
+ pytorch/utils/pt_util.py SharedMLP): per-point features
``6 -> 32 -> 64 -> 256``, each conv1x1 followed by BatchNorm + ReLU (conv bias
disabled when BN present), then a final biased conv ``256 -> L`` with no
norm/activation; 'train' mode mean-pools over the point dim, 'cnp' mode is
applied per point.

TPU-first design: a conv1x1 over points is just a dense matmul over the point
axis, so both modes share one batched matmul stack.  For inference the BN
running statistics are **folded** into per-channel scale/shift
(:func:`fold_encoder_params`), making the SLAM-path encoder a pure 4-matmul
pipeline.  Training mode (:func:`encode_train`) uses true batch statistics and
returns updated running stats, mirroring torch BatchNorm1d semantics
(momentum 0.1, eps 1e-5, biased variance for normalization, unbiased for the
running average).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


class EncoderSpec(NamedTuple):
    per_point_feat: Tuple[int, ...] = (6, 32, 64, 256)
    latent_size: int = 29

    @property
    def all_dims(self) -> Tuple[int, ...]:
        return tuple(self.per_point_feat) + (self.latent_size,)

    @classmethod
    def from_hyper(cls, hyper: dict) -> "EncoderSpec":
        spec = hyper["encoder_specs"]
        return cls(per_point_feat=tuple(spec["per_point_feat"]),
                   latent_size=spec.get("latent_size", hyper["code_length"]))


def init_encoder_params(spec: EncoderSpec, key: jax.Array) -> Dict[str, Any]:
    """Train-form params: hidden layers {w (kaiming-normal), bn_scale, bn_bias,
    bn_mean, bn_var}; final layer {w, b}."""
    dims = spec.all_dims
    params: Dict[str, Any] = {"layers": []}
    keys = jax.random.split(key, len(dims))
    for i in range(len(dims) - 1):
        din, dout = dims[i], dims[i + 1]
        # kaiming_normal_ default: std = sqrt(2 / fan_in), fan_in = din (k=1 conv)
        w = jax.random.normal(keys[i], (dout, din), dtype=jnp.float32) * np.sqrt(2.0 / din)
        if i < len(dims) - 2:
            params["layers"].append({
                "w": w,
                "bn_scale": jnp.ones(dout, jnp.float32),
                "bn_bias": jnp.zeros(dout, jnp.float32),
                "bn_mean": jnp.zeros(dout, jnp.float32),
                "bn_var": jnp.ones(dout, jnp.float32),
            })
        else:
            k = 1.0 / np.sqrt(din)
            b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (dout,), minval=-k, maxval=k, dtype=jnp.float32)
            params["layers"].append({"w": w, "b": b})
    return params


def fold_encoder_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold BN running stats into per-layer affine: y = (x@W^T)*a + c."""
    folded = {"layers": []}
    for layer in params["layers"]:
        if "bn_mean" in layer:
            inv_std = 1.0 / jnp.sqrt(layer["bn_var"] + _BN_EPS)
            a = layer["bn_scale"] * inv_std
            c = layer["bn_bias"] - layer["bn_mean"] * a
            folded["layers"].append({"w": layer["w"] * a[:, None], "b": c})
        else:
            folded["layers"].append(dict(layer))
    return folded


def encode_points(params: Dict[str, Any], xyzn: jnp.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """'cnp' per-point mode on folded params: (N, 6) -> (N, L)."""
    x = xyzn.astype(compute_dtype)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = jnp.dot(x, layer["w"].T.astype(compute_dtype), preferred_element_type=jnp.float32) + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x).astype(compute_dtype)
    return x.astype(jnp.float32)


def encode_train(params: Dict[str, Any], surface: jnp.ndarray,
                 update_stats: bool = True) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """'train' mode: (B, N, 6) -> codes (B, L), plus updated params (running BN
    stats).  BN statistics are taken over (batch x points), matching torch
    BatchNorm1d on a (B, C, N) tensor."""
    x = surface
    new_params = {"layers": []}
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = jnp.einsum("bnc,dc->bnd", x, layer["w"], preferred_element_type=jnp.float32)
        if "bn_mean" in layer:
            mean = jnp.mean(x, axis=(0, 1))
            var = jnp.mean((x - mean) ** 2, axis=(0, 1))
            x = (x - mean) / jnp.sqrt(var + _BN_EPS) * layer["bn_scale"] + layer["bn_bias"]
            n = x.shape[0] * x.shape[1]
            unbiased = var * n / max(n - 1, 1)
            new_layer = dict(layer)
            if update_stats:
                new_layer["bn_mean"] = (1 - _BN_MOMENTUM) * layer["bn_mean"] + _BN_MOMENTUM * mean
                new_layer["bn_var"] = (1 - _BN_MOMENTUM) * layer["bn_var"] + _BN_MOMENTUM * unbiased
            new_params["layers"].append(new_layer)
            x = jax.nn.relu(x)
        else:
            x = x + layer["b"]
            new_params["layers"].append(dict(layer))
    codes = jnp.mean(x, axis=1)  # mean aggregation over points (di_encoder.py:22)
    return codes, new_params
