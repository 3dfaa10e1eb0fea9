"""Training losses (parity with pytorch/network/criterion.py).

Each loss takes the prediction/target tensors plus a static config and
returns a dict of named scalar losses; the trainer sums them.  All losses
normalize by ``num_sdf_samples`` = total SDF samples in the batch
(criterion.py:24,40,76-78,89-92).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class LossConfig(NamedTuple):
    """Static loss configuration (hyper.json "training_loss")."""
    types: Tuple[str, ...] = ("neg_log_likelihood", "reg_loss")
    enforce_minmax: bool = True
    clamping_distance: float = 0.2
    code_reg_lambda: float = 0.01
    siren_sdf_in: float = 1.0
    siren_sdf_out: float = 1.0
    siren_normal: float = 1.0
    siren_eikonal: float = 1.0

    @classmethod
    def from_hyper(cls, hyper: dict) -> "LossConfig":
        t = hyper["training_loss"]
        return cls(types=tuple(t["types"]),
                   enforce_minmax=t.get("enforce_minmax", True),
                   clamping_distance=t.get("clamping_distance", 0.2),
                   code_reg_lambda=t.get("code_reg_lambda", 0.01),
                   siren_sdf_in=t.get("siren_sdf_in", 1.0),
                   siren_sdf_out=t.get("siren_sdf_out", 1.0),
                   siren_normal=t.get("siren_normal", 1.0),
                   siren_eikonal=t.get("siren_eikonal", 1.0))


def _clamp_pair(cfg: LossConfig, pd, gt):
    if cfg.enforce_minmax:
        c = cfg.clamping_distance
        return jnp.clip(pd, -c, c), jnp.clip(gt, -c, c)
    return pd, gt


def l1_loss(cfg: LossConfig, pd_sdf, gt_sdf, n_samples) -> Dict[str, jnp.ndarray]:
    """criterion.py:10-26."""
    pd, gt = _clamp_pair(cfg, pd_sdf, gt_sdf)
    return {"sdf": jnp.sum(jnp.abs(gt - pd)) / n_samples}


def neg_log_likelihood(cfg: LossConfig, pd_sdf, pd_sdf_std, gt_sdf,
                       n_samples) -> Dict[str, jnp.ndarray]:
    """Gaussian NLL of the clamped target under N(pd, std)
    (criterion.py:29-43)."""
    pd, gt = _clamp_pair(cfg, pd_sdf, gt_sdf)
    std = pd_sdf_std
    ll = -0.5 * ((gt - pd) / std) ** 2 - jnp.log(std) - 0.5 * np.log(2.0 * np.pi)
    return {"ll": -jnp.sum(ll) / n_samples}


def reg_loss(cfg: LossConfig, latent_vecs, epoch, n_samples) -> Dict[str, jnp.ndarray]:
    """Latent-norm regularizer with the 100-epoch ramp (criterion.py:88-93)."""
    l2 = jnp.sum(jnp.linalg.norm(latent_vecs, axis=1))
    ramp = jnp.minimum(1.0, epoch / 100.0)
    return {"reg": ramp * l2 / n_samples * cfg.code_reg_lambda}


def siren_loss(cfg: LossConfig, pd_sdf, pd_grad, gt_normals,
               n_samples) -> Dict[str, jnp.ndarray]:
    """SIREN-style boundary/eikonal losses (criterion.py:46-81).
    ``gt_normals`` doubles as the on/off-surface indicator: rows with zero
    norm are off-surface.  ``pd_grad`` = d pd_sdf / d xyz, supplied by the
    trainer (jax differentiates through it for the parameter grads)."""
    on_surface = jnp.sum(jnp.abs(gt_normals), axis=-1, keepdims=True) > 1e-6
    sdf_in = jnp.where(on_surface, jnp.abs(pd_sdf), 0.0)
    sdf_out = jnp.where(on_surface, 0.0, jnp.exp(-1e2 * jnp.abs(pd_sdf)))
    cos = jnp.sum(pd_grad * gt_normals, axis=-1, keepdims=True) / (
        jnp.linalg.norm(pd_grad, axis=-1, keepdims=True)
        * jnp.linalg.norm(gt_normals, axis=-1, keepdims=True) + 1e-12)
    normal = jnp.where(on_surface, 1.0 - cos, 0.0)
    eikonal = jnp.abs(jnp.linalg.norm(pd_grad, axis=-1) - 1.0)
    return {
        "sdf_in": jnp.sum(sdf_in) / n_samples * cfg.siren_sdf_in,
        "sdf_out": jnp.sum(sdf_out) / n_samples * cfg.siren_sdf_out,
        "normal": jnp.sum(normal) / n_samples * cfg.siren_normal,
        "eikonal": jnp.sum(eikonal) / n_samples * cfg.siren_eikonal,
    }
