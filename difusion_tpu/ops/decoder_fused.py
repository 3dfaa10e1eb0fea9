"""Fused single-kernel decoder MLP (Pallas TPU).

The probabilistic-SDF decoder (models/decoder.py; reference architecture
pytorch/network/di_decoder.py + ckpt hyper.json) is a 6-linear-layer MLP with
one latent re-injection and two 1-wide output heads.  The XLA path lowers it
to ~12 ops, each of which round-trips an (N, 128) activation through HBM --
~10 full activation transfers per evaluation.  At mesh-extraction scale
(N = hundreds of thousands of lattice sites per dispatch) the evaluation is
bandwidth-bound, not MXU-bound.

This kernel runs the ENTIRE network in one ``pallas_call``: every weight
matrix lives in VMEM for the whole grid (the folded decoder is ~250 KB --
trivially resident), each (TILE, 128) row-block of inputs is read from HBM
exactly once, flows through all six matmuls + activations inside VMEM, and
only the 2-column result (sdf, std) leaves.  HBM traffic per point drops from
~5 KB to ~1 KB (padded input row + padded output row), and the op-dispatch
count per evaluation drops from ~12 to 1.

Layout notes (TPU tiling wants the lane dimension = 128):

* the (latent | xyz) input (width L+3 = 32) is zero-padded to 128 lanes; W0
  is padded with zero rows correspondingly, so the padding is exact, not
  approximate;
* layer 2's 96-wide output is kept in a 128-lane register with zero-padded
  weight columns AND zero-padded bias, so ReLU keeps the pad lanes at 0;
* the reference implements layer 3 as ``concat(h2, input) @ W3``; here the
  concat is algebraically split into ``h2p @ W3a + inp @ W3b`` (two K=128
  MXU passes) -- bit-identical because the pad lanes of both operands are 0;
* the sdf head (tanh) and the uncertainty head (0.05 + 0.5*softplus), both
  1-wide, are packed as columns 0 and 1 of one (128, 128) head matrix; the
  caller slices columns 0:2 of the output.

Supports the production architecture only (dims (128,)*4, latent_in == (3,),
L + 3 <= 128); ``pack_fused_decoder`` raises ``ValueError`` otherwise and
callers fall back to the XLA path (models/decoder.py:decode).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderSpec, _layer_weight

LANES = 128


def supports_spec(spec: DecoderSpec) -> bool:
    return (tuple(spec.dims) == (128, 128, 128, 128)
            and tuple(spec.latent_in) == (3,)
            and spec.input_dim <= LANES)


def pack_fused_decoder(params: Dict[str, Any], spec: DecoderSpec,
                       compute_dtype=jnp.float32
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (possibly weight-normed) decoder params into the kernel layout.

    Returns ``(w_stack (6, 128, 128), b_stack (8, 128))`` where the stack
    rows are [W0, W1, W2, W3a, W3b, Whead], each stored TRANSPOSED
    (in-lane = input feature) and zero-padded to 128x128, and the bias rows
    are [b0, b1, b2, b3, bhead] (+3 zero rows to honour the (8, 128) f32
    min tile).  All padding lanes are exactly zero, which the kernel relies
    on for exactness.  Runs fine inside jit (pure pads/transposes).
    """
    if not supports_spec(spec):
        raise ValueError(f"fused decoder kernel does not support {spec}")
    din = spec.input_dim
    layers = params["layers"]

    def pad_wt(w, rows=LANES, cols=LANES):
        wt = jnp.asarray(w).T  # (in, out)
        return jnp.zeros((rows, cols), jnp.float32).at[
            :wt.shape[0], :wt.shape[1]].set(wt)

    def pad_b(b):
        return jnp.zeros((LANES,), jnp.float32).at[:b.shape[0]].set(b)

    # 5 linear layers: 0: 32->128, 1: 128->128, 2: 128->96 (shrunk so the
    # latent_in concat stays 128-wide), 3: [h2|inp]->128, 4: 128->1 (sdf);
    # the uncertainty head reads layer 4's input (the last hidden, h3).
    ws = [_layer_weight(l) for l in layers]          # (out, in) each
    w3 = ws[3]                                       # (128, 128): [h2(96) | inp(32)]
    w3a, w3b = w3[:, :96], w3[:, 96:96 + din]
    whead = jnp.zeros((LANES, LANES), jnp.float32)
    whead = whead.at[:, 0].set(jnp.asarray(ws[4])[0])                    # sdf
    whead = whead.at[:, 1].set(jnp.asarray(params["uncertainty"]["w"])[0])  # std
    bhead = jnp.zeros((LANES,), jnp.float32)
    bhead = bhead.at[0].set(layers[4]["b"][0])
    bhead = bhead.at[1].set(params["uncertainty"]["b"][0])

    w_stack = jnp.stack([pad_wt(ws[0]), pad_wt(ws[1]), pad_wt(ws[2]),
                         pad_wt(w3a), pad_wt(w3b), whead])
    b_stack = jnp.zeros((8, LANES), jnp.float32)
    for i, b in enumerate([layers[0]["b"], layers[1]["b"], layers[2]["b"],
                           layers[3]["b"]]):
        b_stack = b_stack.at[i, :].set(pad_b(b))
    b_stack = b_stack.at[4, :].set(bhead)
    return w_stack.astype(compute_dtype), b_stack


def _mlp_kernel(xp_ref, w_ref, b_ref, out_ref):
    f32 = jnp.float32
    dot = partial(jnp.dot, preferred_element_type=f32)
    x = xp_ref[:]                                    # (T, din), narrow block
    cd = x.dtype
    # the HBM-side input stays (N, din=32): reading a zero-padded (N, 128)
    # buffer was measured to cost more than the whole fusion saves.  The two
    # input-consuming matmuls instead slice the first din (zero-padded-
    # beyond) weight rows and run with K = din.
    din = x.shape[1]

    def layer(h, k, bk):
        z = dot(h, w_ref[k]) + b_ref[bk:bk + 1, :].astype(f32)
        return jax.nn.relu(z).astype(cd)

    h = jax.nn.relu(dot(x, w_ref[0][:din]) + b_ref[0:1, :].astype(f32)).astype(cd)
    h = layer(h, 1, 1)
    h = layer(h, 2, 2)
    z3 = dot(h, w_ref[3]) + dot(x, w_ref[4][:din]) + b_ref[3:4, :].astype(f32)
    h = jax.nn.relu(z3).astype(cd)
    out_w = out_ref.shape[1]
    z = (dot(h, w_ref[5][:, :out_w])
         + b_ref[4:5, :out_w].astype(f32))             # (T, out_w); cols 0,1 live
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    # transcendental epilogue only on the narrow output lanes
    out_ref[:] = jnp.where(col == 0, jnp.tanh(z), 0.05 + 0.5 * jax.nn.softplus(z))


def decode_fused_packed(w_stack: jnp.ndarray, b_stack: jnp.ndarray,
                        latent: jnp.ndarray, xyz: jnp.ndarray,
                        tile: int = 1024, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode from pre-packed weights: (N, L), (N, 3) -> sdf, std (N,).

    ``w_stack.dtype`` selects the compute precision (f32 or bf16 matmuls,
    always f32 accumulation and f32 heads).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = latent.shape[0]
    cd = w_stack.dtype
    x = jnp.concatenate([latent, xyz], axis=1).astype(cd)
    din, out_w = x.shape[1], 8
    n_pad = max(tile, -(-n // tile) * tile)
    if n_pad != n:
        x = jnp.zeros((n_pad, din), cd).at[:n].set(x)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_w), jnp.float32),
        interpret=interpret,
    )(x, w_stack, b_stack)
    return out[:n, 0], out[:n, 1]


def decode_fused(params: Dict[str, Any], spec: DecoderSpec,
                 latent: jnp.ndarray, xyz: jnp.ndarray,
                 compute_dtype=jnp.float32, tile: int = 1024,
                 interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused counterpart of models.decoder.decode (folded or
    weight-norm params; packing runs in-jit and is negligible next to the
    evaluation)."""
    w_stack, b_stack = pack_fused_decoder(params, spec, compute_dtype)
    return decode_fused_packed(w_stack, b_stack, latent, xyz,
                               tile=tile, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused forward + input-gradient kernel (GN SDF term hot path)
# ---------------------------------------------------------------------------


def _mlp_grad_kernel(xp_ref, w_ref, b_ref, out_ref):
    """Forward pass + d(sdf)/d(xyz) backprop in ONE kernel.

    The tracker's SDF term needs, per GN iteration, sdf(x), std(x) and the
    3-vector gradient of sdf w.r.t. the query position (reference
    compute_sdf_Hg, tracker.py:174-218, which pays a full autograd backward
    through the decoder).  The XLA vjp re-reads every activation from HBM;
    here the activations never leave VMEM: the backward recurrence

        dh3 = (1 - sdf^2) * w_sdf;      dz3 = dh3 * [h3 > 0]
        dh2 = dz3 @ W3a^T;              dz2 = dh2 * [h2 > 0]
        dh1 = dz2 @ W2^T;               dz1 = dh1 * [h1 > 0]
        dh0 = dz1 @ W1^T;               dz0 = dh0 * [h0 > 0]
        dx  = dz3 @ W3b^T + dz0 @ W0^T          (xyz columns only)

    runs right after the forward matmuls on the same VMEM tiles.  Only the
    LAST 3 input columns (the xyz part; the latent is stop-gradiented in the
    tracker) are emitted, as columns 2:5 of the (T, 8) output next to
    (sdf, std).  relu' uses [h > 0], identical to JAX's relu vjp (0 at 0).
    """
    f32 = jnp.float32
    dot = partial(jnp.dot, preferred_element_type=f32)
    dot_t = partial(jax.lax.dot_general,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)        # a @ b^T
    x = xp_ref[:]
    cd = x.dtype
    din = x.shape[1]

    h0 = jax.nn.relu(dot(x, w_ref[0][:din]) + b_ref[0:1, :].astype(f32)).astype(cd)
    h1 = jax.nn.relu(dot(h0, w_ref[1]) + b_ref[1:2, :].astype(f32)).astype(cd)
    h2 = jax.nn.relu(dot(h1, w_ref[2]) + b_ref[2:3, :].astype(f32)).astype(cd)
    z3 = dot(h2, w_ref[3]) + dot(x, w_ref[4][:din]) + b_ref[3:4, :].astype(f32)
    h3 = jax.nn.relu(z3).astype(cd)
    z = dot(h3, w_ref[5][:, :8]) + b_ref[4:5, :8].astype(f32)   # (T, 8)
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    sdf = jnp.tanh(z[:, 0:1])                                   # (T, 1)
    fwd = jnp.where(col == 0, jnp.tanh(z), 0.05 + 0.5 * jax.nn.softplus(z))

    # backward through the sdf head only (std is stop-gradiented upstream)
    w_sdf = w_ref[5][:, 0].astype(f32)                          # (128,)
    dh3 = ((1.0 - sdf * sdf) * w_sdf[None, :])                  # (T, 128) f32
    dz3 = jnp.where(h3 > 0, dh3, 0.0).astype(cd)
    dh2 = dot_t(dz3, w_ref[3])
    dz2 = jnp.where(h2 > 0, dh2, 0.0).astype(cd)
    dh1 = dot_t(dz2, w_ref[2])
    dz1 = jnp.where(h1 > 0, dh1, 0.0).astype(cd)
    dh0 = dot_t(dz1, w_ref[1])
    dz0 = jnp.where(h0 > 0, dh0, 0.0).astype(cd)
    # xyz rows of the input-side weights: din-3 .. din-1
    gx = (dot_t(dz3, w_ref[4][din - 3:din])
          + dot_t(dz0, w_ref[0][din - 3:din]))                  # (T, 3)

    out = jnp.concatenate([fwd[:, :2], gx,
                           jnp.zeros((gx.shape[0], 3), f32)], axis=1)
    out_ref[:] = out


def decode_grad_fused_packed(w_stack: jnp.ndarray, b_stack: jnp.ndarray,
                             latent: jnp.ndarray, xyz: jnp.ndarray,
                             tile: int = 512, interpret: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused decode + input gradient from pre-packed weights:
    (N, L), (N, 3) -> (sdf (N,), std (N,), dsdf_dxyz (N, 3)).

    ``w_stack.dtype`` selects the matmul precision (f32/bf16; accumulation
    and the transcendental heads/backward mask math stay f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = latent.shape[0]
    cd = w_stack.dtype
    x = jnp.concatenate([latent, xyz], axis=1).astype(cd)
    din, out_w = x.shape[1], 8
    n_pad = max(tile, -(-n // tile) * tile)
    if n_pad != n:
        x = jnp.zeros((n_pad, din), cd).at[:n].set(x)

    out = pl.pallas_call(
        _mlp_grad_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_w), jnp.float32),
        interpret=interpret,
    )(x, w_stack, b_stack)
    return out[:n, 0], out[:n, 1], out[:n, 2:5]


def decode_grad_fused(params: Dict[str, Any], spec: DecoderSpec,
                      latent: jnp.ndarray, xyz: jnp.ndarray,
                      compute_dtype=jnp.float32, tile: int = 512,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (sdf, std, dsdf/dxyz): the one-kernel replacement for
    decode + jax.vjp w.r.t. xyz with the latent stop-gradiented (exactly
    what the GN SDF term needs, core/tracker._sdf_term)."""
    w_stack, b_stack = pack_fused_decoder(params, spec, compute_dtype)
    return decode_grad_fused_packed(w_stack, b_stack, latent, xyz,
                                    tile=tile, interpret=interpret)
