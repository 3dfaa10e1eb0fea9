"""Joint encoder/decoder prior training (parity with
pytorch/network_trainer.py, config surface = ckpt/default/hyper.json).

TPU-first redesign:

* One **jitted train step**: encoder 'train' mode over (B, N, 6) surface
  samples, codes tiled to (B*S, L), decoder NLL + latent regularizer, Adam
  with per-group learning rates.  The reference's ``batch_split`` gradient
  accumulation (network_trainer.py:139-163) exists to fit GPU memory; on TPU
  the whole batch is a single MXU-friendly matmul stack, so splitting is
  unnecessary (the option is accepted and ignored).
* **Data parallelism** via ``jax.sharding``: the batch dimension is sharded
  over a 1-D device mesh ("data" axis); parameters are replicated.  XLA
  inserts the gradient all-reduce -- this replaces ``nn.DataParallel``
  (network_trainer.py:54,59).
* BatchNorm running statistics ride the train-step output (functional state),
  and gradients never touch them.
* Checkpoints: ``hyper.json`` + ``prior_E.npz`` (+ ``training_E.npz`` with
  optimizer state for epoch-level resume, which the reference lacks --
  network_trainer.py:91).  The npz layout is directly consumable by
  :func:`difusion_tpu.slam.load_prior`.
"""
from __future__ import annotations

import json
import logging
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoder import DecoderSpec, decode_train, init_decoder_params
from ..models.encoder import EncoderSpec, encode_train, init_encoder_params
from ..utils.meters import LossMeter
from . import lif_dataset as ldata
from .losses import LossConfig, l1_loss, neg_log_likelihood, reg_loss, siren_loss
from .lr_schedule import get_learning_rate_schedules


class TrainState(NamedTuple):
    dec_params: Dict[str, Any]
    enc_params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def _optimizer():
    # lr=1.0: per-group learning rates are applied as explicit update scales,
    # matching the reference's two Adam param groups (network_trainer.py:77-80)
    return optax.adam(1.0)


def create_train_state(spec_d: DecoderSpec, spec_e: EncoderSpec,
                       key: jax.Array) -> TrainState:
    kd, ke = jax.random.split(key)
    dec = init_decoder_params(spec_d, kd)
    enc = init_encoder_params(spec_e, ke)
    opt_state = _optimizer().init({"dec": dec, "enc": enc})
    return TrainState(dec, enc, opt_state, jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnames=("spec_d", "loss_cfg"), donate_argnums=(2,))
def train_step(spec_d: DecoderSpec, loss_cfg: LossConfig, state: TrainState,
               sdf_data: jnp.ndarray, surface: jnp.ndarray, key: jax.Array,
               lr_dec: jnp.ndarray, lr_enc: jnp.ndarray, epoch: jnp.ndarray
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step.  sdf_data (B, S, 4) xyz+sdf in voxel-local
    coords; surface (B, N, 6) xyz+normal.  Inputs may arrive float16 (the
    `upload_dtype: float16` tunnel-bytes option): everything computes in f32
    from the first op on."""
    sdf_data = sdf_data.astype(jnp.float32)
    surface = surface.astype(jnp.float32)
    B, S, _ = sdf_data.shape
    n_samples = jnp.asarray(B * S, jnp.float32)
    xyz = sdf_data[:, :, 0:3].reshape(-1, 3)
    # remaining channels: (1,) sdf for l1/nll, or (3,) normals for siren
    # (reference: gt_sdf = sdf_data[:, 3:], network_trainer.py:137)
    gt_sdf = sdf_data[:, :, 3:].reshape(B * S, -1)

    def loss_fn(params):
        codes, new_enc = encode_train(params["enc"], surface)          # (B, L)
        lat = jnp.repeat(codes, S, axis=0)                             # (B*S, L)

        need_grad = "siren_loss" in loss_cfg.types

        def decode_at(x):
            net_input = jnp.concatenate([lat, x], axis=1)
            return decode_train(params["dec"], spec_d, net_input, key)

        if need_grad:
            (pd_sdf, pd_std), vjp_fn = jax.vjp(lambda x: decode_at(x), xyz)
            (pd_grad,) = vjp_fn((jnp.ones_like(pd_sdf), jnp.zeros_like(pd_std)))
        else:
            pd_sdf, pd_std = decode_at(xyz)
            pd_grad = None

        losses: Dict[str, jnp.ndarray] = {}
        for t in loss_cfg.types:
            if t == "l1_loss":
                losses.update(l1_loss(loss_cfg, pd_sdf, gt_sdf[:, 0:1], n_samples))
            elif t == "neg_log_likelihood":
                losses.update(neg_log_likelihood(loss_cfg, pd_sdf, pd_std,
                                                 gt_sdf[:, 0:1], n_samples))
            elif t == "reg_loss":
                losses.update(reg_loss(loss_cfg, lat, epoch, n_samples))
            elif t == "siren_loss":
                losses.update(siren_loss(loss_cfg, pd_sdf, pd_grad, gt_sdf,
                                         n_samples))
            else:
                raise ValueError(f"unknown loss {t!r}")
        total = sum(losses.values())
        # surface-SDF validation probe (network_trainer.py:174-181)
        losses["surface_abs_sdf"] = jax.lax.stop_gradient(
            jnp.mean(jnp.abs(pd_sdf)))
        return total, (new_enc, losses)

    (total, (new_enc, losses)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)({"dec": state.dec_params, "enc": state.enc_params})

    updates, opt_state = _optimizer().update(
        grads, state.opt_state, {"dec": state.dec_params, "enc": state.enc_params})
    updates = {
        "dec": jax.tree.map(lambda u: u * lr_dec, updates["dec"]),
        "enc": jax.tree.map(lambda u: u * lr_enc, updates["enc"]),
    }
    new_params = optax.apply_updates(
        {"dec": state.dec_params, "enc": state.enc_params}, updates)
    # BN running stats come from the forward pass, not the optimizer
    enc_final = new_params["enc"]
    for i, layer in enumerate(new_enc["layers"]):
        if "bn_mean" in layer:
            enc_final["layers"][i]["bn_mean"] = layer["bn_mean"]
            enc_final["layers"][i]["bn_var"] = layer["bn_var"]

    losses["total"] = total
    return TrainState(new_params["dec"], enc_final, opt_state,
                      state.step + 1), losses


# ---------------------------------------------------------------------------
# Sharding helpers (DP over a 1-D mesh)
# ---------------------------------------------------------------------------


def make_mesh(n_devices: int = -1, tp: int = 1):
    """1-D data mesh, or a 2-D (data, model) mesh when ``tp`` > 1."""
    devices = jax.devices()
    if n_devices > 0:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: asked for {n_devices} devices but jax.devices() "
                f"has only {len(devices)} "
                f"({[d.platform for d in devices]}); for a virtual CPU mesh "
                "set JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}")
        devices = devices[:n_devices]
    if tp > 1:
        if len(devices) % tp != 0:
            raise RuntimeError(
                f"make_mesh: {len(devices)} devices not divisible by tp={tp}")
        return jax.sharding.Mesh(
            np.array(devices).reshape(len(devices) // tp, tp),
            ("data", "model"))
    return jax.sharding.Mesh(np.array(devices), ("data",))


def shard_batch(mesh, *arrays):
    """Put arrays with the batch axis sharded over the "data" mesh axis."""
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh, tree):
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_state_tp(state: TrainState, mesh) -> TrainState:
    """Tensor-parallel placement over a (data, model) mesh: every weight
    matrix shards its output dimension on the "model" axis (column-parallel;
    GSPMD inserts the inter-layer all-gathers), per-output vectors shard
    alongside, everything else replicates.  The reference has no model
    parallelism at all (SURVEY.md section 2.9) -- this is the scaling lever
    for wider priors than the shipped 128-hidden MLPs."""
    P = jax.sharding.PartitionSpec
    tp = mesh.shape["model"]

    def spec_for(path, a):
        if a.ndim == 2 and a.shape[0] % tp == 0:
            return P("model", None)
        if a.ndim == 1 and a.shape[0] % tp == 0 and a.shape[0] > 4:
            return P("model")
        return P()

    def place(tree):
        # Adam moments mirror parameter shapes, so the same rule shards them
        return jax.tree.map(
            lambda a: jax.device_put(
                a, jax.sharding.NamedSharding(mesh, spec_for(None, a))), tree)

    return TrainState(place(state.dec_params), place(state.enc_params),
                      place(state.opt_state), replicate(mesh, state.step))


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(save_dir: Path, epoch: int, state: TrainState, hyper: dict):
    """hyper.json + prior_E.npz (+ optimizer state for resume)."""
    from ..models import torch_import as TI
    save_dir.mkdir(parents=True, exist_ok=True)
    hyper_path = save_dir / "hyper.json"
    if not hyper_path.exists():
        hyper_path.write_text(json.dumps(hyper, indent=2, default=str))
    dec_np = jax.tree.map(np.asarray, state.dec_params)
    enc_np = jax.tree.map(np.asarray, state.enc_params)
    TI.save_params_npz(str(save_dir / f"prior_{epoch}.npz"),
                       decoder=dec_np, encoder=enc_np)
    try:   # reference-format .pth.tar so the torch runtime can consume it
        TI.save_torch_prior(str(save_dir), epoch, dec_np, enc_np, hyper)
    except ImportError:
        pass
    opt_np = jax.tree.map(np.asarray, state.opt_state)
    flat, treedef = jax.tree.flatten(opt_np)
    np.savez_compressed(save_dir / f"training_{epoch}.npz",
                        step=np.asarray(state.step),
                        **{f"opt_{i}": a for i, a in enumerate(flat)})


def load_checkpoint(save_dir: Path, epoch: int, spec_d: DecoderSpec,
                    spec_e: EncoderSpec) -> TrainState:
    from ..models import torch_import as TI
    loaded = TI.load_params_npz(str(save_dir / f"prior_{epoch}.npz"))
    dec = jax.tree.map(jnp.asarray, loaded["decoder"])
    enc = jax.tree.map(jnp.asarray, loaded["encoder"])
    opt_state = _optimizer().init({"dec": dec, "enc": enc})
    tpath = save_dir / f"training_{epoch}.npz"
    step = jnp.zeros((), jnp.int32)
    if tpath.exists():
        data = np.load(tpath)
        flat, treedef = jax.tree.flatten(opt_state)
        flat = [jnp.asarray(data[f"opt_{i}"]) for i in range(len(flat))]
        opt_state = jax.tree.unflatten(treedef, flat)
        step = jnp.asarray(data["step"])
    return TrainState(dec, enc, opt_state, step)


# ---------------------------------------------------------------------------
# Training driver (network_trainer.py main)
# ---------------------------------------------------------------------------


def train(args, max_steps: int = -1, log_every: int = 10) -> TrainState:
    """Run the training loop from a reference-style hyper namespace."""
    # slab-restart friendly: on the remote-compile tunnel a cold train_step
    # costs minutes; the persistent cache makes every process after the
    # first start in seconds (tools/train_slabs.py runs one process per K
    # epochs)
    from ..utils.jaxtools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    hyper = vars(args) if not isinstance(args, dict) else args
    spec_d = DecoderSpec.from_hyper(hyper)
    spec_e = EncoderSpec.from_hyper(hyper)
    loss_cfg = LossConfig.from_hyper(hyper)
    schedules = get_learning_rate_schedules(hyper["lr_schedule"])

    dataset = ldata.LifCombinedDataset(*[
        ldata.LifDataset(**t, num_sample=hyper["samples_per_lif"])
        for t in hyper["train_set"]])
    logging.info("dataset: %d LIFs", len(dataset))
    # `loader: packed` (default) assembles whole batches as vectorized numpy
    # gathers over epoch-level pre-packed arrays -- on the 1-core host the
    # per-item path leaves the device idle ~70-95% of the time (the
    # reference needs 8 DataLoader workers for the same reason,
    # network_trainer.py:68); `loader: threaded` keeps the per-item thread
    # pool for corpora too big to pack in RAM
    loader_kind = str(hyper.get("loader", "packed"))
    packed = ldata.pack_dataset(dataset) if loader_kind == "packed" else None
    if packed is not None:
        logging.info("packed loader: %.1f MB resident",
                     sum(a.nbytes for p in getattr(packed, "packs", [packed])
                         for a in (p.pos, p.neg, p.surf)) / 1e6)

    # epoch-level resume: `resume_epoch: E` reloads prior_E.npz +
    # training_E.npz (optimizer state) and continues at epoch E+1 -- the
    # capability the reference lacks (network_trainer.py:91 hardcodes
    # start_epoch=1), wired through the CLI here
    start_epoch = int(hyper.get("resume_epoch", 0))
    save_dir_early = Path(hyper.get("save_dir",
                                    f"./di-checkpoints/{hyper['run_name']}"))
    if start_epoch > 0:
        state = load_checkpoint(save_dir_early, start_epoch, spec_d, spec_e)
        logging.info("resumed from epoch %d", start_epoch)
    else:
        state = create_train_state(spec_d, spec_e, jax.random.key(0))
    import math
    n_dev = math.gcd(int(hyper["batch_size"]), len(jax.devices()))
    mesh = make_mesh(n_dev)
    multi = n_dev > 1
    if multi:
        logging.info("data-parallel over %d devices", n_dev)
        state = TrainState(*replicate(mesh, tuple(state)))

    save_dir = Path(hyper.get("save_dir", f"./di-checkpoints/{hyper['run_name']}"))
    checkpoints = sorted(set(
        list(range(hyper["snapshot_frequency"], hyper["num_epochs"] + 1,
                   hyper["snapshot_frequency"]))
        + list(hyper.get("additional_snapshots", []))))

    # structured metrics stream (the reference logs scalars to tensorboardX,
    # network_trainer.py:18-33; here one JSONL row per log interval, plotted
    # by tools/plot_training.py) -- plus a real tensorboard writer when the
    # package is importable (torch ships one), mirroring the reference's
    # per-interval scalars + LR (gate with `tensorboard: false` in the hyper)
    save_dir.mkdir(parents=True, exist_ok=True)
    metrics_f = open(save_dir / "metrics.jsonl", "a")
    tb = None
    if hyper.get("tensorboard", True):
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(log_dir=str(save_dir / "tb"))
        except Exception:
            tb = None

    rng = np.random.default_rng(start_epoch)
    key = jax.random.key(1 + start_epoch)
    it = 0
    # on resume, keep the LOGGED iteration axis global (metrics.jsonl/tb
    # continue from the snapshot's optimizer step) while `it` itself stays
    # per-invocation so max_steps keeps its "steps this run" meaning
    it_base = int(np.asarray(jax.device_get(state.step)).reshape(-1)[0]) \
        if start_epoch > 0 else 0
    for epoch in range(start_epoch + 1, hyper["num_epochs"] + 1):
        lr_dec = schedules[0](epoch)
        lr_enc = schedules[1](epoch)
        meter = LossMeter()
        t_epoch = time.perf_counter()
        n_batches = 0
        batches = (ldata.iterate_batches_packed(packed, hyper["batch_size"], rng)
                   if packed is not None else
                   ldata.iterate_batches(
                       dataset, hyper["batch_size"], rng,
                       n_workers=int(hyper.get("loader_workers", 4))))
        if not multi:
            # pipeline the tunnel upload (optionally float16 -- halves the
            # ~4.4 MB/step at study shapes; train_step casts back to f32 as
            # its first op) against the next batch's host assembly
            up = np.float16 if str(hyper.get("upload_dtype", "float32")) \
                == "float16" else np.float32
            batches = ldata.prefetch_device(
                batches, lambda b: (jnp.asarray(b[0].astype(up)),
                                    jnp.asarray(b[1].astype(up)), b[2]))
        for sdf_data, surface, idx in batches:
            if multi:
                sdf_data, surface = shard_batch(mesh, sdf_data, surface)
            key, sub = jax.random.split(key)
            state, losses = train_step(spec_d, loss_cfg, state,
                                       jnp.asarray(sdf_data), jnp.asarray(surface),
                                       sub, jnp.asarray(lr_dec, jnp.float32),
                                       jnp.asarray(lr_enc, jnp.float32),
                                       jnp.asarray(epoch, jnp.float32))
            it += 1
            n_batches += 1
            if it % log_every == 0:
                vals = {k: float(v) for k, v in losses.items()}
                meter.update(vals)
                logging.info("epoch %d it %d: %s", epoch, it,
                             {k: round(v, 5) for k, v in vals.items()})
                metrics_f.write(json.dumps(
                    {"epoch": epoch, "it": it_base + it,
                     "lr_dec": float(lr_dec),
                     "lr_enc": float(lr_enc), "t": time.time(), **vals}) + "\n")
                metrics_f.flush()
                if tb is not None:
                    for k, v in vals.items():
                        tb.add_scalar(f"train/{k}", v, it_base + it)
                    tb.add_scalar("lr/decoder", float(lr_dec), it_base + it)
                    tb.add_scalar("lr/encoder", float(lr_enc), it_base + it)
            if 0 < max_steps <= it:
                break
        dt = time.perf_counter() - t_epoch
        if n_batches:
            logging.info("epoch %d done: %.2f it/s  %s", epoch,
                         n_batches / dt, meter.summary())
        if epoch in checkpoints:
            save_checkpoint(save_dir, epoch, state, hyper)
        if 0 < max_steps <= it:
            break
    metrics_f.close()
    if tb is not None:
        tb.close()
    return state


def main(argv=None):
    from ..config import ArgumentParserX
    parser = ArgumentParserX(add_hyper_arg=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    return train(args)


if __name__ == "__main__":
    main()
