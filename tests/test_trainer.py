"""Trainer tests: loss decrease on a synthetic LIF dataset, checkpoint
round-trip, and data-parallel sharding over the virtual 8-device mesh
(capability parity with pytorch/network_trainer.py)."""
import json
import time

import numpy as np
import pytest

import conftest  # noqa: F401  (platform setup)

import jax
import jax.numpy as jnp

from difusion_tpu.models.decoder import DecoderSpec
from difusion_tpu.models.encoder import EncoderSpec
from difusion_tpu.train import lif_dataset as ldata
from difusion_tpu.train import trainer as TR
from difusion_tpu.train.losses import LossConfig

SPEC_D = DecoderSpec()
SPEC_E = EncoderSpec()
LOSS = LossConfig()


pytestmark = pytest.mark.slow

def make_synthetic_lif_dir(path, n_lifs=12, seed=0):
    """Sphere-cap SDFs in voxel-local coords, reference payload format."""
    rng = np.random.default_rng(seed)
    payload = path / "payload"
    payload.mkdir(parents=True)
    sources = []
    for i in range(n_lifs):
        r = rng.uniform(0.2, 0.4)   # surface crosses the [-0.5, 0.5] box so
        c = rng.uniform(-0.15, 0.15, 3)  # both sdf signs are populated
        xyz = rng.uniform(-0.5, 0.5, (800, 3)).astype(np.float32)
        sdf = (np.linalg.norm(xyz - c, axis=1) - r).astype(np.float32)
        data = np.concatenate([xyz, sdf[:, None]], axis=1)
        # surface points: project random dirs onto the sphere, keep in-box
        dirs = rng.normal(size=(600, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        surf_xyz = (c + dirs * r).astype(np.float32)
        surf = np.concatenate([surf_xyz, dirs.astype(np.float32)], axis=1)
        np.savez(payload / ("%08d.npz" % i), data=data, surface=surf)
        sources.append(f"lif_{i}")
    (path / "source.json").write_text(json.dumps(sources))
    return path


@pytest.fixture(scope="module")
def lif_dir(tmp_path_factory):
    return make_synthetic_lif_dir(tmp_path_factory.mktemp("lif"))


def test_lif_dataset_sampling(lif_dir):
    ds = ldata.LifDataset(str(lif_dir), num_sample=64, num_surface_sample=32,
                          augment_rotation="Y", augment_noise=(0.01, 20.0))
    samples, surface = ds[0]
    assert samples.shape == (64, 4)
    assert surface.shape == (32, 6)
    # pos/neg balance: first half positive, second negative
    assert (samples[:32, 3] > 0).all() and (samples[32:, 3] <= 0).all()
    # normals stay unit under perturbation
    assert np.allclose(np.linalg.norm(surface[:, 3:6], axis=1), 1.0, atol=1e-4)

    combined = ldata.LifCombinedDataset(ds, ds)
    assert len(combined) == 2 * len(ds)
    batches = list(ldata.iterate_batches(combined, 4, np.random.default_rng(0)))
    assert batches[0][0].shape == (4, 64, 4)
    assert batches[0][1].shape == (4, 32, 6)


def test_lif_dataset_cached_scheme(lif_dir):
    """The reference's 'cached$local://<path>' scheme holds payloads in RAM
    after first touch (reference dataset path decoration); raw payloads must
    be identical through the cache, and draws stay stochastic."""
    plain = ldata.LifDataset(str(lif_dir), num_sample=64,
                             num_surface_sample=32)
    cached = ldata.LifDataset("cached$local://" + str(lif_dir), num_sample=64,
                              num_surface_sample=32)
    assert cached._cache is not None and plain._cache is None
    for i in range(min(3, len(plain))):
        a, b = plain.get_raw_data(i), cached.get_raw_data(i)
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["surface"], b["surface"])
    assert len(cached._cache) >= 1
    # second touch serves from RAM (same object) and samples still vary
    assert cached.get_raw_data(0) is cached.get_raw_data(0)
    s1, _ = cached[0]
    s2, _ = cached[0]
    assert not np.array_equal(s1, s2)


def test_packed_loader_matches_per_item_distributions(lif_dir):
    """The packed (vectorized) loader draws from the same distributions as
    the per-item path: identical pos/neg balance, unit normals under the cone
    perturbation, per-kind rotation structure, and matching sample moments
    on repeated draws of one LIF."""
    for rot in (None, "Y", "X", "Z", "3D"):
        ds = ldata.LifDataset(str(lif_dir), num_sample=64,
                              num_surface_sample=32, augment_rotation=rot,
                              augment_noise=(0.01, 20.0))
        packed = ldata.pack_dataset(ds)
        rng = np.random.default_rng(3)
        ids = np.arange(len(ds))
        samples, surface = packed.sample_batch(ids, rng)
        assert samples.shape == (len(ds), 64, 4)
        assert surface.shape == (len(ds), 32, 6)
        assert (samples[:, :32, 3] > 0).all() and (samples[:, 32:, 3] <= 0).all()
        assert np.allclose(np.linalg.norm(surface[:, :, 3:6], axis=-1), 1.0,
                           atol=1e-4)
        if rot == "Y":
            # a Y rotation never mixes the y coordinate: sdf y-draws stay
            # inside the payload's own y support
            raw = ds.get_raw_data(0)["data"]
            assert samples[0, :, 1].min() >= raw[:, 1].min() - 1e-5
            assert samples[0, :, 1].max() <= raw[:, 1].max() + 1e-5

    # moments of repeated draws of one LIF agree between the two paths
    ds = ldata.LifDataset(str(lif_dir), num_sample=256, num_surface_sample=64,
                          augment_rotation="3D", augment_noise=(0.01, 20.0))
    packed = ldata.pack_dataset(ds)
    old = np.stack([ds[2][0] for _ in range(100)])
    new, _ = packed.sample_batch(np.full(100, 2), np.random.default_rng(5))
    # radial statistics are rotation-invariant -> tight agreement
    r_old = np.linalg.norm(old[:, :, :3], axis=-1)
    r_new = np.linalg.norm(new[:, :, :3], axis=-1)
    assert abs(r_old.mean() - r_new.mean()) < 0.01
    assert abs(old[:, :, 3].mean() - new[:, :, 3].mean()) < 0.01


def test_packed_disk_cache_roundtrip(tmp_path):
    """The on-disk pack cache reloads to arrays identical to a fresh pack,
    invalidates when source.json changes, and never touches the cached$
    payload dict while packing (the double-residency that OOM-killed the
    study run)."""
    d = make_synthetic_lif_dir(tmp_path / "lifs", n_lifs=6, seed=3)
    ds = ldata.LifDataset("cached$local://" + str(d), num_sample=32,
                          num_surface_sample=16)
    fresh = ldata.PackedLifDataset(ds, disk_cache=False)
    assert ds._cache == {}, "packing must not populate the payload cache"
    assert not (d / "packed_cache").exists()

    ldata.PackedLifDataset(ds)            # writes the cache
    assert (d / "packed_cache" / "meta.json").exists()
    reloaded = ldata.PackedLifDataset(ds)  # mmap reload
    assert isinstance(reloaded.pos, np.memmap)
    for k in ("pos", "neg", "surf", "pos_count", "neg_count", "surf_count"):
        np.testing.assert_array_equal(np.asarray(getattr(reloaded, k)),
                                      np.asarray(getattr(fresh, k)))
    # identical draws from the same rng stream
    rng_a, rng_b = np.random.default_rng(7), np.random.default_rng(7)
    sa, fa = fresh.sample_batch(np.arange(6), rng_a)
    sb, fb = reloaded.sample_batch(np.arange(6), rng_b)
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(fa, fb)

    # touching source.json invalidates the cache (size change)
    src = d / "source.json"
    src.write_text(src.read_text() + " ")
    ds2 = ldata.LifDataset(str(d), num_sample=32, num_surface_sample=16)
    again = ldata.PackedLifDataset(ds2)    # re-packs and rewrites
    assert not isinstance(again.pos, np.memmap) or \
        np.asarray(again.pos).shape == np.asarray(fresh.pos).shape
    np.testing.assert_array_equal(np.asarray(again.pos), np.asarray(fresh.pos))


def test_packed_rejects_empty_split_loudly(tmp_path):
    """A LIF with zero pos (or neg/surface) rows must raise at pack time:
    silently the gather would land on the NEXT LIF's rows (off+floor(u*0))
    and train on wrong-voxel data."""
    d = make_synthetic_lif_dir(tmp_path / "lifs", n_lifs=3, seed=1)
    with np.load(d / "payload" / "00000001.npz") as bad:
        data, surf = bad["data"], bad["surface"]
    np.savez(d / "payload" / "00000001.npz",
             data=data[data[:, 3] <= 0],       # all-negative: pos is empty
             surface=surf)
    ds = ldata.LifDataset(str(d), num_sample=32, num_surface_sample=16)
    with pytest.raises(ValueError, match="empty pos/neg/surface"):
        ldata.PackedLifDataset(ds, disk_cache=False)


def test_packed_odd_num_sample_matches_per_item_row_count(tmp_path):
    """Odd samples_per_lif: the per-item path yields 2*(S//2) rows; the
    packed combined path must produce the same count, not crash on a
    preallocated S-row buffer."""
    d = make_synthetic_lif_dir(tmp_path / "lifs", n_lifs=4, seed=2)
    ds = ldata.LifDataset(str(d), num_sample=33, num_surface_sample=16)
    per_item, _ = ds[0]
    assert per_item.shape[0] == 32
    packed = ldata.pack_dataset(ldata.LifCombinedDataset(ds))
    s, f = packed.sample_batch(np.arange(4), np.random.default_rng(0))
    assert s.shape == (4, 32, 4)


def test_prefetch_device_early_exit_does_not_hang(tmp_path):
    """Closing the consumer mid-stream (trainer max_steps break, test
    teardown) must unblock the worker and drain the queue rather than pin
    converted batches forever."""
    import itertools
    import threading

    n_alive_before = threading.active_count()
    gen = ldata.prefetch_device(iter(range(1000)), lambda x: x, depth=2)
    assert next(gen) == 0
    gen.close()                       # early exit
    deadline = time.time() + 5.0
    while threading.active_count() > n_alive_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_alive_before, \
        "prefetch worker still alive after consumer close"


def test_packed_combined_routes_ids(lif_dir):
    ds1 = ldata.LifDataset(str(lif_dir), num_sample=64, num_surface_sample=32)
    ds2 = ldata.LifDataset(str(lif_dir), num_sample=64, num_surface_sample=32,
                           augment_rotation="Y")
    combined = ldata.LifCombinedDataset(ds1, ds2)
    packed = ldata.pack_dataset(combined)
    assert len(packed) == 2 * len(ds1)
    rng = np.random.default_rng(0)
    batches = list(ldata.iterate_batches_packed(packed, 4, rng))
    assert len(batches) == len(packed) // 4
    for s, f, ids in batches:
        assert s.shape == (4, 64, 4) and f.shape == (4, 32, 6)
        assert np.isfinite(s).all() and np.isfinite(f).all()
    # every id appears exactly once per epoch
    seen = np.concatenate([b[2] for b in batches])
    assert len(np.unique(seen)) == len(seen)


def test_train_step_reduces_loss(lif_dir):
    ds = ldata.LifDataset(str(lif_dir), num_sample=128, num_surface_sample=64)
    state = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    rng = np.random.default_rng(1)
    key = jax.random.key(2)
    losses_hist = []
    for step in range(30):
        batch = [ds[int(i)] for i in rng.integers(0, len(ds), 4)]
        sdf = jnp.asarray(np.stack([b[0] for b in batch]))
        surf = jnp.asarray(np.stack([b[1] for b in batch]))
        key, sub = jax.random.split(key)
        state, losses = TR.train_step(SPEC_D, LOSS, state, sdf, surf, sub,
                                      jnp.float32(1e-3), jnp.float32(1e-3),
                                      jnp.float32(1.0))
        losses_hist.append(float(losses["total"]))
    assert int(state.step) == 30
    assert np.mean(losses_hist[-5:]) < np.mean(losses_hist[:5]) - 0.1, losses_hist


def test_checkpoint_roundtrip(lif_dir, tmp_path):
    state = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    hyper = {"run_name": "t", "code_length": 29}
    TR.save_checkpoint(tmp_path, 5, state, hyper)
    assert (tmp_path / "hyper.json").exists()
    state2 = TR.load_checkpoint(tmp_path, 5, SPEC_D, SPEC_E)
    a = jax.tree.leaves(state.dec_params)
    b = jax.tree.leaves(state2.dec_params)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y))


def test_data_parallel_step_matches_single_device(lif_dir):
    """DP over the 8-device mesh must match the single-device step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = ldata.LifDataset(str(lif_dir), num_sample=64, num_surface_sample=32)
    batch = [ds[i % len(ds)] for i in range(8)]
    sdf = jnp.asarray(np.stack([b[0] for b in batch]))
    surf = jnp.asarray(np.stack([b[1] for b in batch]))
    key = jax.random.key(3)

    state1 = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    state1, losses1 = TR.train_step(SPEC_D, LOSS, state1, sdf, surf, key,
                                    jnp.float32(1e-3), jnp.float32(1e-3),
                                    jnp.float32(1.0))

    mesh = TR.make_mesh(8)
    state2 = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    state2 = TR.TrainState(*TR.replicate(mesh, tuple(state2)))
    sdf_s, surf_s = TR.shard_batch(mesh, sdf, surf)
    state2, losses2 = TR.train_step(SPEC_D, LOSS, state2, sdf_s, surf_s, key,
                                    jnp.float32(1e-3), jnp.float32(1e-3),
                                    jnp.float32(1.0))
    assert np.isclose(float(losses1["total"]), float(losses2["total"]),
                      rtol=1e-4), (losses1, losses2)
    for x, y in zip(jax.tree.leaves(state1.dec_params),
                    jax.tree.leaves(state2.dec_params)):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_tensor_parallel_step_matches_single_device(lif_dir):
    """dp=2 x tp=4 mesh: column-parallel weights + sharded batch must match
    the single-device step numerically."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = ldata.LifDataset(str(lif_dir), num_sample=64, num_surface_sample=32)
    batch = [ds[i % len(ds)] for i in range(8)]
    sdf = jnp.asarray(np.stack([b[0] for b in batch]))
    surf = jnp.asarray(np.stack([b[1] for b in batch]))
    key = jax.random.key(3)

    state1 = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    state1, losses1 = TR.train_step(SPEC_D, LOSS, state1, sdf, surf, key,
                                    jnp.float32(1e-3), jnp.float32(1e-3),
                                    jnp.float32(1.0))

    mesh = TR.make_mesh(8, tp=4)
    assert mesh.shape == {"data": 2, "model": 4}
    state2 = TR.create_train_state(SPEC_D, SPEC_E, jax.random.key(0))
    state2 = TR.shard_state_tp(state2, mesh)
    sdf_s, surf_s = TR.shard_batch(mesh, sdf, surf)
    state2, losses2 = TR.train_step(SPEC_D, LOSS, state2, sdf_s, surf_s, key,
                                    jnp.float32(1e-3), jnp.float32(1e-3),
                                    jnp.float32(1.0))
    assert np.isclose(float(losses1["total"]), float(losses2["total"]),
                      rtol=1e-4)
    for x, y in zip(jax.tree.leaves(state1.dec_params),
                    jax.tree.leaves(state2.dec_params)):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=3e-5)


def test_train_driver_end_to_end(lif_dir, tmp_path):
    """The epoch driver (config surface of network_trainer.main): runs
    batches, applies LR schedules, writes resumable checkpoints."""
    hyper = dict(
        run_name="t", num_epochs=1, batch_size=4, batch_split=1,
        samples_per_lif=64,
        lr_schedule=[{"Type": "Step", "Initial": 1e-3, "Interval": 80, "Factor": 0.4},
                     {"Type": "Constant", "Value": 1e-3}],
        train_set=[{"data_path": str(lif_dir), "augment_rotation": "Y",
                    "num_surface_sample": 32, "augment_noise": [0.01, 20.0]}],
        code_bound=None, code_length=29,
        network_name="di_decoder",
        network_specs=dict(dims=[128, 128, 128, 128], dropout=[0, 1, 2, 3, 4, 5],
                           dropout_prob=0.2, norm_layers=[0, 1, 2, 3, 4, 5],
                           latent_in=[3], weight_norm=True),
        encoder_name="di_encoder",
        encoder_specs=dict(per_point_feat=[6, 32, 64, 256], latent_size=29),
        snapshot_frequency=1, additional_snapshots=[],
        training_loss=dict(types=["neg_log_likelihood", "reg_loss"],
                           enforce_minmax=True, clamping_distance=0.2,
                           code_reg_lambda=0.01),
        save_dir=str(tmp_path / "ckpt"),
    )
    # Run the driver in a FRESH process.  In-process, this exact train-step
    # compile segfaults inside XLA:CPU's LLVM when it happens at the tail of
    # a full-suite run (reproducible at tests/ position 147/147; the same
    # test is green standalone and in every smaller grouping tried) -- a
    # long-lived-process compiler issue, not a trainer bug.  A subprocess is
    # also the more faithful e2e: it exercises the real CLI entry state.
    import os
    import subprocess
    import sys as _sys
    (tmp_path / "hyper_in.json").write_text(json.dumps(hyper))
    code = ("import json, sys\n"
            "from difusion_tpu.train import trainer as TR\n"
            "h = json.load(open(sys.argv[1]))\n"
            "st = TR.train(h, max_steps=3)\n"
            "print('FINAL_STEP', int(st.step))\n")
    proc = subprocess.run(
        [_sys.executable, "-c", code, str(tmp_path / "hyper_in.json")],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FINAL_STEP 3" in proc.stdout
    assert (tmp_path / "ckpt" / "prior_1.npz").exists()
    assert (tmp_path / "ckpt" / "hyper.json").exists()
    # resumable + loadable by the SLAM prior loader
    st2 = TR.load_checkpoint(tmp_path / "ckpt", 1, SPEC_D, SPEC_E)
    assert int(st2.step) == 3
    from difusion_tpu.slam import load_prior
    dec, enc, spec = load_prior(str(tmp_path / "ckpt" / "hyper.json"), 1)
    assert spec.latent_size == 29

    # driver-level resume (`resume_epoch`): continues from the snapshot's
    # optimizer step instead of restarting (the reference hardcodes
    # start_epoch=1, network_trainer.py:91)
    hyper2 = dict(hyper, resume_epoch=1, num_epochs=2)
    (tmp_path / "hyper_resume.json").write_text(json.dumps(hyper2))
    code2 = code.replace("max_steps=3", "max_steps=5")
    proc2 = subprocess.run(
        [_sys.executable, "-c", code2, str(tmp_path / "hyper_resume.json")],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    # resumed at optimizer step 3, then ran epoch 2's full 3 batches
    # (12 LIFs / batch 4) before max_steps could bite
    assert "FINAL_STEP 6" in proc2.stdout, proc2.stdout[-500:]
    assert (tmp_path / "ckpt" / "prior_2.npz").exists()

def test_training_report_resume_dedup(tmp_path):
    """summarize() applies latest-write-wins on the global `it` axis: an
    interrupted invocation's tail rows (past the snapshot a resume restarted
    from) are superseded by the resumed run's re-coverage."""
    import os as _os
    import sys as _sys2
    _sys2.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tools"))
    from training_report import summarize
    rows = (
        # first invocation: it 10..50, dies after it 50
        [{"epoch": e, "it": it, "lr_dec": 1e-3, "lr_enc": 1e-3,
          "t": 100.0 + it, "total": 1.0 / it} for e, it in
         [(1, 10), (1, 20), (2, 30), (2, 40), (3, 50)]] +
        # resume from the epoch-2 snapshot (it 40): re-covers 50, then on
        [{"epoch": e, "it": it, "lr_dec": 1e-3, "lr_enc": 1e-3,
          "t": 500.0 + it, "total": 0.5 / it} for e, it in
         [(3, 50), (3, 60), (4, 70)]])
    (tmp_path / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    s = summarize(str(tmp_path))
    its = [c["it"] for c in s["curve"]]
    assert its == sorted(set(its))            # strictly increasing
    assert s["total_its"] == 70 and s["epochs"] == 4
    # the surviving it=50 row is the RESUMED one (loss 0.5/50, not 1.0/50)
    it50 = [c for c in s["curve"] if c["it"] == 50]
    assert it50 and abs(it50[0]["total"] - 0.5 / 50) < 1e-9
    # rate from per-row deltas ignores the cross-invocation wall gap
    assert s["it_per_s"] == 1.0
