"""Parity tests: the JAX decoder/encoder must reproduce the reference
checkpoint's outputs.  The torch side is computed here with plain functional
ops straight from the state dict (an independent expression of the architecture
in hyper.json), so a folding/concat/std-head bug on either side shows up."""
import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from difusion_tpu.models import (
    DecoderSpec, EncoderSpec, decode, decode_train, encode_points, encode_train,
    fold_decoder_params, fold_encoder_params, init_decoder_params, init_encoder_params,
)
from difusion_tpu.models import torch_import as TI

pytestmark = pytest.mark.skipif(not conftest.reference_ckpt_available(),
                                reason="reference checkpoint not mounted")


@pytest.fixture(scope="module")
def prior():
    return TI.load_torch_prior(conftest.REFERENCE_CKPT, use_epoch=300)


def torch_decoder_forward(state, x, latent_in=(3,), n_layers=5):
    """Reference decoder semantics in eval mode, straight from tensors."""
    import torch.nn.functional as F
    x = torch.as_tensor(x)
    inp = x
    std = None
    for i in range(n_layers):
        if i in latent_in:
            x = torch.cat([x, inp], dim=1)
        if i == n_layers - 1:
            std = F.linear(x, state["uncertainty_layer.weight"], state["uncertainty_layer.bias"])
            std = 0.05 + 0.5 * F.softplus(std)
        g = state[f"lin{i}.weight_g"]
        v = state[f"lin{i}.weight_v"]
        w = g * v / v.norm(dim=1, keepdim=True)
        x = F.linear(x, w, state[f"lin{i}.bias"])
        if i < n_layers - 1:
            x = F.relu(x)
    return torch.tanh(x), std


def torch_encoder_forward(state, x):
    """Reference encoder 'cnp' semantics in eval mode (BN running stats)."""
    import torch.nn.functional as F
    x = torch.as_tensor(x)
    for i in range(4):
        w = state[f"mlp.layer{i}.conv.weight"][:, :, 0]
        if f"mlp.layer{i}.normlayer.bn.weight" in state:
            x = F.linear(x, w)
            mean = state[f"mlp.layer{i}.normlayer.bn.running_mean"]
            var = state[f"mlp.layer{i}.normlayer.bn.running_var"]
            x = (x - mean) / torch.sqrt(var + 1e-5)
            x = x * state[f"mlp.layer{i}.normlayer.bn.weight"] + state[f"mlp.layer{i}.normlayer.bn.bias"]
            x = F.relu(x)
        else:
            x = F.linear(x, w, state[f"mlp.layer{i}.conv.bias"])
    return x


def test_decoder_matches_reference_ckpt(prior):
    dec_params, _, spec_d, _, _ = prior
    state = torch.load("/root/reference/pytorch/ckpt/default/model_300.pth.tar",
                       map_location="cpu", weights_only=True)["model_state"]
    rng = np.random.default_rng(1)
    latent = rng.normal(size=(257, spec_d.latent_size)).astype(np.float32) * 0.1
    xyz = rng.uniform(-0.5, 0.5, size=(257, 3)).astype(np.float32)

    ref_sdf, ref_std = torch_decoder_forward(state, np.concatenate([latent, xyz], axis=1))

    folded = fold_decoder_params(jax.tree.map(jnp.asarray, dec_params))
    sdf, std = decode(folded, spec_d, jnp.asarray(latent), jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(sdf), ref_sdf.numpy()[:, 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(std), ref_std.numpy()[:, 0], atol=2e-5)


def test_decoder_train_form_matches_folded(prior):
    dec_params, _, spec_d, _, _ = prior
    params = jax.tree.map(jnp.asarray, dec_params)
    rng = np.random.default_rng(2)
    net_in = rng.normal(size=(64, spec_d.input_dim)).astype(np.float32) * 0.3
    # train-form forward without dropout == folded inference forward
    sdf_t, std_t = decode_train({**params}, spec_d._replace(dropout_prob=0.0),
                                jnp.asarray(net_in), jax.random.key(0))
    folded = fold_decoder_params(params)
    sdf_f, std_f = decode(folded, spec_d, jnp.asarray(net_in[:, :spec_d.latent_size]),
                          jnp.asarray(net_in[:, spec_d.latent_size:]))
    np.testing.assert_allclose(np.asarray(sdf_t)[:, 0], np.asarray(sdf_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(std_t)[:, 0], np.asarray(std_f), atol=1e-6)


def test_encoder_matches_reference_ckpt(prior):
    _, enc_params, _, spec_e, _ = prior
    state = torch.load("/root/reference/pytorch/ckpt/default/encoder_300.pth.tar",
                       map_location="cpu", weights_only=True)["model_state"]
    rng = np.random.default_rng(3)
    xyzn = rng.normal(size=(513, 6)).astype(np.float32)

    ref = torch_encoder_forward(state, xyzn)

    folded = fold_encoder_params(jax.tree.map(jnp.asarray, enc_params))
    out = encode_points(folded, jnp.asarray(xyzn))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)


def test_encoder_train_mode_mean_pool(prior):
    _, enc_params, _, spec_e, _ = prior
    params = jax.tree.map(jnp.asarray, enc_params)
    rng = np.random.default_rng(4)
    surface = rng.normal(size=(4, 128, 6)).astype(np.float32)
    codes, new_params = encode_train(params, jnp.asarray(surface))
    assert codes.shape == (4, spec_e.latent_size)
    # BN running stats must move toward the batch statistics
    assert not np.allclose(np.asarray(new_params["layers"][0]["bn_mean"]),
                           np.asarray(params["layers"][0]["bn_mean"]))


def test_npz_roundtrip(prior, tmp_path):
    dec_params, enc_params, spec_d, _, _ = prior
    path = tmp_path / "prior.npz"
    TI.save_params_npz(str(path), decoder=dec_params, encoder=enc_params)
    loaded = TI.load_params_npz(str(path))
    rng = np.random.default_rng(5)
    latent = rng.normal(size=(16, spec_d.latent_size)).astype(np.float32) * 0.1
    xyz = rng.uniform(-0.5, 0.5, size=(16, 3)).astype(np.float32)
    f1 = fold_decoder_params(jax.tree.map(jnp.asarray, dec_params))
    f2 = fold_decoder_params(jax.tree.map(jnp.asarray, loaded["decoder"]))
    s1, _ = decode(f1, spec_d, jnp.asarray(latent), jnp.asarray(xyz))
    s2, _ = decode(f2, spec_d, jnp.asarray(latent), jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)


def test_random_init_shapes():
    spec_d = DecoderSpec()
    spec_e = EncoderSpec()
    pd = init_decoder_params(spec_d, jax.random.key(0))
    pe = init_encoder_params(spec_e, jax.random.key(1))
    assert pd["layers"][2]["v"].shape == (96, 128)   # latent_in shrink
    assert pd["layers"][3]["v"].shape == (128, 128)
    assert pe["layers"][0]["w"].shape == (32, 6)
    sdf, std = decode(fold_decoder_params(pd), spec_d,
                      jnp.zeros((8, 29)), jnp.zeros((8, 3)))
    assert sdf.shape == (8,) and std.shape == (8,)
    assert np.all(np.asarray(std) > 0.05)


def test_torch_export_roundtrip(prior, tmp_path):
    """Export to the reference's .pth.tar layout and re-import: bit equality
    (the two-way analog of jittor/convert.py)."""
    dec, enc, spec_d, spec_e, hyper = prior
    TI.save_torch_prior(str(tmp_path), 42, dec, enc, hyper)
    dec2, enc2, _, _, _ = TI.load_torch_prior(str(tmp_path / "hyper.json"), 42)
    for a, b in zip(jax.tree.leaves(dec), jax.tree.leaves(dec2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(enc), jax.tree.leaves(enc2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
