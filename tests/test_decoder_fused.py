"""Parity tests for the fused Pallas decoder kernel (ops/decoder_fused.py)
against the XLA decode path (models/decoder.py), interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusion_tpu.models.decoder import (DecoderSpec, decode,
                                         fold_decoder_params,
                                         init_decoder_params)
from difusion_tpu.ops import decoder_fused


@pytest.fixture(scope="module")
def folded():
    spec = DecoderSpec()
    params = init_decoder_params(spec, jax.random.PRNGKey(3))
    return spec, fold_decoder_params(params)


def _rand_inputs(n, spec, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.normal(0, 0.3, (n, spec.latent_size)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-0.5, 1.5, (n, 3)), jnp.float32)
    return lat, xyz


def test_fused_matches_decode_f32(folded):
    spec, params = folded
    lat, xyz = _rand_inputs(777, spec)      # non-multiple of tile: pad path
    sdf_ref, std_ref = decode(params, spec, lat, xyz)
    sdf, std = decoder_fused.decode_fused(params, spec, lat, xyz,
                                          tile=256, interpret=True)
    np.testing.assert_allclose(sdf, sdf_ref, atol=2e-6, rtol=0)
    np.testing.assert_allclose(std, std_ref, atol=2e-6, rtol=0)


def test_fused_weight_norm_params_and_multi_tile(folded):
    spec, _ = folded
    params = init_decoder_params(spec, jax.random.PRNGKey(9))  # unfolded g/v
    lat, xyz = _rand_inputs(512, spec, seed=4)
    sdf_ref, std_ref = decode(params, spec, lat, xyz)
    sdf, std = decoder_fused.decode_fused(params, spec, lat, xyz,
                                          tile=128, interpret=True)
    np.testing.assert_allclose(sdf, sdf_ref, atol=2e-6, rtol=0)
    np.testing.assert_allclose(std, std_ref, atol=2e-6, rtol=0)


def test_fused_bf16_close(folded):
    spec, params = folded
    lat, xyz = _rand_inputs(300, spec, seed=7)
    sdf_ref, std_ref = decode(params, spec, lat, xyz)
    sdf, std = decoder_fused.decode_fused(params, spec, lat, xyz,
                                          compute_dtype=jnp.bfloat16,
                                          tile=128, interpret=True)
    # bf16 matmuls, f32 accumulation: expect ~1e-2 absolute agreement on a
    # tanh-bounded sdf and the softplus std head
    np.testing.assert_allclose(sdf, sdf_ref, atol=2e-2, rtol=0)
    np.testing.assert_allclose(std, std_ref, atol=2e-2, rtol=0)


def test_unsupported_spec_raises(folded):
    spec = DecoderSpec(dims=(64, 64), latent_in=(1,), dropout=(), norm_layers=(0, 1))
    params = init_decoder_params(spec, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        decoder_fused.pack_fused_decoder(params, spec)
    assert not decoder_fused.supports_spec(spec)
    assert decoder_fused.supports_spec(DecoderSpec())
