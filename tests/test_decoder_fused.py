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


def _ref_grad(params, spec, lat, xyz):
    """XLA reference: (sdf, std, dsdf/dxyz) with latent stop-gradiented --
    the GN SDF term's exact computation (core/tracker._sdf_term)."""
    def f(x):
        sdf, _ = decode(params, spec, jax.lax.stop_gradient(lat), x)
        return sdf
    sdf_v, vjp_fn = jax.vjp(f, xyz)
    (g,) = vjp_fn(jnp.ones_like(sdf_v))
    _, std_v = decode(params, spec, lat, xyz)
    return sdf_v, std_v, g


def test_fused_grad_matches_xla_vjp(folded):
    """decode_grad_fused == decode + jax.vjp (sdf w.r.t. xyz), f32 atol 1e-6
    (round-3 verdict item 5: identical-numerics requirement for routing the
    tracker's SDF term through the fused kernel)."""
    spec, params = folded
    lat, xyz = _rand_inputs(777, spec, seed=11)     # pad path
    sdf_ref, std_ref, g_ref = _ref_grad(params, spec, lat, xyz)
    sdf, std, g = decoder_fused.decode_grad_fused(params, spec, lat, xyz,
                                                  tile=256, interpret=True)
    np.testing.assert_allclose(sdf, sdf_ref, atol=2e-6, rtol=0)
    np.testing.assert_allclose(std, std_ref, atol=2e-6, rtol=0)
    np.testing.assert_allclose(g, g_ref, atol=2e-6, rtol=0)


def test_fused_grad_bf16_close(folded):
    spec, params = folded
    lat, xyz = _rand_inputs(256, spec, seed=12)
    sdf_ref, std_ref, g_ref = _ref_grad(params, spec, lat, xyz)
    sdf, std, g = decoder_fused.decode_grad_fused(
        params, spec, lat, xyz, compute_dtype=jnp.bfloat16,
        tile=128, interpret=True)
    np.testing.assert_allclose(sdf, sdf_ref, atol=2e-2, rtol=0)
    np.testing.assert_allclose(g, g_ref, atol=0.15, rtol=0.05)
