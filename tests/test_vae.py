"""VAE: shape contract, causality, and streaming == full-sequence decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.models import vae


@pytest.fixture(scope="module")
def params():
    return vae.init_vae_params(jax.random.PRNGKey(0), jnp.float32)


def test_spec_tables():
    enc = vae.encoder_specs()
    # 2 res per level x4 levels + 3 downsamples (vae.py:291-306)
    assert [k for k, *_ in enc] == [
        "res", "res", "downsample2d",
        "res", "res", "downsample3d",
        "res", "res", "downsample3d",
        "res", "res"]
    dec = vae.decoder_specs()
    assert [k for k, *_ in dec] == [
        "res", "res", "res", "upsample3d",
        "res", "res", "res", "upsample3d",
        "res", "res", "res", "upsample2d",
        "res", "res", "res"]
    # channel bookkeeping: first level of decoder keeps 384, halves after
    # each upsample resample conv
    assert dec[0][1:] == (384, 384)
    assert dec[3][1:] == (384, 192)
    assert dec[4][1:] == (192, 384)  # in 192 (post-halving), out 384


def test_encode_decode_shapes(params):
    B, T, H, W = 1, 5, 32, 32
    px = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3, H, W)) * 0.1
    lat = vae.encode(params, px)
    assert lat.shape == (B, 1 + (T - 1) // 4, 16, H // 8, W // 8)
    rec = vae.decode(params, lat)
    assert rec.shape == (B, T, 3, H, W)
    assert np.isfinite(np.asarray(rec)).all()


def test_decode_temporal_causality(params):
    """Causal VAE: perturbing a later latent frame must not change earlier
    pixel frames (this is what makes streaming decode possible)."""
    B, T, h, w = 1, 3, 4, 4
    z = jax.random.normal(jax.random.PRNGKey(2), (B, T, 16, h, w))
    z2 = z.at[:, -1].add(1.0)
    a = np.asarray(vae.decode(params, z, clamp=False))
    b = np.asarray(vae.decode(params, z2, clamp=False))
    # pixel frames of latent frames 0..1 -> first 1 + 4 = 5 frames
    np.testing.assert_allclose(a[:, :5], b[:, :5], atol=1e-5)
    assert np.abs(a[:, 5:] - b[:, 5:]).max() > 1e-4


def test_streaming_decode_matches_full(params):
    B, T, h, w = 1, 4, 4, 4
    z = jax.random.normal(jax.random.PRNGKey(3), (B, T, 16, h, w))
    full = np.asarray(vae.decode(params, z, clamp=False))
    stream = np.asarray(vae.decode_streaming(params, z, clamp=False))
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-4, rtol=1e-4)


def test_decode_to_frames_matches_f32_decode(params):
    """Production decode (bf16, device-side uint8/NTHWC) tracks the f32
    decode; the bridge tail is the [-1,1] suffix at full precision."""
    B, T, h, w = 1, 3, 4, 4
    z = jax.random.normal(jax.random.PRNGKey(5), (B, T, 16, h, w))
    frames, tail = jax.jit(vae.decode_to_frames)(params, z)
    Tpx = 1 + (T - 1) * 4
    assert frames.shape == (B, Tpx, h * 8, w * 8, 3)
    assert frames.dtype == jnp.uint8
    assert tail.shape == (B, 5, 3, h * 8, w * 8)
    assert tail.dtype == jnp.float32

    ref = np.asarray(vae.decode_streaming(params, z))    # f32 [-1,1] NCTHW
    ref_u8 = np.round((ref * 0.5 + 0.5) * 255.0).transpose(0, 1, 3, 4, 2)
    # bf16 decode vs f32: 50.8 dB at real geometry — a few counts of drift
    diff = np.abs(np.asarray(frames).astype(np.int32)
                  - ref_u8.astype(np.int32))
    assert np.mean(diff) < 2.0
    assert np.quantile(diff, 0.99) <= 8
    np.testing.assert_allclose(np.asarray(tail), ref[:, -5:], atol=0.05)
    # tail is exactly the decode the frames came from (self-consistency)
    own = np.round((np.asarray(tail) * 0.5 + 0.5) * 255.0)
    np.testing.assert_array_equal(
        own.transpose(0, 1, 3, 4, 2),
        np.asarray(frames[:, -5:], dtype=np.float64))


def test_latent_normalisation_roundtrip(params):
    """encode applies (mu-mean)/std; decode inverts it before conv2."""
    assert vae.LATENT_MEAN.shape == (16,)
    assert vae.LATENT_STD.shape == (16,)
    # spot values from wan_wrapper.py:57-66
    assert vae.LATENT_MEAN[0] == pytest.approx(-0.7571)
    assert vae.LATENT_STD[-1] == pytest.approx(1.9160)
