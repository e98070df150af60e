"""Golden-artifact test against the reference's committed handoff tensor.

`/root/reference/MMPL_i2v/latents_chunk4.pt` is a REAL pipeline handoff
saved by the reference i2v service mid-generation
(MMPL_i2v/pipeline/casual_fps_inference.py:341-343: [frame0, frame19,
frame20] -> shape [1, 3, 16, 60, 104] bf16).  This validates that our i2v
plan produces handoffs of exactly that contract and that the inter-chunk
bridge consumes the real artifact.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FIXTURE = "/root/reference/MMPL_i2v/latents_chunk4.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixture not mounted")


@pytest.fixture(scope="module")
def golden():
    import torch
    t = torch.load(FIXTURE, map_location="cpu", weights_only=False)
    return t.float().numpy()


def test_fixture_matches_handoff_contract(golden):
    from mmpl_tpu.core.geometry import i2v_plan
    plan = i2v_plan()
    B, n, C, H, W = golden.shape
    assert (n, C, H, W) == (len(plan.handoff_frames), 16, 60, 104)
    assert np.isfinite(golden).all()
    # real latents are roughly unit-scale (normalised by the VAE stats)
    assert 0.2 < np.abs(golden).mean() < 2.0


def test_bridge_consumes_real_handoff(golden):
    """The causal pixel bridge must accept the reference's real artifact
    (downscaled spatially to keep the CPU run tractable) and produce
    2 well-formed context latents."""
    from mmpl_tpu.models import vae
    from mmpl_tpu.parallel.chunk_pipeline import make_bridge_fn

    # spatial downsample the latent grid 60x104 -> 6x8 (channel stats kept)
    g = golden[:, :, :, ::10, ::13]
    vae_params = vae.init_vae_params(jax.random.PRNGKey(0))
    bridge, vp = make_bridge_fn(vae_params, g.shape[1])
    out = np.asarray(bridge(vp, jnp.asarray(g)))
    assert out.shape == (1, 2, 16, g.shape[3], g.shape[4])
    assert np.isfinite(out).all()
