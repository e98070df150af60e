"""umT5 encoder: bucket table vs torch reference algorithm + forward."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mmpl_tpu.models import t5


def torch_bucket_reference(length, num_buckets=32, max_dist=128):
    """Independent torch realisation of t5.py:239-260 (bidirectional)."""
    rel_pos = (torch.arange(length)[None, :] - torch.arange(length)[:, None])
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).long() * nb
    rel_pos = torch.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (torch.log(rel_pos.float() / max_exact) /
                         np.log(max_dist / max_exact) *
                         (nb - max_exact)).long()
    large = torch.min(large, torch.full_like(large, nb - 1))
    rel_buckets += torch.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets.numpy()


def test_bucket_table_matches_torch():
    for L, nb in [(16, 8), (64, 32), (512, 32)]:
        got = t5.relative_position_buckets(L, nb)
        want = torch_bucket_reference(L, nb)
        np.testing.assert_array_equal(got, want)


def test_t5_encode_shapes_and_masking():
    cfg = t5.TINY_T5
    params = t5.init_t5_params(jax.random.PRNGKey(0), cfg)
    B, L = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0,
                             cfg["vocab_size"])
    mask = jnp.asarray(np.concatenate(
        [np.ones((B, 10)), np.zeros((B, 6))], axis=1).astype(np.int32))
    out = t5.t5_encode(params, cfg, ids, mask)
    assert out.shape == (B, L, cfg["dim"])
    out_np = np.asarray(out)
    assert np.isfinite(out_np).all()
    # padded positions zeroed (wan_wrapper.py:46-47)
    np.testing.assert_array_equal(out_np[:, 10:], 0.0)
    # masked tokens must not influence unmasked outputs
    ids2 = ids.at[:, 12].set((ids[:, 12] + 1) % cfg["vocab_size"])
    out2 = np.asarray(t5.t5_encode(params, cfg, ids2, mask))
    np.testing.assert_allclose(out_np[:, :10], out2[:, :10], atol=1e-6)


def test_umt5_xxl_config():
    # t5.py:456-467
    assert t5.UMT5_XXL == dict(vocab_size=256384, dim=4096, dim_attn=4096,
                               dim_ffn=10240, num_heads=64, num_layers=24,
                               num_buckets=32)
