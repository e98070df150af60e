"""Rolling KV ring buffer for the few-step causal path (VERDICT r1 item 4).

Reference semantics: fixed-size cache, truncation of attention to the last
`max_attention_size` tokens, optional sink frames kept when rolling
(causal_model.py:203-226, :417-418).  The TPU design keeps the cache in
recency order so every steady-state block reuses ONE compiled program and
memory stays constant for arbitrarily long videos.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.core.geometry import GroupSchedule
from mmpl_tpu.models import dit
from mmpl_tpu.models.dit import embed_text, precompute_context_kv
from mmpl_tpu.models.fps_dit import init_kv_cache
from mmpl_tpu.pipelines.causal_inference import CausalInferencePipeline
from helpers import randomize_head


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, cfg.text_len, cfg.text_dim))
    return cfg, params, cond


def _pipe(cfg, params, **kw):
    return CausalInferencePipeline(cfg, params,
                                   denoising_step_list=(1000, 500),
                                   num_frame_per_block=3,
                                   dtype=jnp.float32, **kw)


def test_rolling_matches_growing_truncation(setup):
    """The ring buffer must reproduce the growing-cache path exactly: both
    attend to the same last-`max_attention_frames` window."""
    cfg, params, cond = setup
    F, cap = 12, 6
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, F, 16, 4, 4))

    ref = _pipe(cfg, params, local_attn_frames=cap).inference(
        noise, cond, rng=jax.random.PRNGKey(5))
    got_pipe = _pipe(cfg, params, max_attention_frames=cap)
    got = got_pipe.inference(noise, cond, rng=jax.random.PRNGKey(5))

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4,
                               rtol=1e-4)
    # blocks 0,1 warm up (2 static programs); blocks 2,3 share ONE rolling
    # program — compile count is bounded for any video length
    assert len(got_pipe._block_fns) == 2
    assert got_pipe._rolling_fn is not None


def test_rolling_long_video_constant_programs(setup):
    """3x the cache capacity: still only warmup + 1 rolling program."""
    cfg, params, cond = setup
    F, cap = 18, 6
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, F, 16, 4, 4))
    pipe = _pipe(cfg, params, max_attention_frames=cap)
    out = pipe.inference(noise, cond, rng=jax.random.PRNGKey(5))
    assert out.shape == (1, F, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    assert len(pipe._block_fns) == 2          # warmup: starts 0, 3
    # determinism across calls (program reuse, no retrace divergence)
    out2 = pipe.inference(noise, cond, rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_rolling_differs_from_full_attention(setup):
    """Sanity: truncation actually drops old frames (outputs must differ
    from an untruncated run once F > capacity)."""
    cfg, params, cond = setup
    F, cap = 12, 6
    noise = jax.random.normal(jax.random.PRNGKey(4), (1, F, 16, 4, 4))
    full = _pipe(cfg, params, local_attn_frames=F).inference(
        noise, cond, rng=jax.random.PRNGKey(5))
    rolled = _pipe(cfg, params, max_attention_frames=cap).inference(
        noise, cond, rng=jax.random.PRNGKey(5))
    # first cap frames identical (window not yet exceeded)...
    np.testing.assert_allclose(np.asarray(rolled)[:, :cap],
                               np.asarray(full)[:, :cap], atol=2e-4,
                               rtol=1e-4)
    # ...later frames see a truncated window
    assert np.abs(np.asarray(rolled)[:, cap + 3:]
                  - np.asarray(full)[:, cap + 3:]).mean() > 1e-5


def test_rolling_sink_frames(setup):
    """sink_frames pins the first frames in the attention window
    (StreamingLM-style sink, causal_model.py:417-418): each steady-state
    block must equal a hand-built growing-cache run whose visible set is
    {sink} ∪ {last cap-sink frames}."""
    cfg, params, cond = setup
    nb, cap, s0, F = 3, 9, 3, 15
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, F, 16, 4, 4))
    pipe = _pipe(cfg, params, max_attention_frames=cap, sink_frames=s0)
    got = np.asarray(pipe.inference(noise, cond, rng=jax.random.PRNGKey(5)))

    # expected: growing cache (slot == frame), explicit visible sets
    emb = embed_text(params, cond.astype(jnp.float32))
    ctx_kv = precompute_context_kv(params, cfg, emb)
    cache = init_kv_cache(cfg, 1, 4, num_slots=F, dtype=jnp.float32)
    rng = jax.random.PRNGKey(5)
    outs = []
    for start in range(0, F, nb):
        end = start + nb
        if end <= cap:
            vis = tuple(range(end))
        else:
            vis = tuple(sorted(set(range(s0))
                               | set(range(end - (cap - s0), end))))
        sched = GroupSchedule(index=start,
                              frames=tuple(range(start, end)),
                              append_mode=False,
                              write_slots=tuple(range(start, end)),
                              visible_frames=vis, visible_slots=vis,
                              anchor_group=False)
        rng, sub = jax.random.split(rng)
        x, cache = pipe._denoise_block(sched, params, ctx_kv, cache,
                                       noise[:, start:end], sub)
        outs.append(np.asarray(x))
    want = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_rolling_misaligned_capacity_raises(setup):
    cfg, params, cond = setup
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 12, 16, 4, 4))
    pipe = _pipe(cfg, params, max_attention_frames=7)
    with pytest.raises(AssertionError, match="rolling KV"):
        pipe.inference(noise, cond)
