"""Model correctness: RoPE vs complex-arithmetic reference, flash vs dense
attention, DiT shapes, and the FPS planned-cache model vs a dynamic-index
twin that follows the reference's runtime algorithm
(causal_fps_model.py:193-264) token by token.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.core import geometry as G
from mmpl_tpu.models import dit
from mmpl_tpu.models.fps_dit import fps_forward_group, init_kv_cache
from mmpl_tpu.ops import rope
from mmpl_tpu.ops.attention import dense_attention, flash_attention


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_complex_reference(x, frame_positions, gh, gw):
    """Independent realisation with explicit complex arithmetic, mirroring
    torch.view_as_complex semantics (model.py:29-67)."""
    B, L, N, D = x.shape
    half = D // 2
    dt, dh, dw = rope.band_dims(D)
    ft = 1.0 / np.power(10000, np.arange(0, dt, 2) / dt)
    fh = 1.0 / np.power(10000, np.arange(0, dh, 2) / dh)
    fw = 1.0 / np.power(10000, np.arange(0, dw, 2) / dw)
    out = np.zeros_like(x, dtype=np.float64)
    xi = x.astype(np.float64)
    for i, f in enumerate(frame_positions):
        for r in range(gh):
            for c in range(gw):
                tok = (i * gh + r) * gw + c
                ang = np.concatenate([f * ft, r * fh, c * fw])
                z = xi[:, tok, :, 0::2] + 1j * xi[:, tok, :, 1::2]
                z = z * np.exp(1j * ang)[None, None, :]
                out[:, tok, :, 0::2] = z.real
                out[:, tok, :, 1::2] = z.imag
    return out


def test_rope_matches_complex_reference():
    B, N, D, gh, gw = 2, 3, 24, 2, 3
    frames = (0, 5, 19)
    L = len(frames) * gh * gw
    x = np.random.default_rng(0).standard_normal((B, L, N, D)).astype(
        np.float32)
    cos, sin = rope.rope_table(frames, gh, gw, D)
    got = np.asarray(rope.apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                     jnp.asarray(sin)))
    want = rope_complex_reference(x, frames, gh, gw)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rope_band_dims_14b_head():
    # head_dim 128: 44 + 42 + 42 (model.py:607-613)
    assert rope.band_dims(128) == (44, 42, 42)
    cos, sin = rope.rope_table((0, 1), 2, 2, 128)
    assert cos.shape == (8, 64)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lq,lk", [(16, 16), (130, 200), (256, 512),
                                   (100, 1000)])
def test_flash_matches_dense(lq, lk):
    key = jax.random.PRNGKey(0)
    B, N, D = 2, 3, 64
    q = jax.random.normal(key, (B, lq, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, lk, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, lk, N, D), jnp.float32)
    want = dense_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_legalizes_unaligned_block_k():
    # A block_k that neither divides Lk nor is a multiple of 128 would make
    # the key-padding bias row's (1, block_k) tile illegal to lower (lane
    # dim must be %128); the dispatch must legalize it, not crash.  This is
    # the on-chip failure from runs/onchip_r5.log ((256, 2520) @ Lk=28080).
    from mmpl_tpu.ops.attention import _legalize_blocks
    assert _legalize_blocks(4680, 28080, 256, 2520) == (256, 2432)
    assert _legalize_blocks(4680, 32760, 256, 2520) == (256, 2520)  # exact
    assert _legalize_blocks(100, 200, 130, 140) == (128, 128)
    key = jax.random.PRNGKey(0)
    B, N, D = 1, 2, 64
    q = jax.random.normal(key, (B, 96, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, 280, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, 280, N, D), jnp.float32)
    want = dense_attention(q, k, v)
    # 200 % 8 == 0 but 280 % 200 != 0 and 200 % 128 != 0 -> legalized to 128
    got = flash_attention(q, k, v, block_q=128, block_k=200, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # gradient path must legalize identically (padding shapes must agree)
    w = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32)
    g = jax.grad(lambda q_: jnp.sum(flash_attention(
        q_, k, v, block_q=128, block_k=200, interpret=True) * w))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(dense_attention(q_, k, v) * w))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-5)


def test_dense_attention_mask():
    q = jnp.ones((1, 2, 1, 4))
    k = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 1, 4)),
                    jnp.float32)
    v = jnp.asarray(np.eye(3, 4)[None, :, None, :], jnp.float32)
    mask = jnp.asarray([[True, True, False], [True, True, True]])[None, None]
    out = dense_attention(q, k, v, mask=mask)
    # first query must have zero weight on key 2
    assert np.asarray(out)[0, 0, 0, 2] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Bidirectional DiT
# ---------------------------------------------------------------------------

def test_dit_forward_shapes():
    cfg = tiny_test_config()
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, F, C, H, W = 1, 3, 16, 8, 8
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, F, C, H, W))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.text_len,
                                                    cfg.text_dim))
    out = dit.dit_forward(params, cfg, lat, t, ctx)
    assert out.shape == (B, F, cfg.out_dim, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_patchify_unpatchify_roundtrip():
    cfg = tiny_test_config()
    B, F, H, W = 1, 2, 8, 12
    C = cfg.dim // 4  # so identity patch embedding is shape-compatible
    # identity patch embedding: kernel = I
    p = {"kernel": jnp.eye(4 * C), "bias": jnp.zeros((4 * C,))}
    lat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, F, C, H, W)), jnp.float32)
    toks = dit.patchify(p, lat, (1, 2, 2))
    assert toks.shape == (B, F * (H // 2) * (W // 2), C * 4)
    # unpatchify expects feature order (pt, ph, pw, c); patchify produces
    # (c, ph, pw) -> permute accordingly before inverting
    x = toks.reshape(B, -1, C, 2, 2).transpose(0, 1, 3, 4, 2).reshape(
        B, -1, 4 * C)
    rec = dit.unpatchify(x, F, (H // 2, W // 2), (1, 2, 2), C)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(lat), atol=1e-6)


# ---------------------------------------------------------------------------
# FPS planned-cache model vs dynamic-index twin
# ---------------------------------------------------------------------------

def dynamic_twin_forward(params, cfg, latents, t, ctx_kv, flat_cache,
                         vis_tokens, frames, S, rng_order):
    """Follows causal_fps_model.py:193-264 with runtime token-index lists.

    flat_cache: {'k','v'}: [L, B, SLOTS*S, N, d] token-flat cache.
    vis_tokens: python list of *frame-start token offsets* (arbitrary order,
    like the reference's `attention_vis_index`). Returns (flow, cache, vis).
    """
    B, Gn, C, H, W = latents.shape
    gh, gw = H // 2, W // 2
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    x = dit.patchify(params["patch_embedding"], latents, cfg.patch_size)
    e, e0 = dit.time_embed(params, cfg, t)
    cos, sin = rope.rope_table(tuple(frames), gh, gw, d)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    current_start = [f * S for f in frames]
    append_mode = 15 * S in current_start

    if not append_mode:
        vis_tokens = list(dict.fromkeys(vis_tokens + current_start))
        rng_order.shuffle(vis_tokens)  # reference order is arbitrary
    calc = [v - 6 * S if v >= 19 * S else v for v in vis_tokens]
    all_idx = jnp.asarray([i for s0 in calc for i in range(s0, s0 + S)])

    num_layers = cfg.num_layers
    new_k = []
    new_v = []
    xc = x
    for l in range(num_layers):
        bp = jax.tree.map(lambda a: a[l], params["blocks"])
        ckv = jax.tree.map(lambda a: a[l], ctx_kv)
        ck = flat_cache["k"][l]
        cv = flat_cache["v"][l]

        def self_attn_fn(xm, ck=ck, cv=cv, bp=bp, store=(new_k, new_v)):
            sp = bp["self_attn"]
            L = xm.shape[1]
            q = dit.rms_norm(dit.linear(sp["q"], xm),
                             sp["norm_q"]["weight"]).reshape(B, L, n, d)
            k = dit.rms_norm(dit.linear(sp["k"], xm),
                             sp["norm_k"]["weight"]).reshape(B, L, n, d)
            v = dit.linear(sp["v"], xm).reshape(B, L, n, d)
            q = rope.apply_rope(q, cos, sin)
            k = rope.apply_rope(k, cos, sin)
            if append_mode:
                kv_k = jnp.concatenate([ck[:, all_idx], k], axis=1)
                kv_v = jnp.concatenate([cv[:, all_idx], v], axis=1)
            else:
                for i, start in enumerate(current_start):
                    w = start - 6 * S if start >= 19 * S else start
                    ck = ck.at[:, w:w + S].set(k[:, i * S:(i + 1) * S])
                    cv = cv.at[:, w:w + S].set(v[:, i * S:(i + 1) * S])
                kv_k, kv_v = ck[:, all_idx], cv[:, all_idx]
            store[0].append(ck)
            store[1].append(cv)
            out = dense_attention(q, kv_k, kv_v)
            return dit.linear(sp["o"], out.reshape(B, L, -1))

        xc = dit.block_forward(bp, cfg, xc, e0, self_attn_fn, ckv, Gn)

    xh = dit.head_forward(params["head"], cfg, xc, e, Gn)
    flow = dit.unpatchify(xh, Gn, (gh, gw), cfg.patch_size, cfg.out_dim)
    cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    return flow, cache, vis_tokens


def test_fps_group_forward_matches_dynamic_twin():
    """Run the full t2v plan (all 4 groups + vis toggles) through both the
    static planned-schedule model and the dynamic-index twin."""
    cfg = tiny_test_config()
    plan = G.t2v_plan()
    B, C, H, W = 1, 16, 4, 4
    S = (H // 2) * (W // 2)
    n, d = cfg.num_heads, cfg.dim // cfg.num_heads
    key = jax.random.PRNGKey(0)
    from helpers import randomize_head
    params = randomize_head(dit.init_dit_params(key, cfg, jnp.float32))
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.text_len, cfg.text_dim), jnp.float32)
    emb = dit.embed_text(params, ctx)
    ctx_kv = dit.precompute_context_kv(params, cfg, emb)

    cache = init_kv_cache(cfg, B, S, dtype=jnp.float32)
    flat = {"k": cache["k"].reshape(cfg.num_layers, B, -1, n, d),
            "v": cache["v"].reshape(cfg.num_layers, B, -1, n, d)}
    vis = []
    rng_order = np.random.default_rng(42)

    for gi, group in enumerate(plan.groups):
        lat = jax.random.normal(jax.random.PRNGKey(10 + gi),
                                (B, group.num_frames, C, H, W), jnp.float32)
        t = jnp.full((B, group.num_frames), 537.0)

        # pipeline-level visibility toggles (casual_fps_inference.py:281-326)
        if gi == 2:
            vis = [x for x in vis if x not in (19 * S, 20 * S)]
        elif gi == 3:
            for val in (19 * S, 20 * S):
                if val not in vis:
                    vis.append(val)

        flow_twin, flat, vis = dynamic_twin_forward(
            params, cfg, lat, t, ctx_kv, flat, vis, group.frames, S,
            rng_order)
        flow_static, cache = fps_forward_group(
            params, cfg, lat, t, ctx_kv, cache, group)

        np.testing.assert_allclose(
            np.asarray(flow_static), np.asarray(flow_twin),
            atol=1e-4, rtol=1e-4, err_msg=f"group {gi} flow mismatch")
        np.testing.assert_allclose(
            np.asarray(cache["k"].reshape(cfg.num_layers, B, -1, n, d)),
            np.asarray(flat["k"]), atol=1e-4, rtol=1e-4,
            err_msg=f"group {gi} cache-k mismatch")
        np.testing.assert_allclose(
            np.asarray(cache["v"].reshape(cfg.num_layers, B, -1, n, d)),
            np.asarray(flat["v"]), atol=1e-4, rtol=1e-4,
            err_msg=f"group {gi} cache-v mismatch")


def test_frame_masked_attention_matches_dense():
    from mmpl_tpu.ops.attention import frame_masked_attention
    from mmpl_tpu.training import masks as M
    rng = np.random.default_rng(0)
    S = 4                                  # tokens per frame
    F = 10                                 # 2*5 frames (clean|noise layout)
    fm = M.teacher_forcing_frame_mask(5, num_frame_per_block=1)
    assert fm.shape == (F, F)
    L = F * S
    B, N, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    ids = np.repeat(np.arange(F), S)

    got = frame_masked_attention(q, k, v, ids, ids, fm,
                                 block_q=16, block_k=16, interpret=True)
    tok_mask = jnp.asarray(M.expand_frame_mask(fm, S))[None, None]
    want = dense_attention(q, k, v, mask=tok_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_frame_masked_attention_with_padding():
    from mmpl_tpu.ops.attention import frame_masked_attention
    rng = np.random.default_rng(1)
    F, S = 3, 5                            # L = 15, not a block multiple
    fm = np.tril(np.ones((F, F), bool))
    L = F * S
    B, N, D = 1, 1, 64
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    ids = np.repeat(np.arange(F), S)
    got = frame_masked_attention(q, k, v, ids, ids, fm,
                                 block_q=8, block_k=8, interpret=True)
    from mmpl_tpu.training.masks import expand_frame_mask
    want = dense_attention(q, k, v,
                           mask=jnp.asarray(expand_frame_mask(fm, S))[None,
                                                                      None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("lq,lk", [(64, 64), (100, 200)])
def test_flash_vjp_matches_dense_grads(lq, lk):
    from mmpl_tpu.ops.attention import flash_attention_vjp
    key = jax.random.PRNGKey(0)
    B, N, D = 1, 2, 64
    q = jax.random.normal(key, (B, lq, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, lk, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, lk, N, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (B, lq, N, D), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_vjp(q, k, v, None, 128, 128, True) * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) * w)

    o_f = flash_attention_vjp(q, k, v, None, 128, 128, True)
    o_d = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_d), atol=2e-5)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_frame_masked_attention_grads_match_dense():
    """The masked-kernel VJP must match dense masked attention gradients."""
    from mmpl_tpu.ops.attention import frame_masked_attention
    from mmpl_tpu.training import masks as M
    rng = np.random.default_rng(3)
    S, F = 8, 6
    fm = M.teacher_forcing_frame_mask(3, 1)
    L = F * S
    B, N, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, N, D)), jnp.float32)
    ids = np.repeat(np.arange(F), S)
    tok = jnp.asarray(M.expand_frame_mask(fm, S))[None, None]

    def loss_kernel(q, k, v):
        return jnp.sum(frame_masked_attention(
            q, k, v, ids, ids, fm, block_q=128, block_k=128,
            interpret=True) * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask=tok) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")
