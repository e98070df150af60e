"""int8 W8A8 quantized inference path (ops/quant.py + dit.quantize_params).

The TPU analogue of the reference's TensorRT INT8 engines
(demo_utils/vae_torch2trt.py:139).  Numerics bounds here are the
synthetic-weight acceptance tests VERDICT r3 item 1 asks for; quality
sign-off on real Wan checkpoints is documented in PERF.md (blocked on
weights not present in this image).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.models import dit
from mmpl_tpu.ops.quant import (quantize_linear_params, quantize_weight,
                                w8a8_matmul, w8a16_matmul)
from helpers import randomize_head


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (128,)
    deq = wq.astype(jnp.float32) * scale
    # max error is half a quantization step per channel
    err = np.abs(np.asarray(deq - w))
    assert (err <= 0.5 * np.asarray(scale)[None, :] + 1e-7).all()


def test_quantize_weight_stacked_layers():
    """Stacked [L, K, N] block leaves quantize with per-layer scales that
    match quantizing each layer separately."""
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 32), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.shape == (3, 64, 32) and scale.shape == (3, 32)
    for i in range(3):
        wqi, si = quantize_weight(w[i])
        np.testing.assert_array_equal(np.asarray(wq[i]), np.asarray(wqi))
        np.testing.assert_allclose(np.asarray(scale[i]), np.asarray(si))


def test_w8a8_matmul_accuracy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (4, 512, 256), jnp.float32)
    w = jax.random.normal(k2, (256, 384), jnp.float32)
    wq, scale = quantize_weight(w)
    got = np.asarray(w8a8_matmul(x, wq, scale))
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel                       # ~1% typical for W8A8
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999, cos


def test_w8a16_matmul_more_accurate_than_w8a8():
    """Weight-only drops the activation rounding: error strictly from the
    weight quantization, so it beats W8A8 on the same operands."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    x = jax.random.normal(k1, (4, 512, 256), jnp.float32)
    w = jax.random.normal(k2, (256, 384), jnp.float32)
    wq, scale = quantize_weight(w)
    ref = np.asarray(x) @ np.asarray(w)
    rel_wo = np.linalg.norm(np.asarray(w8a16_matmul(x, wq, scale)) - ref)
    rel_a8 = np.linalg.norm(np.asarray(w8a8_matmul(x, wq, scale)) - ref)
    assert rel_wo < rel_a8
    assert rel_wo / np.linalg.norm(ref) < 0.01


def test_linear_dispatches_on_kernel_w8():
    p = {"kernel": jax.random.normal(jax.random.PRNGKey(3), (64, 32)),
         "bias": jax.random.normal(jax.random.PRNGKey(4), (32,))}
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 64))
    ref = np.asarray(dit.linear(p, x))
    qp = quantize_linear_params(p, weight_only=True)
    assert "kernel_w8" in qp and qp["kernel_w8"].dtype == jnp.int8
    got = np.asarray(dit.linear(qp, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8wo_fps_pipeline_end_to_end():
    """quantize="int8wo" through the public FPS pipeline runs and stays
    at least as close to fp32 as the W8A8 path."""
    from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    mk = lambda q: CausalFPSInferencePipeline(
        cfg, params, sampling_steps=4, guidance_scale=5.0,
        quantize=q, dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 21, 16, 4, 4))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    cond = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(k2, (1, cfg.text_len, cfg.text_dim))
    rng = jax.random.PRNGKey(7)
    ref = np.asarray(mk(None).inference(noise, cond, uncond, rng=rng))
    got = np.asarray(mk("int8wo").inference(noise, cond, uncond, rng=rng))
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.98, cos


def test_linear_dispatches_on_kernel_q():
    p = {"kernel": jax.random.normal(jax.random.PRNGKey(3), (64, 32)),
         "bias": jax.random.normal(jax.random.PRNGKey(4), (32,))}
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 64))
    ref = np.asarray(dit.linear(p, x))
    got = np.asarray(dit.linear(quantize_linear_params(p), x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def _quant_setup():
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    fused = dit.fuse_qkv_params(params, num_heads=cfg.num_heads)
    return cfg, fused, dit.quantize_params(fused)


def test_quantize_params_structure():
    cfg, fused, qp = _quant_setup()
    sa, ffn, ca = (qp["blocks"][k] for k in ("self_attn", "ffn",
                                             "cross_attn"))
    for leaf in (sa["qkv"], sa["o"], ffn["fc1"], ffn["fc2"], ca["q"],
                 ca["o"]):
        assert "kernel_q" in leaf and leaf["kernel_q"].dtype == jnp.int8
        assert "kernel" not in leaf
    # context k/v, norms, head, embeddings stay untouched
    assert "kernel" in ca["k"] and "kernel" in ca["v"]
    assert "kernel" in qp["head"]["head"]
    np.testing.assert_array_equal(
        np.asarray(qp["blocks"]["modulation"]),
        np.asarray(fused["blocks"]["modulation"]))


def test_quantized_forward_close_to_fp32():
    """Full DiT forward: quantized vs fp32 output stays close (the
    per-layer/end-to-end numerics bound on synthetic weights)."""
    cfg, fused, qp = _quant_setup()
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 16, 4, 4))
    t = jnp.full((1, 3), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(7),
                            (1, cfg.text_len, cfg.text_dim))
    ref = np.asarray(dit.dit_forward(fused, cfg, x, t, ctx))
    got = np.asarray(dit.dit_forward(qp, cfg, x, t, ctx))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.995, cos


def test_quantized_fps_pipeline_end_to_end():
    """quantize="int8" through the public FPS pipeline: the denoised
    window stays close to the fp32 pipeline's."""
    from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline
    cfg = tiny_test_config()
    params = randomize_head(
        dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    mk = lambda q: CausalFPSInferencePipeline(
        cfg, params, sampling_steps=4, guidance_scale=5.0,
        quantize=q, dtype=jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 21, 16, 4, 4))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    cond = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
    uncond = jax.random.normal(k2, (1, cfg.text_len, cfg.text_dim))
    rng = jax.random.PRNGKey(7)
    ref = np.asarray(mk(None).inference(noise, cond, uncond, rng=rng))
    got = np.asarray(mk("int8").inference(noise, cond, uncond, rng=rng))
    assert np.isfinite(got).all()
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert rel < 0.25, rel           # 4-step CFG solver amplifies ~2%/gemm
    assert cos > 0.97, cos


class TestInt8KVCache:
    """int8 KV cache with per-token scales (models.fps_dit.init_kv_cache
    quantize=True): halves the dominant HBM resident of the 50-step CFG
    pipelines; K/V dequantise after the visibility gather."""

    def test_cache_layout(self):
        from mmpl_tpu.models.fps_dit import init_kv_cache
        cfg = tiny_test_config()
        c = init_kv_cache(cfg, 2, 16, num_slots=5, quantize=True)
        assert c["k"].dtype == jnp.int8 and c["v"].dtype == jnp.int8
        assert c["k_scale"].shape == c["k"].shape[:-1]
        assert c["k_scale"].dtype == jnp.float32

    def test_quantize_tokens_roundtrip(self):
        from mmpl_tpu.models.fps_dit import _quantize_cache_tokens
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 16, 64))
        xq, s = _quantize_cache_tokens(x)
        back = xq.astype(jnp.float32) * s[..., None]
        rel = (np.linalg.norm(np.asarray(back - x))
               / np.linalg.norm(np.asarray(x)))
        # per-value rounding step = amax/127; for Gaussian data
        # amax ~ 2.5 sigma over 64 channels -> rel rms ~ 0.006
        assert rel < 0.01, rel

    def test_fps_pipeline_quantized_cache_close_to_baseline(self):
        from mmpl_tpu.pipelines.fps_inference import (
            CausalFPSInferencePipeline)
        cfg = tiny_test_config()
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        mk = lambda qc: CausalFPSInferencePipeline(
            cfg, params, sampling_steps=4, guidance_scale=5.0,
            quantize_cache=qc, dtype=jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(2), (1, 21, 16, 4, 4))
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        cond = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
        uncond = jax.random.normal(k2, (1, cfg.text_len, cfg.text_dim))
        rng = jax.random.PRNGKey(7)
        ref = np.asarray(mk(False).inference(noise, cond, uncond, rng=rng))
        got = np.asarray(mk(True).inference(noise, cond, uncond, rng=rng))
        assert np.isfinite(got).all()
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel
        cos = (got.ravel() @ ref.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.995, cos

    def test_fewstep_rolling_quantized_cache(self):
        """Rolling ring buffer + int8 cache: the slot rotation moves the
        scale planes with the values."""
        from mmpl_tpu.pipelines.causal_inference import (
            CausalInferencePipeline)
        cfg = tiny_test_config()
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        mk = lambda qc: CausalInferencePipeline(
            cfg, params, denoising_step_list=(1000, 500),
            num_frame_per_block=3, max_attention_frames=6, sink_frames=3,
            quantize_cache=qc, dtype=jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 16, 8, 8))
        cond = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, cfg.text_len, cfg.text_dim))
        rng = jax.random.PRNGKey(5)
        ref = np.asarray(mk(False).inference(noise, cond, rng=rng))
        got = np.asarray(mk(True).inference(noise, cond, rng=rng))
        assert np.isfinite(got).all()
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel

    def test_causal_diffusion_quantized_cache(self):
        from mmpl_tpu.pipelines.causal_diffusion_inference import (
            CausalDiffusionInferencePipeline)
        cfg = tiny_test_config()
        params = randomize_head(
            dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
        mk = lambda qc: CausalDiffusionInferencePipeline(
            cfg, params, sampling_steps=4, guidance_scale=5.0,
            num_frame_per_block=3, quantize_cache=qc, dtype=jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16, 4, 4))
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        cond = jax.random.normal(k1, (1, cfg.text_len, cfg.text_dim))
        uncond = jax.random.normal(k2, (1, cfg.text_len, cfg.text_dim))
        ref = np.asarray(mk(False).inference(noise, cond, uncond))
        got = np.asarray(mk(True).inference(noise, cond, uncond))
        assert np.isfinite(got).all()
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.05, rel


def test_quantized_cache_shardings():
    """Scale planes [L, B, SLOTS, S] must dp-shard with the values but
    never tp-shard (their last dim is tokens, not heads)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from mmpl_tpu.models.fps_dit import init_kv_cache
    from mmpl_tpu.parallel.mesh import kv_cache_shardings
    cfg = tiny_test_config()
    devs = np.asarray(jax.devices("cpu")[:1]).reshape(1, 1, 1)
    mesh = Mesh(devs, ("dp", "fsdp", "tp"))
    cache = jax.eval_shape(lambda: init_kv_cache(cfg, 2, 16, num_slots=4,
                                                 quantize=True))
    sh = kv_cache_shardings(mesh, cache)
    assert sh["k"].spec == P("dp", ) or sh["k"].spec[1] == "dp"
    assert sh["k"].spec[-1] == "tp"
    assert sh["k_scale"].spec[1] == "dp"
    assert all(s is None for i, s in enumerate(sh["k_scale"].spec)
               if i != 1)


# ---------------------------------------------------------------------------
# quantize="auto": load-time per-projection sensitivity policy (VERDICT r4)
# ---------------------------------------------------------------------------

def test_auto_quantize_policy_and_report():
    """Healthy weights -> every projection passes the threshold (pure
    W8A8 == the measured fast path); the report carries per-target
    errors and the mixed end-to-end error."""
    cfg = tiny_test_config()
    p = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    p = dit.fuse_qkv_params(p, num_heads=cfg.num_heads)
    q, rep = dit.auto_quantize(p, cfg)
    assert set(rep["policy"]) == set(rep["per_target_rel_err"])
    assert all(m == "int8" for m in rep["policy"].values()), rep
    assert rep["mixed_rel_err"] < 0.01
    assert rep["probed_with_random_head"] is True  # zero-init head case
    # quantized pytree actually runs
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 16, 8, 8))
    out = dit.dit_forward(q, cfg, x, jnp.full((1, 3), 500.0),
                          jax.random.normal(jax.random.PRNGKey(6),
                                            (1, cfg.text_len, cfg.text_dim)))
    assert np.isfinite(np.asarray(out)).all()


def test_auto_quantize_demotes_sensitive_projection():
    """A projection with a pathological weight distribution (one huge
    outlier channel starves the per-channel int8 grid for activations
    routed through it) must fall back to W8A16."""
    cfg = tiny_test_config()
    p = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    p = dit.fuse_qkv_params(p, num_heads=cfg.num_heads)
    p = randomize_head(p)
    fc2 = dict(p["blocks"]["ffn"]["fc2"])
    k = np.asarray(fc2["kernel"])
    # an outlier ROW (input channel): per-output-channel scales blow up
    # everywhere, crushing every other row's resolution
    k = k.copy()
    k[:, 7, :] *= 3000.0
    fc2["kernel"] = jnp.asarray(k)
    blocks = dict(p["blocks"])
    ffn = dict(blocks["ffn"])
    ffn["fc2"] = fc2
    blocks["ffn"] = ffn
    p = {**p, "blocks": blocks}
    q, rep = dit.auto_quantize(p, cfg)
    assert rep["policy"]["ffn.fc2"] == "int8wo", rep
    assert rep["per_target_rel_err"]["ffn.fc2"] > 0.03
    # and the mixed model keeps the W8A16 fallback's accuracy
    assert rep["mixed_rel_err"] < rep["per_target_rel_err"]["ffn.fc2"]


def test_apply_quantize_auto_via_pipeline_arg():
    from mmpl_tpu.pipelines.fps_inference import CausalFPSInferencePipeline
    cfg = tiny_test_config()
    p = dit.init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    pipe = CausalFPSInferencePipeline(cfg, p, sampling_steps=2,
                                      quantize="auto", dtype=jnp.float32)
    sa = pipe.params["blocks"]["self_attn"]
    assert "kernel_q" in sa["qkv"] or "kernel_w8" in sa["qkv"]
    assert dit.last_auto_quantize_report["policy"]


# ---------------------------------------------------------------------------
# int8 VAE decoder (VERDICT r3 item 7 — the reference's TRT int8 VAE)
# ---------------------------------------------------------------------------

def test_vae_int8_decode_close_and_streaming_close():
    from mmpl_tpu.models import vae
    p = vae.init_vae_params(jax.random.PRNGKey(0), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 8, 8),
                          jnp.float32)
    ref = np.asarray(vae.decode(p, z))

    def psnr(got):
        mse = float(np.mean((got - ref) ** 2))
        return 10 * np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range, peak 2

    pq = vae.quantize_vae_decoder(p)
    got = np.asarray(vae.decode(pq, z))
    assert got.shape == ref.shape
    assert psnr(got) > 25.0, psnr(got)
    # the streaming decode shares the quantized conv dispatch.  It is NOT
    # bit-identical to the batch int8 decode: the dynamic per-tensor
    # activation scale is computed over each streamed chunk, a different
    # (equally valid) quantization grid — so assert quality vs the f32
    # reference, same gate as the batch path.
    gs = np.asarray(vae.decode_streaming(pq, z))
    assert psnr(gs) > 25.0, psnr(gs)


def test_vae_encoder_untouched_by_decoder_quant():
    from mmpl_tpu.models import vae
    p = vae.init_vae_params(jax.random.PRNGKey(0), jnp.float32)
    pq = vae.quantize_vae_decoder(p)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 3, 32, 32),
                           jnp.float32)
    np.testing.assert_array_equal(np.asarray(vae.encode(pq, px)),
                                  np.asarray(vae.encode(p, px)))
