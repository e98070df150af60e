"""Checkpoint mapping correctness, verified numerically against torch ops."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mmpl_tpu.core.config import tiny_test_config
from mmpl_tpu.models import dit
from mmpl_tpu.utils import checkpoint as ckpt


def test_linear_mapping():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 5)).astype(np.float32)   # torch [out, in]
    b = rng.standard_normal(8).astype(np.float32)
    x = rng.standard_normal((3, 5)).astype(np.float32)
    sd = {"lin.weight": w, "lin.bias": b}
    p = ckpt._lin(sd, "lin", np.float32)
    got = np.asarray(dit.linear(
        {"kernel": jnp.asarray(p["kernel"]), "bias": jnp.asarray(p["bias"])},
        jnp.asarray(x)))
    want = F.linear(torch.tensor(x), torch.tensor(w),
                    torch.tensor(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_patch_embedding_mapping():
    """Conv3d(stride=kernel=(1,2,2)) == patchify with the converted matrix."""
    rng = np.random.default_rng(1)
    Cin, D = 4, 6
    w = rng.standard_normal((D, Cin, 1, 2, 2)).astype(np.float32)
    b = rng.standard_normal(D).astype(np.float32)
    x = rng.standard_normal((1, Cin, 3, 4, 6)).astype(np.float32)  # NCDHW

    want = F.conv3d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=(1, 2, 2))
    # torch output [1, D, 3, 2, 3] -> tokens [1, 3*2*3, D]
    want = want.flatten(2).transpose(1, 2).numpy()

    pe = {"kernel": jnp.asarray(w.reshape(D, -1).T),
          "bias": jnp.asarray(b)}
    lat = jnp.asarray(x.transpose(0, 2, 1, 3, 4))   # [B, F, C, H, W]
    got = np.asarray(dit.patchify(pe, lat, (1, 2, 2)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_causal_conv3d_mapping():
    """VAE CausalConv3d (temporal front-pad 2, spatial SAME) vs torch."""
    from mmpl_tpu.models.vae import _conv3d
    rng = np.random.default_rng(2)
    Cin, Cout = 3, 5
    w = rng.standard_normal((Cout, Cin, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)
    x = rng.standard_normal((1, Cin, 4, 6, 6)).astype(np.float32)

    xt = F.pad(torch.tensor(x), (1, 1, 1, 1, 2, 0))   # (w,h,t) causal pad
    want = F.conv3d(xt, torch.tensor(w), torch.tensor(b)).numpy()
    want = want.transpose(0, 2, 3, 4, 1)              # -> NDHWC

    p = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
         "bias": jnp.asarray(b)}
    got = np.asarray(_conv3d(p, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def make_synthetic_dit_sd(cfg, seed=3):
    """A torch-style WanModel state dict with random weights."""
    rng = np.random.default_rng(seed)
    d, fd, td = cfg.dim, cfg.ffn_dim, cfg.text_dim

    def lin(o, i):
        return {"weight": rng.standard_normal((o, i)).astype(np.float32),
                "bias": rng.standard_normal(o).astype(np.float32)}

    sd = {}

    def put(name, t):
        for k, v in t.items():
            sd[f"{name}.{k}"] = v

    sd["patch_embedding.weight"] = rng.standard_normal(
        (d, cfg.in_dim, 1, 2, 2)).astype(np.float32)
    sd["patch_embedding.bias"] = rng.standard_normal(d).astype(np.float32)
    put("text_embedding.0", lin(d, td))
    put("text_embedding.2", lin(d, d))
    put("time_embedding.0", lin(d, cfg.freq_dim))
    put("time_embedding.2", lin(d, d))
    put("time_projection.1", lin(6 * d, d))
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        for mod in ("self_attn", "cross_attn"):
            for proj in ("q", "k", "v", "o"):
                put(f"{pre}.{mod}.{proj}", lin(d, d))
            sd[f"{pre}.{mod}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.{mod}.norm_k.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm3.bias"] = np.zeros(d, np.float32)
        put(f"{pre}.ffn.0", lin(fd, d))
        put(f"{pre}.ffn.2", lin(d, fd))
        sd[f"{pre}.modulation"] = rng.standard_normal(
            (1, 6, d)).astype(np.float32)
    put("head.head", lin(4 * cfg.out_dim, d))
    sd["head.modulation"] = rng.standard_normal((1, 2, d)).astype(np.float32)
    return sd


def test_dit_state_dict_roundtrip():
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    d, td = cfg.dim, cfg.text_dim
    sd = make_synthetic_dit_sd(cfg)
    params = ckpt.convert_dit(sd, cfg)
    assert params["blocks"]["self_attn"]["q"]["kernel"].shape == (
        cfg.num_layers, d, d)
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["ffn"]["fc1"]["kernel"][1]),
        sd["blocks.1.ffn.0.weight"].T)
    # forward runs
    import jax
    out = dit.dit_forward(
        params, cfg,
        jnp.asarray(rng.standard_normal((1, 2, cfg.in_dim, 4, 4)),
                    jnp.float32),
        jnp.asarray([500.0]),
        jnp.asarray(rng.standard_normal((1, cfg.text_len, td)), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_safetensors_reader_roundtrip(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(4)
    tensors = {"a.weight": rng.standard_normal((3, 4)).astype(np.float32),
               "b.bias": rng.standard_normal(7).astype(np.float16)}
    p = str(tmp_path / "x.safetensors")
    save_file(tensors, p)
    got = ckpt._load_safetensors(p)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_safetensors_bf16(tmp_path):
    from safetensors.torch import save_file
    t = torch.arange(12, dtype=torch.bfloat16).reshape(3, 4) * 0.25
    p = str(tmp_path / "bf16.safetensors")
    save_file({"w": t}, p)
    got = ckpt._load_safetensors(p)["w"]
    np.testing.assert_allclose(got, t.float().numpy())


def test_mmpl_generator_checkpoint(tmp_path):
    """The monolithic `{'generator': {'model.*': ...}}` .pt format
    (Wan_fps_inference_1gpu.py:66-68) loads through load_mmpl_generator."""
    cfg = tiny_test_config()
    sd = make_synthetic_dit_sd(cfg, seed=5)
    blob = {"generator": {f"model.{k}": torch.tensor(v)
                          for k, v in sd.items()},
            "generator_ema": {f"model.{k}": torch.tensor(v * 0.5)
                              for k, v in sd.items()}}
    p = str(tmp_path / "t2v_tiny.pt")
    torch.save(blob, p)

    params = ckpt.load_mmpl_generator(p, cfg)
    np.testing.assert_allclose(
        np.asarray(params["head"]["head"]["kernel"]),
        sd["head.head.weight"].T)
    params_ema = ckpt.load_mmpl_generator(p, cfg, use_ema=True)
    np.testing.assert_allclose(
        np.asarray(params_ema["head"]["head"]["kernel"]),
        sd["head.head.weight"].T * 0.5, rtol=1e-6)


def test_export_import_roundtrip(tmp_path):
    """export_generator_pt -> load_mmpl_generator recovers the pytree."""
    import jax
    import jax.numpy as jnp
    from mmpl_tpu.utils.train_state_io import export_generator_pt
    cfg = tiny_test_config()
    params = dit.init_dit_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    p = str(tmp_path / "export.pt")
    export_generator_pt(p, params, None, cfg)
    back = ckpt.load_mmpl_generator(p, cfg)

    flat_a, tree_a = jax.tree_util.tree_flatten_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    # structural + numerical identity for every leaf
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_b[tuple(path)]), np.asarray(leaf), atol=1e-6,
            err_msg=str(path))


def test_orbax_train_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from mmpl_tpu.utils.train_state_io import (restore_checkpoint,
                                               save_checkpoint)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    back = restore_checkpoint(path, template=state)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(back["step"]) == 7
