"""Raw-video training data path: dataset + offline VAE/T5 preprocessing.

Re-design of `MMPL_t2v/utils/wan_dataset.py`:

  * `TextVideoDataset` (wan_dataset.py:41-193) — CSV-driven video/image
    loading via imageio, max-scale resize + center crop, [-1, 1]
    normalisation.  Videos come back frames-leading ([T, C, H, W], our
    model convention) instead of the reference's [C, T, H, W].
  * `encode_shards` + the `data_process` CLI (wan_dataset.py:195-237,
    282-347) — offline VAE latent + T5 prompt encoding.  The reference
    routes this through DiffSynth/Lightning and writes one
    `*.tensors.pth` per clip; here encoding is jitted batch work on the
    accelerator and output is `.npz` shards directly consumable by
    `TensorDictDataset` (data/datasets.py) and `train.py --data-dir`.

No torch/lightning at runtime.  Encoders are injectable callables so the
same pipeline runs with real Wan checkpoints or with synthetic weights
(smoke mode / tests) — this image ships no Wan weights.
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import os
import sys
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

VIDEO_EXTS = (".mp4", ".gif", ".webm", ".mkv", ".avi", ".mov", ".npy")
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp")


def discover_paths(base_dir: str, metadata_dir: str
                   ) -> Tuple[List[str], List[str]]:
    """Pair data subdirectories with same-named CSVs (wan_dataset.py:14-38)."""
    base_paths, metadata_paths = [], []
    for sub in sorted(os.listdir(base_dir)):
        p = os.path.join(base_dir, sub)
        csv_file = os.path.join(metadata_dir, f"{sub}.csv")
        if os.path.isdir(p) and os.path.exists(csv_file):
            base_paths.append(p)
            metadata_paths.append(csv_file)
    return base_paths, metadata_paths


def read_metadata_csv(path: str) -> List[Tuple[str, str]]:
    """CSV with a `file_name` (or `file_path`) column and a `text` column
    (wan_dataset.py:51-54)."""
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return []
    name_col = "file_name" if "file_name" in rows[0] else "file_path"
    return [(r[name_col], r["text"]) for r in rows]


def scale_crop_resize(img, height: int, width: int):
    """Max-scale bilinear resize then center crop to (height, width)
    (wan_dataset.py:64-80 crop_and_resize + CenterCrop)."""
    from PIL import Image
    w, h = img.size
    scale = max(width / w, height / h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    x0 = (w - width) // 2
    y0 = (h - height) // 2
    return img.crop((x0, y0, x0 + width, y0 + height))


def _to_chw_norm(img) -> np.ndarray:
    """PIL RGB -> [C, H, W] float32 in [-1, 1] (the reference's
    ToTensor + Normalize(0.5, 0.5), wan_dataset.py:64-69)."""
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    return arr.transpose(2, 0, 1)


class TextVideoDataset:
    """Raw video/image + caption dataset (wan_dataset.py:41-193).

    Yields {"text", "video" [T, C, H, W] float32 in [-1, 1], "path"} and,
    with `is_i2v`, "first_frame" [H, W, 3] uint8 (the un-normalised first
    frame the i2v preproc CLIP-encodes, wan_dataset.py:104-108).
    Videos shorter than the required span degrade to a zero clip
    (wan_dataset.py:179-180) so offline encoding never crashes mid-run.
    """

    def __init__(self, base_path, metadata_path, max_num_frames: int = 81,
                 frame_interval: int = 1, num_frames: int = 81,
                 height: int = 480, width: int = 832, is_i2v: bool = False,
                 seed: int = 0, use_native: bool = False):
        if isinstance(base_path, str):
            base_path = [base_path]
        if isinstance(metadata_path, str):
            metadata_path = [metadata_path]
        self.path: List[str] = []
        self.text: List[str] = []
        for bp, mp in zip(base_path, metadata_path):
            for fname, text in read_metadata_csv(mp):
                self.path.append(os.path.join(bp, fname))
                self.text.append(text)
        self.max_num_frames = max_num_frames
        self.frame_interval = frame_interval
        self.num_frames = num_frames
        self.height, self.width = height, width
        self.is_i2v = is_i2v
        self._rng = np.random.default_rng(seed)
        # optional native fused preproc (data/_fastproc.c): one C call per
        # clip. Default OFF: PIL's SIMD resampling measured ~4x faster
        # than our scalar C on this host (see data/fastproc.py) — the
        # native path exists for PIL-free deployments.
        if use_native:
            from . import fastproc
            self._fastproc = fastproc if fastproc.available() else None
        else:
            self._fastproc = None

    def __len__(self) -> int:
        return len(self.path)

    # -- loading ------------------------------------------------------------

    def _read_all_frames(self, path: str) -> Optional[np.ndarray]:
        """[T, H, W, 3] uint8 or None if unreadable."""
        try:
            if path.endswith(".npy"):
                return np.load(path)
            import imageio
            return np.stack([np.asarray(f)[..., :3]
                             for f in imageio.mimread(path, memtest=False)])
        except Exception:
            return None

    def load_video(self, path: str) -> Optional[np.ndarray]:
        """Random-start strided frame window -> [T, C, H, W] float32
        (wan_dataset.py:82-110,147-150)."""
        from PIL import Image
        raw = self._read_all_frames(path)
        if raw is None:
            return None
        span = (self.num_frames - 1) * self.frame_interval
        if len(raw) < self.max_num_frames or len(raw) - 1 < span:
            return None
        hi = max(1, self.max_num_frames - span)
        start = int(self._rng.integers(0, hi))
        sel = raw[start:start + self.num_frames * self.frame_interval:
                  self.frame_interval]
        if self._fastproc is not None:
            return self._fastproc.scale_crop_normalize_clip(
                sel, self.height, self.width)
        frames = []
        for img_arr in sel:
            img = Image.fromarray(img_arr)
            frames.append(_to_chw_norm(
                scale_crop_resize(img, self.height, self.width)))
        return np.stack(frames)

    def load_image(self, path: str) -> np.ndarray:
        """Single image as a 1-frame video (wan_dataset.py:160-166)."""
        from PIL import Image
        img = Image.open(path).convert("RGB")
        return _to_chw_norm(
            scale_crop_resize(img, self.height, self.width))[None]

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path, text = self.path[idx], self.text[idx]
        is_image = path.lower().endswith(IMAGE_EXTS)
        if is_image:
            if self.is_i2v:
                raise ValueError(
                    f"{path} is not a video; i2v needs video samples")
            video = self.load_image(path)
        else:
            video = self.load_video(path)
        if video is None:
            video = np.zeros((self.num_frames, 3, self.height, self.width),
                             np.float32)
        data = {"text": text, "video": video, "path": path}
        if self.is_i2v:
            first = ((video[0].transpose(1, 2, 0) + 1.0) * 127.5)
            data["first_frame"] = np.clip(first, 0, 255).astype(np.uint8)
        return data


# ---------------------------------------------------------------------------
# Offline encoding -> TensorDictDataset shards
# ---------------------------------------------------------------------------

def synthetic_prompt_encoder(text_len: int, text_dim: int
                             ) -> Callable[[Sequence[str]], np.ndarray]:
    """Deterministic stand-in for T5 when no checkpoint is available
    (smoke mode): embeddings seeded from the prompt hash."""

    def encode(texts: Sequence[str]) -> np.ndarray:
        out = []
        for t in texts:
            seed = int.from_bytes(
                hashlib.sha256(t.encode()).digest()[:4], "little")
            out.append(np.random.default_rng(seed).standard_normal(
                (text_len, text_dim)).astype(np.float32))
        return np.stack(out)

    return encode


def encode_shards(dataset: TextVideoDataset, out_dir: str,
                  vae_encode: Callable[[np.ndarray], np.ndarray],
                  prompt_encode: Callable[[Sequence[str]], np.ndarray],
                  shard_size: int = 64,
                  image_encode: Optional[Callable] = None,
                  log: Callable[[str], None] = lambda s: None) -> List[str]:
    """Encode every clip and write `.npz` shards for TensorDictDataset.

    vae_encode: [1, T, C, H, W] float32 pixels -> [1, F, 16, h, w] latents.
    prompt_encode: list[str] -> [N, text_len, text_dim].
    Zero clips (unreadable/short videos) are skipped, matching the
    reference's `video.sum() == 0` guard (wan_dataset.py:233-236).
    """
    os.makedirs(out_dir, exist_ok=True)
    shard_paths: List[str] = []
    lat_buf: List[np.ndarray] = []
    emb_buf: List[np.ndarray] = []
    txt_buf: List[str] = []
    img_buf: List[np.ndarray] = []

    def flush():
        if not lat_buf:
            return
        path = os.path.join(out_dir, f"shard_{len(shard_paths):05d}.npz")
        arrays = {"latents": np.stack(lat_buf),
                  "prompt_embeds": np.stack(emb_buf),
                  "prompts": np.asarray(txt_buf, dtype=object)}
        if img_buf:
            arrays["image_embeds"] = np.stack(img_buf)
        np.savez(path, **arrays)
        shard_paths.append(path)
        log(f"wrote {path}: {len(lat_buf)} clips")
        lat_buf.clear(); emb_buf.clear(); txt_buf.clear(); img_buf.clear()

    for i in range(len(dataset)):
        item = dataset[i]
        video = item["video"]
        if not np.any(video):
            log(f"skip (unreadable/short): {item['path']}")
            continue
        lat = np.asarray(vae_encode(video[None]))[0]
        emb = np.asarray(prompt_encode([item["text"]]))[0]
        if lat_buf and lat_buf[0].shape != lat.shape:
            flush()   # shards hold one latent geometry (images vs clips)
        lat_buf.append(lat.astype(np.float32))
        emb_buf.append(emb.astype(np.float32))
        txt_buf.append(item["text"])
        if image_encode is not None and "first_frame" in item:
            img_buf.append(np.asarray(
                image_encode(item["first_frame"])).astype(np.float32))
        if len(lat_buf) >= shard_size:
            flush()
    flush()
    return shard_paths


def _build_real_encoders(args):
    """Wire the actual Wan VAE / umT5 from checkpoints (the non-smoke
    path of wan_dataset.py:195-237)."""
    import jax
    import jax.numpy as jnp
    from ..models import vae as vae_mod
    from ..models.t5 import UMT5_XXL
    from ..utils.checkpoint import load_t5, load_vae

    vae_params = load_vae(args.vae_path)
    enc = jax.jit(vae_mod.encode)

    def vae_encode(pixels: np.ndarray) -> np.ndarray:
        return np.asarray(enc(vae_params, jnp.asarray(pixels)))

    if args.text_encoder_path:
        from ..utils.tokenizer import WanTextEncoder
        t5_params = load_t5(args.text_encoder_path, UMT5_XXL)
        te = WanTextEncoder(t5_params, UMT5_XXL, args.tokenizer_path)

        def prompt_encode(texts):
            return np.asarray(te(texts)["prompt_embeds"])
    else:
        prompt_encode = synthetic_prompt_encoder(args.text_len,
                                                 args.text_dim)
    return vae_encode, prompt_encode


def _build_synthetic_encoders(args):
    """Randomly-initialised VAE + hash-seeded prompts: validates the full
    raw-video -> shard -> train plumbing without Wan weights."""
    import jax
    import jax.numpy as jnp
    from ..models import vae as vae_mod

    vae_params = vae_mod.init_vae_params(jax.random.PRNGKey(args.seed))
    enc = jax.jit(vae_mod.encode)

    def vae_encode(pixels: np.ndarray) -> np.ndarray:
        return np.asarray(enc(vae_params, jnp.asarray(pixels)))

    return vae_encode, synthetic_prompt_encoder(args.text_len,
                                                args.text_dim)


def parse_args(argv=None):
    """Flag surface mirrors the reference CLI (wan_dataset.py:282-299)."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_path", required=True,
                   help="root directory of video/image files")
    p.add_argument("--metadata_path", required=True,
                   help="CSV listing file_name,text")
    p.add_argument("--output_path", default="./data_shards")
    p.add_argument("--vae_path", default=None,
                   help="Wan2.1_VAE.pth (omit for --synthetic)")
    p.add_argument("--text_encoder_path", default=None,
                   help="models_t5_umt5-xxl-enc-bf16.pth")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="random VAE + hash prompts (smoke, no checkpoints)")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--frame_interval", type=int, default=1)
    p.add_argument("--shard_size", type=int, default=64)
    p.add_argument("--text_len", type=int, default=512)
    p.add_argument("--text_dim", type=int, default=4096)
    p.add_argument("--is_i2v", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def data_process(argv=None) -> List[str]:
    args = parse_args(argv)
    dataset = TextVideoDataset(
        args.base_path, args.metadata_path, max_num_frames=args.num_frames,
        frame_interval=args.frame_interval, num_frames=args.num_frames,
        height=args.height, width=args.width, is_i2v=args.is_i2v,
        seed=args.seed)
    if args.synthetic or not args.vae_path:
        vae_encode, prompt_encode = _build_synthetic_encoders(args)
    else:
        vae_encode, prompt_encode = _build_real_encoders(args)
    return encode_shards(
        dataset, args.output_path, vae_encode, prompt_encode,
        shard_size=args.shard_size,
        log=lambda s: print(s, file=sys.stderr, flush=True))


if __name__ == "__main__":
    data_process()
