"""Image/video helpers: overlap blending, resize/crop, image loading.

Re-design of the pieces of `MMPL_t2v/demo_utils/utils.py` the pipelines
consume — most importantly `soft_append_bcthw` (:255), the cross-faded
window concatenation used when stitching rolling windows — plus the resize/
center-crop used for i2v image conditioning and base64/file image loading
(the i2v server's input path, fastapi_parallel_i2v_server.py:294-345).
"""

from __future__ import annotations

import base64
import io
from typing import Optional

import numpy as np


def soft_append_bcthw(history: np.ndarray, current: np.ndarray,
                      overlap: int = 0) -> np.ndarray:
    """Cross-fade `current` onto the tail of `history` over `overlap` frames.

    Inputs [B, C, T, H, W] (the reference's bcthw, demo_utils/utils.py:255).
    With overlap == 0 this is plain concatenation.
    """
    if overlap <= 0:
        return np.concatenate([history, current], axis=2)
    assert history.shape[2] >= overlap and current.shape[2] >= overlap
    w = (np.linspace(1, 0, overlap, dtype=np.float32)
         .reshape(1, 1, overlap, 1, 1))
    blended = w * history[:, :, -overlap:] + (1 - w) * current[:, :, :overlap]
    return np.concatenate(
        [history[:, :, :-overlap], blended, current[:, :, overlap:]], axis=2)


def resize_and_center_crop(image: np.ndarray, height: int,
                           width: int) -> np.ndarray:
    """[H, W, 3] uint8 -> [height, width, 3]: scale to cover, center-crop."""
    from PIL import Image
    h, w = image.shape[:2]
    scale = max(height / h, width / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = Image.fromarray(image).resize((nw, nh), Image.BICUBIC)
    arr = np.asarray(img)
    top = (nh - height) // 2
    left = (nw - width) // 2
    return arr[top:top + height, left:left + width]


def fetch_url_bytes(url: str, timeout: float = 30.0) -> bytes:
    """Fetch raw bytes from an http(s) URL (the i2v server's image-by-URL
    ingestion, fastapi_parallel_i2v_server.py:294-345).  Split out so tests
    and offline deployments can monkeypatch the network hop."""
    import urllib.request
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return resp.read()


def load_image(source: str, height: Optional[int] = None,
               width: Optional[int] = None) -> np.ndarray:
    """Load an image from a file path, http(s) URL, or base64 string ->
    [3, H, W] float32 in [-1, 1] (the i2v input convention)."""
    from PIL import Image
    if source.startswith(("http://", "https://")):
        img = Image.open(io.BytesIO(fetch_url_bytes(source)))
    elif source.startswith("data:") or (len(source) > 512
                                        and "/" not in source[:256]):
        raw = source.split(",", 1)[-1]
        img = Image.open(io.BytesIO(base64.b64decode(raw)))
    else:
        img = Image.open(source)
    arr = np.asarray(img.convert("RGB"))
    if height and width:
        arr = resize_and_center_crop(arr, height, width)
    return (arr.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
