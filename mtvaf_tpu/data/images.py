"""Host-side image pipeline feeding device buffers.

Replaces torchvision transforms (reference models/utils.py:593-607):
Resize(short side 256) → crop 224 → optional horizontal flip → normalize
with the ImageNet statistics.  Outputs NHWC float32 (TPU-friendly layout).

Deviations (documented, SURVEY.md §5 "Determinism"):
* eval/test use a deterministic center crop without flip — the reference
  applies RandomCrop+RandomHorizontalFlip at *all* phases and freezes one
  random draw into its .tch cache;
* missing/corrupt images fall back to the reference placeholder image when
  present, else to zeros (the reference crashes if the placeholder is also
  missing — modules/dataset.py:110-117).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PLACEHOLDER = "17_06_4705.jpg"
CROP = 224
RESIZE = 256


def _resize_dims(h: int, w: int) -> tuple:
    """Short-side-RESIZE target dims, rounded like the native path (lround)."""
    import math
    if w < h:
        return max(1, int(math.floor(h * RESIZE / w + 0.5))), RESIZE
    return RESIZE, max(1, int(math.floor(w * RESIZE / h + 0.5)))


def _decode_rgb(path: str) -> np.ndarray:
    """Decode to uint8 HWC RGB at the original size (no resize)."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image
    img = _decode_rgb(path)
    nh, nw = _resize_dims(img.shape[0], img.shape[1])
    im = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    return np.asarray(im, np.uint8)


def _crop(img: np.ndarray, train: bool, rng: Optional[np.random.RandomState]):
    h, w = img.shape[:2]
    if train and rng is not None:
        top = rng.randint(0, max(h - CROP, 0) + 1)
        left = rng.randint(0, max(w - CROP, 0) + 1)
    else:
        top = max((h - CROP) // 2, 0)
        left = max((w - CROP) // 2, 0)
    out = img[top:top + CROP, left:left + CROP]
    if out.shape[:2] != (CROP, CROP):   # image smaller than crop: pad
        pad = np.zeros((CROP, CROP, 3), np.uint8)
        pad[:out.shape[0], :out.shape[1]] = out
        out = pad
    return out


def _normalize(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_to_u8(x: np.ndarray) -> np.ndarray:
    """Normalized fp32 rows → uint8 pixels (inverse of :func:`_normalize`).

    Host side of the ``image_dtype='uint8'`` transfer mode (infer.py):
    ships image batches at 1/4 the fp32 bytes (1/2 of fp16) with the
    re-normalization fused into the device program
    (nn.models.image_rows_to_f32).  Pixels that came from uint8 (the PIL
    resize path) round-trip EXACTLY — ``rint`` recovers the integer
    through the fp32 normalize, whose accumulated rounding is ≪ 0.5 —
    while the native path's float-precision resize quantizes by at most
    0.5/255 per channel pre-normalize, the same error tier as the fp16
    mode.  Out-of-range values (e.g. synthetic non-pixel data) clip.
    """
    x = np.asarray(x, np.float32)
    p = np.rint((x * IMAGENET_STD + IMAGENET_MEAN) * np.float32(255.0))
    return np.clip(p, 0.0, 255.0).astype(np.uint8)


def process_image(path: str, *, train: bool = False,
                  rng: Optional[np.random.RandomState] = None,
                  use_native: bool = True) -> np.ndarray:
    """path → (224, 224, 3) float32 normalized array.

    The resize+crop+normalize hot loop runs in the native library
    (native/image_ops.cc) when built, decoding stays in PIL; falls back to
    the pure-Python path otherwise.  Random draws (crop top/left, hflip) are
    made host-side in the same order for both paths, so a seeded run is
    backend-independent up to the bilinear kernel's rounding."""
    return _process_raw(_decode_rgb(path), train=train, rng=rng,
                        use_native=use_native)


def process_image_bytes(data: bytes, *, train: bool = False,
                        rng: Optional[np.random.RandomState] = None,
                        use_native: bool = True) -> np.ndarray:
    """Encoded image bytes (JPEG/PNG/...) → (224, 224, 3) float32, same
    transform as :func:`process_image` — the serving path's entry (images
    arrive over the wire, not from disk)."""
    import io

    from PIL import Image
    with Image.open(io.BytesIO(data)) as im:
        raw = np.asarray(im.convert("RGB"), np.uint8)
    return _process_raw(raw, train=train, rng=rng, use_native=use_native)


def _process_raw(raw: np.ndarray, *, train: bool,
                 rng: Optional[np.random.RandomState],
                 use_native: bool) -> np.ndarray:
    nh, nw = _resize_dims(raw.shape[0], raw.shape[1])
    if train and rng is not None:
        top = rng.randint(0, max(nh - CROP, 0) + 1)
        left = rng.randint(0, max(nw - CROP, 0) + 1)
        flip = bool(rng.rand() < 0.5)
    else:
        top, left, flip = -1, -1, False
    if use_native:
        from ..native.binding import native_preprocess
        out = native_preprocess(raw, crop=CROP, resize_short=RESIZE,
                                top=top, left=left, hflip=flip)
        if out is not None:
            return out
    from PIL import Image
    img = np.asarray(Image.fromarray(raw).resize((nw, nh), Image.BILINEAR),
                     np.uint8)
    if top < 0:
        img = _crop(img, False, None)
    else:
        pad = np.zeros((CROP, CROP, 3), np.uint8)
        window = img[top:top + CROP, left:left + CROP]
        pad[:window.shape[0], :window.shape[1]] = window
        img = pad
    if flip:
        img = img[:, ::-1]
    return _normalize(np.ascontiguousarray(img))


class ImageStore:
    """Resolves image ids to pixel arrays with an on-disk .npy cache.

    The cache mirrors the reference's .tch tensor cache
    (models/utils.py:631-650) but stores the *deterministic* (eval) transform;
    train-time randomness is applied per epoch on top of the cached decoded
    image when ``augment=True``.
    """

    def __init__(self, img_dir: Optional[str], aux_dir: Optional[str] = None,
                 cache_dir: Optional[str] = None, *,
                 aux_map: Optional[Dict[str, List[str]]] = None,
                 num_aux: int = 3):
        self.img_dir = img_dir
        self.aux_dir = aux_dir
        self.cache_dir = cache_dir
        self.aux_map = aux_map or {}
        self.num_aux = num_aux
        self._placeholder: Optional[np.ndarray] = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def _cache_path(self, key: str) -> Optional[str]:
        if not self.cache_dir:
            return None
        safe = key.replace("/", "_")
        return os.path.join(self.cache_dir, safe + ".npy")

    def _placeholder_image(self) -> np.ndarray:
        if self._placeholder is None:
            ph_path = os.path.join(self.img_dir or "", PLACEHOLDER)
            if self.img_dir and os.path.exists(ph_path):
                self._placeholder = process_image(ph_path)
            else:
                self._placeholder = np.zeros((CROP, CROP, 3), np.float32)
        return self._placeholder

    def _load(self, base_dir: Optional[str], name: str) -> np.ndarray:
        cache = self._cache_path(name)
        if cache and os.path.exists(cache):
            return np.load(cache)
        path = os.path.join(base_dir or "", name)
        try:
            img = process_image(path)
        except Exception:  # noqa: BLE001  (missing/corrupt image fallback)
            img = self._placeholder_image()
        if cache is not None:
            np.save(cache, img)
        return img

    def main_image(self, image_id: str) -> np.ndarray:
        return self._load(self.img_dir, image_id)

    def aux_images(self, image_id: str) -> np.ndarray:
        """≤3 YOLO crops zero-padded to (num_aux, 224, 224, 3)
        (reference modules/dataset.py:119-132)."""
        out = np.zeros((self.num_aux, CROP, CROP, 3), np.float32)
        paths = self.aux_map.get(image_id, [])
        for i, p in enumerate(paths[:self.num_aux]):
            out[i] = self._load(self.aux_dir, p)
        return out

    def batch(self, image_ids: Sequence[str], with_aux: bool = True):
        main = np.stack([self.main_image(i) for i in image_ids])
        aux = np.stack([self.aux_images(i) for i in image_ids]) \
            if with_aux else None
        return main, aux
