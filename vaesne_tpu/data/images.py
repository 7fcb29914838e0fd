"""Image loading from paths: the reference's PIL datasets, TPU-shaped.

Capabilities mirrored from reference ``data_util.py``:
  * ``ImagePathDataset``    (data_util.py:23-45): load RGB files, normalize
    to [-1, 1], return (image, empty event_loc placeholder)
  * ``ImagePathDatasetAug`` (data_util.py:47-73): xfactor flip/affine
    augmentation — replaced by the on-device per-epoch ``augment_images``
    (``vaesne_tpu.data.augment``), which diversifies every epoch instead of
    fixing one augmented copy at load time; the xfactor replication is
    ``repeat_dataset``.

TPU-native shape: instead of per-item lazy loading through DataLoader
workers, the whole (small) image set is decoded once on host into a single
[N, C, H, W] float32 array destined for HBM residence.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


@dataclass
class ImagePathDataset:
    """Eagerly-decodable list of image paths with the reference's
    normalization (to [-1, 1], data_util.py:31-34) and (image, event_loc)
    item contract (data_util.py:44)."""

    paths: Sequence[str]
    img_size: Optional[int] = None
    grayscale: bool = False

    @classmethod
    def from_dir(cls, root: str, img_size: Optional[int] = None,
                 grayscale: bool = False) -> "ImagePathDataset":
        paths = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.lower().endswith(IMG_EXTENSIONS)
        )
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        return cls(paths, img_size=img_size, grayscale=grayscale)

    def __len__(self) -> int:
        return len(self.paths)

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image  # noqa: PLC0415

        img = Image.open(path).convert("L" if self.grayscale else "RGB")
        if self.img_size is not None:
            img = img.resize((self.img_size, self.img_size))
        a = np.asarray(img, np.float32) / 255.0
        if a.ndim == 2:
            a = a[..., None]
        return np.transpose(a * 2.0 - 1.0, (2, 0, 1))  # HWC → CHW, [-1, 1]

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._decode(self.paths[i]), np.zeros((0,), np.float32)

    def load_all(self) -> np.ndarray:
        """Decode every image into one [N, C, H, W] float32 array."""
        return np.stack([self._decode(p) for p in self.paths])


def image_tuple(images: np.ndarray):
    """[N, C, H, W] → the model input contract (image, event_loc placeholder)."""
    import jax.numpy as jnp

    return (jnp.asarray(images), jnp.zeros((images.shape[0], 0), jnp.float32))
