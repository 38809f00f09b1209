"""Legacy RSNA-BraTS DICOM dataset — the reference's earlier-phase ingest.

Capability parity with reference dataset.py `BrainRSNADataset` (broken in the
reference — it calls a nonexistent config factory and reads a missing CSV;
dataset.py:35,43):

  * per case, slice files sorted naturally by the digits in their names
    (dataset.py:137-142);
  * brain-region crop: bounding box of > 0 voxels (crop_img, dataset.py:49-69);
  * "biggest slice" selection: the slice whose cropped brain area is maximal,
    computed once per case and cached to disk (dataset.py:122-152 — joblib
    pickle there, JSON here);
  * a window of at most `num_imgs` slices centered on the biggest slice
    (train) or the middle slice (eval), bounded at [middle − num_imgs//2,
    middle + num_imgs//2) like the reference (dataset.py:178-181); each
    slice: VOI-LUT windowing → resize to (size, size) → min-shift then
    max-divide normalization (dataset.py:212-215 — NOT a bare /max: the
    shift keeps signed VOI-LUT outputs in [0,1]); depth zero-padded to
    `num_imgs` (dataset.py:183-190).  The bbox crop is used ONLY for
    biggest-slice selection (extract_cropped_image_size), never applied to
    the loaded slice itself.

Resize uses OpenCV bilinear like the reference when cv2 is importable, else
jax.image on host numpy.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import threading
from pathlib import Path
from typing import Sequence

import numpy as np

from .dicom import apply_voi_lut, read_dicom

_DIGITS = re.compile(r"(\d+)")


def natural_sort(paths: Sequence[Path]) -> list[Path]:
    """'Image-9.dcm' < 'Image-10.dcm' (reference dataset.py:137-142)."""

    def key(p: Path):
        return [int(t) if t.isdigit() else t for t in _DIGITS.split(p.name)]

    return sorted(paths, key=key)


def crop_img(img: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Bounding-box crop of the > threshold region (dataset.py:49-69).
    Returns the input unchanged when nothing exceeds the threshold."""
    mask = img > threshold
    if not mask.any():
        return img
    rows = np.where(mask.any(axis=1))[0]
    cols = np.where(mask.any(axis=0))[0]
    return img[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]


def cropped_area(img: np.ndarray, threshold: float = 0.0) -> int:
    """Area of the cropped region (extract_cropped_image_size, dataset.py:72-81)."""
    c = crop_img(img, threshold)
    return int(c.shape[0] * c.shape[1])


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img.astype(np.float32), (size, size))
    except ImportError:  # pragma: no cover
        import jax

        return np.asarray(jax.image.resize(img.astype(np.float32),
                                           (size, size), "linear"))


class RSNADataset:
    """Map-style dataset over DICOM cases.

    Layout: {folder}/{case_id}/{mri_type}/*.dcm
    Items: (volume (1, num_imgs, size, size) float32 in [0,1], label int)
    """

    def __init__(self, data, mri_type: str = "FLAIR", folder: str = "rsna-data",
                 num_imgs: int = 32, size: int = 256, target: str = "MGMT_value",
                 cache_file: str | None = None, is_train: bool = True):
        self.data = data.reset_index(drop=True)
        self.mri_type = mri_type
        self.folder = Path(folder)
        self.num_imgs = num_imgs
        self.size = size
        self.target = target
        # eval centers the window on the middle slice instead of the biggest
        # (reference dataset.py:173-176)
        self.is_train = is_train
        self.cache_path = Path(cache_file) if cache_file else \
            self.folder / f"biggest_{mri_type}.json"
        self._biggest: dict[str, int] | None = None
        # serializes first-touch scanning and cache IO across loader threads
        self._biggest_lock = threading.Lock()

    def _case_dir(self, case_id: str) -> Path:
        return self.folder / str(case_id) / self.mri_type

    def _slices(self, case_id: str) -> list[Path]:
        return natural_sort(list(self._case_dir(case_id).glob("*.dcm")))

    def _scan_biggest(self, case_id: str) -> int:
        """Index of the slice with maximal cropped brain area; falls back to
        the middle slice when every area is 0 (reference dataset.py:144-148)."""
        areas = []
        for p in self._slices(case_id):
            d = read_dicom(p)
            areas.append(cropped_area(d.pixel_array.astype(np.float32)))
        if not areas:
            raise FileNotFoundError(f"no DICOM slices for case {case_id} "
                                    f"under {self._case_dir(case_id)}")
        if not any(areas):
            return len(areas) // 2
        return int(np.argmax(areas))

    def _write_cache_atomic(self, biggest: dict[str, int]) -> None:
        """Atomic publish (tempfile + rename): PrefetchLoader decodes items on
        parallel threads and split datasets share one cache file, so a plain
        write_text can be read half-written by a concurrent reader
        (observed as JSONDecodeError in the loader)."""
        try:
            self.cache_path.parent.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".tmp.json",
                                       dir=self.cache_path.parent)
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps(biggest))
            os.replace(tmp, self.cache_path)
        except OSError:
            pass  # read-only data folder: keep in memory only

    def prepare_biggest_images(self) -> dict[str, int]:
        """Per case, index of the slice with maximal cropped brain area;
        cached to JSON (dataset.py:122-152).  First touch is serialized per
        instance; a torn/corrupt cache file from a crashed writer is
        rescanned rather than crashing."""
        if self._biggest is not None:
            return self._biggest
        with self._biggest_lock:
            if self._biggest is not None:
                return self._biggest
            if self.cache_path.exists():
                try:
                    self._biggest = json.loads(self.cache_path.read_text())
                    return self._biggest
                except (json.JSONDecodeError, OSError):
                    pass  # torn cache: fall through and rebuild
            biggest = {case_id: self._scan_biggest(case_id)
                       for case_id in self.data["ID"].astype(str)}
            self._write_cache_atomic(biggest)
            self._biggest = biggest
            return biggest

    def _biggest_for(self, case_id: str) -> int:
        """Cache lookup with compute-on-miss: split datasets share one cache
        file, so a case absent from a previously-written cache (built by a
        different split) is scanned and appended on demand."""
        biggest = self.prepare_biggest_images()
        if case_id not in biggest:
            with self._biggest_lock:
                if case_id not in biggest:
                    biggest[case_id] = self._scan_biggest(case_id)
                    self._write_cache_atomic(biggest)
        return biggest[case_id]

    def load_volume(self, case_id: str) -> np.ndarray:
        paths = self._slices(str(case_id))
        if self.is_train:
            middle = self._biggest_for(str(case_id))
        else:
            middle = len(paths) // 2
        half = self.num_imgs // 2
        # window bounded at BOTH ends like the reference (dataset.py:178-181):
        # a biggest-slice near the start/end yields FEWER than num_imgs slices
        # (zero-padded below), not a window extended to full length
        lo = max(0, middle - half)
        hi = min(len(paths), middle + half)
        window = paths[lo:hi]

        imgs = []
        for p in window:
            d = read_dicom(p)
            arr = apply_voi_lut(d.pixel_array, d).astype(np.float32)
            arr = _resize(arr, self.size)
            # min-shift then max-divide (dataset.py:212-215): signed VOI-LUT
            # outputs land in [0,1]; a bare /max would flip sign/scale
            arr = arr - arr.min()
            m = arr.max()
            if m > 0:
                arr = arr / m
            imgs.append(arr)
        vol = np.stack(imgs) if imgs else np.zeros((0, self.size, self.size),
                                                   np.float32)
        if vol.shape[0] < self.num_imgs:    # zero-pad depth (dataset.py:183-190)
            pad = np.zeros((self.num_imgs - vol.shape[0], self.size, self.size),
                           np.float32)
            vol = np.concatenate([vol, pad])
        return vol[None]  # (1, num_imgs, size, size)

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int):
        """(img (1, 1, size, size, num_imgs) float32, label int) — the
        framework's (M, C, D, H, W) convention with the slice axis as W,
        matching an img_size of (size, size, num_imgs)."""
        row = self.data.iloc[index]
        vol = self.load_volume(str(row["ID"]))        # (1, num_imgs, size, size)
        vol = np.ascontiguousarray(vol[0].transpose(1, 2, 0))[None, None]
        return vol, int(row[self.target])

    def batch(self, indices):
        items = [self[i] for i in indices]
        return (np.stack([it[0] for it in items]),
                np.asarray([it[1] for it in items], dtype=np.int32))
