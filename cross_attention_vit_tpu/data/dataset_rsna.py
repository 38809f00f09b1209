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


def _rotate(img: np.ndarray, rotate: int) -> np.ndarray:
    """90°/180° rotation selected by index, matching the reference's
    `rot_choices = [0, ROTATE_90_CLOCKWISE, ROTATE_90_COUNTERCLOCKWISE,
    ROTATE_180]` with its `if rotate > 0` guard (dataset.py:204-212 —
    index 0 never rotates).  np.rot90 spellings are pixel-identical to the
    cv2 constants: CW = k=-1, CCW = k=1, 180 = k=2."""
    if rotate <= 0:
        return img
    k = {1: -1, 2: 1, 3: 2}[rotate]
    return np.ascontiguousarray(np.rot90(img, k))


# one lock per resolved cache file: split datasets (train/val) share the
# biggest-slice JSON, so per-instance locks let two instances interleave
# read-modify-write and drop each other's appended entries on disk
_CACHE_LOCKS: dict[str, threading.Lock] = {}
_CACHE_LOCKS_GUARD = threading.Lock()


def _lock_for(path: Path) -> threading.Lock:
    key = str(Path(path).resolve())
    with _CACHE_LOCKS_GUARD:
        return _CACHE_LOCKS.setdefault(key, threading.Lock())


class RSNADataset:
    """Map-style dataset over DICOM cases.

    Layout: {folder}/{case_id}/{mri_type}/*.dcm
    Items (single-type, the legacy-driver path): (volume
    (1, 1, size, size, num_imgs) float32 in [0,1], label int).

    Multi-type mode (`mri_types=(…)`) mirrors the reference's live
    `BrainRSNADataset` semantics (dataset.py:84-100, 155-190): one volume
    per type stacked on the leading axis → (M, 1, size, size, num_imgs),
    and cases missing ANY requested type's directory are dropped up front
    (its `clean_data`, dataset.py:99-100).

    `rotate` indexes the reference's rot_choices (dataset.py:204-212):
    0 none, 1 = 90° CW, 2 = 90° CCW, 3 = 180°; applied after VOI-LUT,
    before resize, like `load_dicom_image`.
    """

    def __init__(self, data, mri_type: str = "FLAIR", folder: str = "rsna-data",
                 num_imgs: int = 32, size: int = 256, target: str = "MGMT_value",
                 cache_file: str | None = None, is_train: bool = True,
                 mri_types: Sequence[str] | None = None, rotate: int = 0,
                 filter_missing: bool | None = None):
        self.multi = mri_types is not None
        self.types = tuple(mri_types) if self.multi else (mri_type,)
        self.mri_type = self.types[0]
        self.folder = Path(folder)
        self.num_imgs = num_imgs
        self.size = size
        self.target = target
        self.rotate = rotate
        # eval centers the window on the middle slice instead of the biggest
        # (reference dataset.py:173-176)
        self.is_train = is_train
        data = data.reset_index(drop=True)
        # per-case availability filter (reference clean_data, dataset.py:99-100)
        # — on by default only in multi-type mode, where the reference applies it
        if filter_missing is None:
            filter_missing = self.multi
        if filter_missing:
            ok = data["ID"].astype(str).apply(
                lambda c: all((self.folder / c / t).is_dir()
                              for t in self.types))
            data = data[ok].reset_index(drop=True)
        self.data = data
        # one biggest-slice cache file per type (the reference keys one pkl by
        # (case, type), dataset.py:148; per-type JSONs are equivalent and keep
        # the single-type cache format unchanged)
        if cache_file is not None:
            base = Path(cache_file)
            if self.multi:
                self.cache_paths = {t: base.with_name(f"{base.stem}_{t}{base.suffix}")
                                    for t in self.types}
            else:
                self.cache_paths = {self.types[0]: base}
        else:
            self.cache_paths = {t: self.folder / f"biggest_{t}.json"
                                for t in self.types}
        self._biggest: dict[str, dict[str, int]] = {}

    @property
    def cache_path(self) -> Path:
        """The primary type's cache file (single-type back-compat surface)."""
        return self.cache_paths[self.mri_type]

    def _case_dir(self, case_id: str, mri_type: str | None = None) -> Path:
        return self.folder / str(case_id) / (mri_type or self.mri_type)

    def _slices(self, case_id: str, mri_type: str | None = None) -> list[Path]:
        return natural_sort(list(self._case_dir(case_id, mri_type).glob("*.dcm")))

    def _scan_biggest(self, case_id: str, mri_type: str) -> int:
        """Index of the slice with maximal cropped brain area; falls back to
        the middle slice when every area is 0 (reference dataset.py:144-148)."""
        areas = []
        for p in self._slices(case_id, mri_type):
            d = read_dicom(p)
            areas.append(cropped_area(d.pixel_array.astype(np.float32)))
        if not areas:
            raise FileNotFoundError(f"no DICOM slices for case {case_id} "
                                    f"under {self._case_dir(case_id, mri_type)}")
        if not any(areas):
            return len(areas) // 2
        return int(np.argmax(areas))

    def _write_cache_atomic(self, cache_path: Path,
                            biggest: dict[str, int]) -> None:
        """Atomic publish (tempfile + rename): PrefetchLoader decodes items on
        parallel threads and split datasets share one cache file, so a plain
        write_text can be read half-written by a concurrent reader
        (observed as JSONDecodeError in the loader).  The on-disk file is
        re-read and merged first so two dataset instances appending different
        cases never drop each other's entries (our values win on conflict)."""
        try:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            if cache_path.exists():
                try:
                    on_disk = json.loads(cache_path.read_text())
                    biggest = {**on_disk, **biggest}
                except (json.JSONDecodeError, OSError):
                    pass  # torn cache from a crashed writer: overwrite
            fd, tmp = tempfile.mkstemp(suffix=".tmp.json",
                                       dir=cache_path.parent)
            with os.fdopen(fd, "w") as f:
                f.write(json.dumps(biggest))
            os.replace(tmp, cache_path)
        except OSError:
            pass  # read-only data folder: keep in memory only

    def prepare_biggest_images(self, mri_type: str | None = None) -> dict[str, int]:
        """Per case, index of the slice with maximal cropped brain area;
        cached to JSON per type (dataset.py:122-152).  First touch is
        serialized per cache file (shared across instances); a torn/corrupt
        cache file from a crashed writer is rescanned rather than crashing."""
        mri_type = mri_type or self.mri_type
        if mri_type in self._biggest:
            return self._biggest[mri_type]
        cache_path = self.cache_paths[mri_type]
        with _lock_for(cache_path):
            if mri_type in self._biggest:
                return self._biggest[mri_type]
            if cache_path.exists():
                try:
                    self._biggest[mri_type] = json.loads(cache_path.read_text())
                    return self._biggest[mri_type]
                except (json.JSONDecodeError, OSError):
                    pass  # torn cache: fall through and rebuild
            biggest = {case_id: self._scan_biggest(case_id, mri_type)
                       for case_id in self.data["ID"].astype(str)}
            self._write_cache_atomic(cache_path, biggest)
            self._biggest[mri_type] = biggest
            return biggest

    def _biggest_for(self, case_id: str, mri_type: str) -> int:
        """Cache lookup with compute-on-miss: split datasets share one cache
        file, so a case absent from a previously-written cache (built by a
        different split) is scanned and appended on demand."""
        biggest = self.prepare_biggest_images(mri_type)
        if case_id not in biggest:
            with _lock_for(self.cache_paths[mri_type]):
                if case_id not in biggest:
                    biggest[case_id] = self._scan_biggest(case_id, mri_type)
                    self._write_cache_atomic(self.cache_paths[mri_type], biggest)
        return biggest[case_id]

    def load_volume(self, case_id: str,
                    mri_type: str | None = None) -> np.ndarray:
        mri_type = mri_type or self.mri_type
        paths = self._slices(str(case_id), mri_type)
        if self.is_train:
            middle = self._biggest_for(str(case_id), mri_type)
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
            arr = _rotate(arr, self.rotate)
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
        """(img (M, 1, size, size, num_imgs) float32, label int) — the
        framework's (M, C, D, H, W) convention with the slice axis as W,
        matching an img_size of (size, size, num_imgs).  M = len(mri_types)
        (1 on the legacy single-type path); the reference's per-case stack is
        dataset.py:163-190 (np.stack(...).T per type, stacked over types)."""
        row = self.data.iloc[index]
        mods = []
        for t in self.types:
            vol = self.load_volume(str(row["ID"]), t)  # (1, num_imgs, size, size)
            mods.append(np.ascontiguousarray(vol[0].transpose(1, 2, 0))[None])
        return np.stack(mods), int(row[self.target])

    def batch(self, indices):
        items = [self[i] for i in indices]
        return (np.stack([it[0] for it in items]),
                np.asarray([it[1] for it in items], dtype=np.int32))
