"""BrainDataset — UCSF-PDGM NIfTI dataset with the reference's semantics.

Mirrors reference dataset_ucsf.py:73-158: per index, load one `.nii.gz` per
requested modality, pad/crop to `config.img_size` with constant −1, and return
``(img (M, 1, D, H, W) float32, label int64)``.

TPU-first division of labor: the host does decode + pad/crop only (all-C hot
path: zlib + NumPy slicing); stochastic augmentation runs **batched on
device** inside the jitted train step (see data/augment.py) instead of
per-sample on CPU workers — that keeps the 9-transform pipeline off the host
critical path entirely.  An optional in-RAM cache of decoded+cropped volumes
(6 subjects × 3 modalities ≈ 38 MB at (128,128,64) f32) removes repeated
gunzip work across epochs — the reference re-decodes every epoch.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from ..configs import Config
from .nifti import read_volume_cropped, volume_path


class BrainDataset:
    """Map-style dataset: `len(ds)`, `ds[i] -> (np.ndarray (M,1,D,H,W) f32, int)`."""

    def __init__(self, data: pd.DataFrame, config: Config,
                 types: Sequence[str] = ("T1c", "T2"), is_train: bool = True,
                 folder: str = "ucsf-data", cache: bool = True,
                 decode_workers: int = 0, use_native: bool | None = None,
                 disk_cache: str | None = None):
        self.target = config.target
        self.data = data.reset_index(drop=True)
        self.types = tuple(types)
        self.is_train = is_train
        self.folder = folder
        self.img_size = tuple(config.img_size)
        self._cache: dict[tuple[str, str], np.ndarray] | None = {} if cache else None
        self._pool = (ThreadPoolExecutor(max_workers=decode_workers)
                      if decode_workers > 0 else None)
        if use_native is None:
            from . import native
            use_native = native.available()
        self.use_native = use_native
        # Optional on-disk decoded cache: first touch decodes+crops and writes
        # a raw .npy; later epochs (and later RUNS over the same cohort) read
        # it back without gunzip.  A 250-epoch training run decodes each
        # volume once instead of 250 times.
        self._disk_cache = Path(disk_cache) if disk_cache else None
        if self._disk_cache is not None:
            self._disk_cache.mkdir(parents=True, exist_ok=True)
        # when not caching, the C++ batch decoder beats per-item Python;
        # with a cache, per-item (cached) reads win after the first epoch
        self.fast_batch = bool(use_native and self._cache is None
                               and self._disk_cache is None)

    def __len__(self) -> int:
        return len(self.data)

    def _load_one(self, case_id: str, mri_type: str) -> np.ndarray:
        key = (case_id, mri_type)
        if self._cache is not None and key in self._cache:
            return self._cache[key]
        vol = None
        disk_path = None
        if self._disk_cache is not None:
            size_tag = "x".join(map(str, self.img_size))
            disk_path = self._disk_cache / f"{case_id}_{mri_type}_{size_tag}.npy"
            if disk_path.exists():
                vol = np.load(disk_path)[None]
        if vol is None:
            path = volume_path(self.folder, case_id, mri_type)
            if self.use_native:
                from . import native
                vol = native.decode_crop(path, self.img_size, fill=-1.0)[None]
            else:
                vol = read_volume_cropped(path, self.img_size, fill=-1.0)[None]
            if disk_path is not None:
                # unique temp name: replacement sampling duplicates indices, so
                # two loader threads can race the first-touch write of the same
                # (case, modality) — each writes its own temp then renames;
                # the loser's rename just overwrites identical bytes
                import tempfile

                fd, tmp = tempfile.mkstemp(suffix=".tmp.npy",
                                           dir=str(disk_path.parent))
                try:
                    with os.fdopen(fd, "wb") as f:
                        np.save(f, vol[0])
                    os.replace(tmp, disk_path)  # atomic vs concurrent readers
                except BaseException:
                    try:
                        os.unlink(tmp)
                    except FileNotFoundError:
                        pass
                    raise
        if self._cache is not None:
            self._cache[key] = vol
        return vol  # (1, D, H, W)

    def __getitem__(self, index: int) -> tuple[np.ndarray, int]:
        row = self.data.iloc[index]
        case_id = row["ID"]
        label = int(row[self.target])
        if self._pool is not None:
            vols = list(self._pool.map(lambda t: self._load_one(case_id, t), self.types))
        else:
            vols = [self._load_one(case_id, t) for t in self.types]
        return np.stack(vols), label  # (M, 1, D, H, W), int

    def batch(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        if self.fast_batch:  # native batch decode; no mem/disk cache in play
            return self._batch_native(indices)
        items = [self[i] for i in indices]
        imgs = np.stack([it[0] for it in items])
        labels = np.asarray([it[1] for it in items], dtype=np.int32)
        return imgs, labels

    def _batch_native(self, indices: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
        """Hot path: one C++ call decodes every (sample, modality) volume of
        the batch straight into the batch buffer — no per-item Python, no
        np.stack copy (native/nifti_decode.cpp batch API)."""
        from . import native

        rows = [self.data.iloc[i] for i in indices]
        paths = [volume_path(self.folder, row["ID"], t)
                 for row in rows for t in self.types]
        flat = native.decode_crop_batch(paths, self.img_size, fill=-1.0,
                                        num_threads=min(8, len(paths)))
        B, M = len(rows), len(self.types)
        imgs = flat.reshape(B, M, 1, *self.img_size)
        labels = np.asarray([int(r[self.target]) for r in rows], dtype=np.int32)
        return imgs, labels


def create_sampler_weights(train_df: pd.DataFrame, target: str) -> np.ndarray:
    """Inverse-class-frequency weights (reference main_mist.py:44-53)."""
    num_negative = int((train_df[target] == 0).sum())
    num_positive = len(train_df) - num_negative
    class_weights = 1.0 / np.asarray([num_negative, num_positive], dtype=np.float64)
    return class_weights[train_df[target].astype(int).to_numpy()]


class WeightedRandomSampler:
    """Replacement-sampling with per-sample weights, per torch's
    WeightedRandomSampler semantics (draw `num_samples` indices with
    probability ∝ weight, with replacement).

    Under data parallelism each host draws independently over its own shard —
    a cleanly-defined version of the reference's ill-specified
    WeightedRandomSampler × Lightning-DDP interaction (SURVEY.md §7 risks);
    seed by (base_seed, epoch, host_id) for determinism.
    """

    def __init__(self, weights: np.ndarray, num_samples: int, seed: int = 0):
        self.p = np.asarray(weights, dtype=np.float64)
        self.p = self.p / self.p.sum()
        self.num_samples = num_samples
        self.seed = seed

    def epoch_indices(self, epoch: int, host_id: int = 0,
                      num_hosts: int = 1) -> np.ndarray:
        """One epoch's index draw.  Multi-host: each host draws its OWN
        num_samples/num_hosts indices with a (seed, epoch, host_id) stream —
        independent per-host draws over the full cohort, so the global epoch
        still visits num_samples weighted samples with no cross-host
        duplication *by construction* (each draw is i.i.d.)."""
        rng = np.random.default_rng((self.seed, epoch, host_id))
        n = self.num_samples // num_hosts if num_hosts > 1 else self.num_samples
        return rng.choice(len(self.p), size=max(n, 1), replace=True, p=self.p)
