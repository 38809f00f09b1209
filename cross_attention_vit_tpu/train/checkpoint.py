"""Checkpointing: pytree save/restore + top-k-by-metric retention.

Mirrors the reference's Lightning ModelCheckpoint policy — monitor a metric,
keep the best k, embed epoch+metric in the filename (main_mist.py:174-180) —
and the manual torch.save dict of model/optimizer/step (other_model.py:341-351),
as one npz-per-checkpoint format with a JSON manifest.

Arrays are gathered to host before writing (fully-addressable;
`jax.device_get` handles sharded arrays on a single host).  Restore rebuilds
the exact pytree structure from the flattened key paths.
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax
import numpy as np

# One background writer: the host->disk np.savez of a full-size state is
# ~3 GB; fetching to host is synchronous (a consistent snapshot) but the
# file write overlaps the next epoch's compute.
_writer = ThreadPoolExecutor(max_workers=1)
_pending: list = []


def wait_for_writes() -> None:
    """Block until all async checkpoint writes are durable."""
    while _pending:
        _pending.pop().result()


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _path_str(p) -> str:
    if isinstance(p, jax.tree_util.DictKey):
        return str(p.key)
    if isinstance(p, jax.tree_util.SequenceKey):
        return str(p.idx)
    if isinstance(p, jax.tree_util.GetAttrKey):
        return str(p.name)
    return str(p)


def save_pytree(path: str | Path, tree, async_write: bool = False) -> None:
    """Snapshot `tree` to host synchronously; write the npz either inline or
    on the background writer (async_write).  Async writes go via a temp file
    + atomic rename so a crash mid-write never leaves a torn checkpoint."""
    flat = _flatten(tree)  # device_get: consistent snapshot taken NOW
    if not async_write:
        np.savez(path, **flat)
        return

    path = Path(path)

    def write():
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, **flat)
        os.replace(tmp, path)

    _pending.append(_writer.submit(write))


def restore_pytree(path: str | Path, like) -> object:
    """Restore into the structure of `like` (a template pytree or eval_shape)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    leaves = []
    for path, template in leaves_with_path:
        key = "/".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        want_shape = tuple(template.shape)
        if tuple(arr.shape) != want_shape:
            raise ValueError(f"leaf {key!r} shape {arr.shape} != expected {want_shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Top-k retention keyed on a monitored metric.

    mode='min' keeps the k smallest (val_loss); filenames embed epoch and the
    metric value like the reference's `{epoch:02d}-{val_loss:.4f}<tag>`.
    """

    def __init__(self, dirpath: str | Path, monitor: str = "val_loss",
                 save_top_k: int = 10, mode: str = "min", tag: str = "",
                 async_write: bool = False, config=None):
        self.dir = Path(dirpath)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.k = save_top_k
        self.mode = mode
        self.tag = tag
        self.async_write = async_write
        # persist the model config next to the weights so evaluation can
        # rebuild the architecture without re-specifying it (the reference
        # has no such provenance — Lightning ckpt hyperparams fill that role)
        if config is not None:
            cfg_dict = config.to_dict() if hasattr(config, "to_dict") else dict(config)
            path = self.dir / f"config{('_' + tag) if tag else ''}.json"
            path.write_text(json.dumps(cfg_dict, default=str, indent=1))
        self._manifest_path = self.dir / f"manifest{('_' + tag) if tag else ''}.json"
        self._entries: list[dict] = []
        if self._manifest_path.exists():
            # dedup by filename on load: manifests written before the
            # replace-on-resave fix may carry duplicate entries for epochs a
            # resumed run replayed
            seen = set()
            for e in json.loads(self._manifest_path.read_text()):
                if e["file"] not in seen:
                    seen.add(e["file"])
                    self._entries.append(e)

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def save(self, epoch: int, metric_value: float, state: dict) -> Path | None:
        """state: any pytree (e.g. {'params':…, 'opt':…, 'epoch':…}).
        Returns the written path, or None if not in the top-k."""
        if self.k > 0 and len(self._entries) >= self.k:
            worst = self._entries[-1]
            if not self._better(metric_value, worst["metric"]):
                return None
        fname = f"epoch={epoch:02d}-{self.monitor}={metric_value:.4f}{self.tag}.npz"
        path = self.dir / fname
        existing = next((e for e in self._entries if e["file"] == fname), None)
        if (existing is not None and existing.get("epoch") == epoch
                and existing["metric"] == float(metric_value)
                and path.exists()):
            # a resumed run replaying this epoch: replay is bit-identical
            # through a kill/restore boundary (docs/RUN_r02.md), so an
            # already-durable checkpoint with the same epoch AND exact metric
            # is the same bytes — skip the ~GB re-fetch + rewrite (measured:
            # each duplicate re-save cost minutes of relayed D2H during the
            # RUN_r03 resume).  Any metric mismatch falls through to a real
            # overwrite.
            return path
        save_pytree(path, state, async_write=self.async_write)
        # a resumed run re-saves epochs it replayed: the file is overwritten
        # in place, so replace any manifest entry with the same name instead
        # of double-counting it against the top-k budget
        self._entries = [e for e in self._entries if e["file"] != fname]
        self._entries.append({"epoch": epoch, "metric": float(metric_value),
                              "file": fname})
        self._entries.sort(key=lambda e: e["metric"],
                           reverse=(self.mode != "min"))
        drops = []
        while self.k > 0 and len(self._entries) > self.k:
            drops.append(self.dir / self._entries.pop()["file"])
        if drops:
            if self.async_write:
                # the writer is single-threaded, so queuing removals after the
                # pending write jobs guarantees a dropped file is deleted only
                # once its (possibly still-queued) write has landed — a
                # main-thread remove would no-op on the missing file and the
                # later rename would materialize an unpruned ~GB npz
                _pending.append(_writer.submit(self._remove_files, drops))
            else:
                self._remove_files(drops)
        self._manifest_path.write_text(json.dumps(self._entries, indent=1))
        return path

    @staticmethod
    def _remove_files(paths) -> None:
        for p in paths:
            try:
                os.remove(p)
            except FileNotFoundError:
                pass

    def best(self) -> dict | None:
        return self._entries[0] if self._entries else None

    def best_path(self) -> Path | None:
        e = self.best()
        return self.dir / e["file"] if e else None


def load_config_for(checkpoint_path: str | Path):
    """Find and load the config JSON persisted next to a checkpoint.
    Prefers the config whose run tag appears in the checkpoint filename."""
    from ..configs import Config

    path = Path(checkpoint_path)
    candidates = sorted(path.parent.glob("config*.json"))
    best = None
    for c in candidates:
        tag = c.stem[len("config"):].lstrip("_")
        if tag and tag in path.name:
            best = c
            break
        if not tag and best is None:
            best = c
    if best is None and candidates:
        best = candidates[0]
    if best is None:
        return None
    raw = json.loads(best.read_text())
    return Config(**raw)


_LATEST_RE = re.compile(r"step=(\d+)\.npz$")


class LatestCheckpointer:
    """Rolling 'latest step' checkpoint for preemption-safe resume — the TPU
    robustness feature the reference lacks (SURVEY.md §5 failure-detection row)."""

    def __init__(self, dirpath: str | Path, keep: int = 2,
                 async_write: bool = False):
        self.dir = Path(dirpath)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self.async_write = async_write

    def save(self, step: int, state) -> Path:
        path = self.dir / f"step={step}.npz"
        save_pytree(path, state, async_write=self.async_write)
        if self.async_write:
            # the writer is single-threaded, so queuing the prune after the
            # write job guarantees it only removes durably-replaced files
            _pending.append(_writer.submit(self._prune))
        else:
            self._prune()
        return path

    def _complete(self):
        """(step, path) pairs for DURABLE saves only.  A SIGKILL during
        save_pytree's atomic write leaves `step=N.tmp.npz` behind (the
        os.replace never ran); that name matches the `step=*.npz` glob but
        NOT _LATEST_RE — the r5 kill/resume drive crashed here
        (docs/RUN_r05.md), so partials are filtered, never parsed."""
        out = []
        for p in self.dir.glob("step=*.npz"):
            m = _LATEST_RE.search(p.name)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def _prune(self):
        for _, old in self._complete()[:-self.keep]:
            old.unlink()

    def latest_step(self) -> int | None:
        steps = [s for s, _ in self._complete()]
        # sweep partial writes: they are truncated npz files a crashed
        # process can never finish, and they shadow disk space
        for p in self.dir.glob("step=*.tmp.npz"):
            try:
                p.unlink()
            except OSError:
                pass
        return max(steps) if steps else None

    def restore_latest(self, like):
        step = self.latest_step()
        if step is None:
            return None, None
        return step, restore_pytree(self.dir / f"step={step}.npz", like)
