"""Experiment loggers: CSV + TensorBoard, mirroring the reference's dual
CSVLogger/TensorBoardLogger setup (main_mist.py:183-184).

TensorBoard output uses tensorboardX when available and degrades to a no-op
otherwise (the environment contract forbids installing new deps).
"""

from __future__ import annotations

import csv
import os
import tempfile
from pathlib import Path


class CSVLogger:
    """One metrics.csv per run: columns grow as new metric names appear.

    resume=True loads a pre-existing metrics.csv so a preemption-resumed run
    keeps its pre-kill history (a replayed epoch re-logs and replaces its
    row).  The default (False) starts fresh — a new run pointed at a
    previously-used dir must not silently inherit another run's rows.
    Every rewrite goes through a temp file + atomic rename so a kill
    mid-write can never tear the file (the r02 flagship run lost epochs 0-1
    to an in-place rewrite interrupted by SIGKILL)."""

    def __init__(self, save_dir: str | Path, name: str, resume: bool = False):
        self.dir = Path(save_dir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / "metrics.csv"
        self._rows: list[dict] = []
        self._fields: list[str] = ["epoch"]
        if resume and self.path.exists():
            with open(self.path, newline="") as f:
                for row in csv.DictReader(f):
                    parsed = {k: (int(v) if k == "epoch" else float(v))
                              for k, v in row.items() if v not in ("", None)}
                    self._rows.append(parsed)
                    for k in parsed:
                        if k not in self._fields:
                            self._fields.append(k)

    def log_metrics(self, metrics: dict, epoch: int) -> None:
        row = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
        self._rows = [r for r in self._rows if r.get("epoch") != epoch]
        self._rows.append(row)
        self._rows.sort(key=lambda r: r.get("epoch", 0))
        fd, tmp = tempfile.mkstemp(suffix=".tmp.csv", dir=self.dir)
        with os.fdopen(fd, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields)
            w.writeheader()
            w.writerows(self._rows)
        os.replace(tmp, self.path)

    def finalize(self) -> None:
        pass


class TensorBoardLogger:
    def __init__(self, save_dir: str | Path, name: str):
        self.dir = Path(save_dir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(logdir=str(self.dir))
        except ImportError:  # pragma: no cover - env without tensorboardX
            self._writer = None

    def log_metrics(self, metrics: dict, epoch: int) -> None:
        if self._writer is None:
            return
        for k, v in metrics.items():
            self._writer.add_scalar(k, float(v), epoch)

    def finalize(self) -> None:
        if self._writer is not None:
            self._writer.close()


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def log_metrics(self, metrics: dict, epoch: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, epoch)

    def finalize(self) -> None:
        for lg in self.loggers:
            lg.finalize()
