"""Device-feeding data loader: threaded host decode + double-buffered
host→HBM prefetch.

Replaces the reference's `DataLoader(num_workers=5, sampler=...)` process pool
(main_mist.py:206-207).  On TPU the right shape is: worker *threads* (the hot
decode path — zlib, NumPy slicing — releases the GIL), batches assembled on
host, and `jax.device_put` issued one batch ahead so the H2D copy of the next
batch overlaps the current step's compute.  With sharding, `device_put` places
each batch shard directly on its data-parallel device.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import jax
import numpy as np

from .dataset import BrainDataset


class PrefetchLoader:
    """Iterates (img, label) device batches for one epoch's index order."""

    def __init__(self, dataset: BrainDataset, batch_size: int,
                 num_workers: int = 4, prefetch: int = 2,
                 sharding: jax.sharding.Sharding | None = None,
                 drop_last: bool = False,
                 transfer_dtype: str | np.dtype | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self.drop_last = drop_last
        # Optional low-precision H2D transfer.  The host→HBM link is the e2e
        # bottleneck on relay-attached hosts (BENCH notes), and when the model
        # computes in bf16 the first matmul rounds the input to bf16 anyway —
        # so casting on host before device_put halves transfer bytes with
        # bit-identical logits (models re-promote to f32 at entry, preserving
        # f32 accumulation; see ops.layers.promote_input).
        self.transfer_dtype = _resolve_dtype(transfer_dtype)

    def _batches(self, indices: Sequence[int]) -> list[np.ndarray]:
        idx = np.asarray(indices)
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        rem = idx[n_full * self.batch_size:]
        if len(rem) and not self.drop_last:
            batches.append(rem)
        # a batch sharded over the mesh 'data' axis must divide it: pad short
        # batches by wrap-around — the torch DistributedSampler convention
        # (duplicated samples slightly overweight the partial batch in epoch
        # metrics, exactly as the reference's Lightning-DDP eval does)
        div = self._batch_divisor()
        if div > 1:
            batches = [np.resize(b, -(-len(b) // div) * div)
                       if len(b) % div else b for b in batches]
        return batches

    def _batch_divisor(self) -> int:
        """Per-process batch-size divisor implied by the sharding: the number
        of data-axis shards this process feeds."""
        from jax.sharding import NamedSharding

        s = self.sharding
        if not isinstance(s, NamedSharding) or not len(s.spec) or not s.spec[0]:
            return 1
        axes = s.spec[0]
        names = (axes,) if isinstance(axes, str) else tuple(axes)
        total = 1
        for n in names:
            total *= s.mesh.shape[n]
        return max(1, total // jax.process_count())

    def __call__(self, indices: Sequence[int]) -> Iterator[tuple[jax.Array, jax.Array]]:
        batches = self._batches(indices)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def fetch_batch(b):
            if getattr(self.dataset, "fast_batch", False) or \
                    not hasattr(self.dataset, "__getitem__"):
                return self.dataset.batch(b)
            # decode items in parallel: gunzip releases the GIL, and decode
            # overlaps the relay wait of the previous batch's device_put
            items = list(pool.map(self.dataset.__getitem__, b))
            imgs = np.stack([it[0] for it in items])
            labels = np.asarray([it[1] for it in items], dtype=np.int32)
            return imgs, labels

        def cast_batch(imgs):
            td = self.transfer_dtype
            if td is not None and imgs.dtype != td:
                imgs = imgs.astype(td)
            return imgs

        def safe_put(item) -> bool:
            """put() that gives up when the consumer abandoned iteration —
            otherwise a full queue would block this thread forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    imgs, labels = fetch_batch(b)
                    imgs = cast_batch(imgs)
                    if self.sharding is not None:
                        imgs = _put(imgs, self.sharding)
                        labels = _put(labels, _label_sharding(self.sharding))
                    else:
                        imgs = jax.device_put(imgs)
                        labels = jax.device_put(labels)
                    if not safe_put((imgs, labels)):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                safe_put(e)
            finally:
                safe_put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


def transfer_dtype_for(config) -> str | None:
    """Loader transfer dtype implied by the model's compute dtype: bf16
    compute rounds the input at the first matmul regardless, so shipping the
    batch as bf16 halves H2D bytes with bit-identical logits."""
    return "bfloat16" if config.get("compute_dtype", "float32") == "bfloat16" else None


def _resolve_dtype(td):
    """'bfloat16'/'float16'/np dtype → numpy dtype (ml_dtypes supplies bf16)."""
    if td is None:
        return None
    if isinstance(td, str) and td == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(td)


def _put(x, sharding):
    """Place a host batch onto the mesh.

    Single-process: a plain sharded device_put.  Multi-host (v5e pods /
    multi-slice): each process loads only ITS shard of the global batch
    (partition epoch indices by host — WeightedRandomSampler.epoch_indices
    takes host_id) and the global array is assembled from process-local
    data; the global batch size is local_batch × process_count along the
    'data' axis."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def _label_sharding(sharding: jax.sharding.Sharding) -> jax.sharding.Sharding:
    """Labels are rank-1: shard along the batch axis only."""
    from jax.sharding import NamedSharding, PartitionSpec

    if isinstance(sharding, NamedSharding) and len(sharding.spec) >= 1:
        return NamedSharding(sharding.mesh, PartitionSpec(sharding.spec[0]))
    return sharding
