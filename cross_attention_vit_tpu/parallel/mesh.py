"""Device-mesh construction and multi-host runtime init.

This layer replaces the reference's NCCL/DDP "backend" (Lightning
`Trainer(devices=4, num_nodes=2)`, main_mist.py:216-217): instead of a
process-group bootstrap, the framework exposes a `Mesh` over ('data',
'model') axes; gradient all-reduces and TP collectives are inserted by GSPMD
from sharding annotations and ride ICI (intra-slice) / DCN (multi-slice).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1, pipe: int = 1, seq: int = 1,
              expert: int = 1, devices=None) -> Mesh:
    """Mesh with ('pipe', 'data', 'expert', 'seq', 'model') axes (size-1
    'pipe'/'expert'/'seq' axes are omitted, so the common DP/TP case keeps
    its 2-D ('data', 'model') shape).

    data=-1 means "all remaining devices".  The 'model' axis should divide
    num_heads (16 in the live configs) so attention TP stays head-aligned,
    and map to physically-adjacent chips (axis order puts 'model' innermost,
    which matches ICI nearest-neighbor layout on TPU slices).  'seq'
    (sequence/context parallelism — parallel/ring.py) sits just outside
    'model': its ring ppermutes fire once per attention layer, less often
    than TP's per-GEMM psums but far more often than 'pipe' stage crossings,
    which stay outermost.  'expert' (parallel/moe.py) sits between 'data'
    and 'seq': its all_to_all pair fires once per MoE layer, the same
    cadence class as 'seq'.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    total_non_data = model * pipe * seq * expert
    if data == -1:
        if n % total_non_data:
            raise ValueError(f"{n} devices not divisible by "
                             f"model={model} * pipe={pipe} * seq={seq} * "
                             f"expert={expert}")
        data = n // total_non_data
    if data * total_non_data > n:
        raise ValueError(f"mesh {pipe}x{data}x{expert}x{seq}x{model} needs "
                         f"{data * total_non_data} devices, have {n}")
    # sub-meshes are allowed: take a contiguous prefix (adjacent chips)
    devices = devices.ravel()[:data * total_non_data]
    shape = [pipe, data, expert, seq, model]
    names = ["pipe", "data", "expert", "seq", "model"]
    keep = [i for i, (s, nm) in enumerate(zip(shape, names))
            if s > 1 or nm in ("data", "model")]
    return Mesh(devices.reshape([shape[i] for i in keep]),
                tuple(names[i] for i in keep))


def multihost_init(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (v5e pods / multi-slice).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly elsewhere.  Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
