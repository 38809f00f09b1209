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


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes.

    data=-1 means "all remaining devices".  The 'model' axis should divide
    num_heads (16 in the live configs) so attention TP stays head-aligned,
    and map to physically-adjacent chips (axis order puts 'model' innermost,
    which matches ICI nearest-neighbor layout on TPU slices).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    # sub-meshes are allowed: take a contiguous prefix (adjacent chips)
    devices = devices.ravel()[:data * model]
    return Mesh(devices.reshape(data, model), ("data", "model"))


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
