"""On-chip kernel test lane — runs the Pallas kernels on the REAL TPU.

The main suite (tests/) forces the CPU backend and exercises the kernels in
interpret mode only; Mosaic-compiled behavior can diverge (round 2's
silently-truncating non-dividing `_BLOCK_KV` was caught by a checksum, not a
test — commit 2a19d19).  This lane re-runs kernel parity against the XLA
reference formulations on the actual chip.

Run with: `python -m pytest tests_tpu/ -q`   (one TPU job at a time — do not
overlap with a bench or training drive; see CLAUDE.md).

Tests self-skip when no TPU backend is present.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cross_attention_vit_tpu.utils import enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_jit_cache"))

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("on-chip lane requires a real TPU backend")
