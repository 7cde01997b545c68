"""Device-mesh construction for multi-chip rendering.

The renderer's two parallel axes (SURVEY.md §2.6):
- `dp` — pixel/data parallelism: the packet axis is sharded; rays are
  embarrassingly parallel, no collective needed beyond output assembly;
- `sp` — sample parallelism (the renderer's "sequence length" axis): spp is
  split across chips and sample accumulators are reduced with a `psum`
  riding ICI.

Tensor/pipeline/expert parallelism have no analogue in a ray tracer (the
scene is replicated — the ISS mesh is ~MBs against ~16 GB HBM); SURVEY.md
§2.6 documents this deliberately rather than inventing axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('sp', 'dp'); sp divides the device count."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % sp != 0:
        raise ValueError(f"sp={sp} must divide device count {n}")
    dp = n // sp
    return Mesh(np.asarray(devices).reshape(sp, dp), ("sp", "dp"))


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Default topology: sp=2 when the device count is even and > 1
    (halves per-chip sample load), else pure dp."""
    n = n_devices if n_devices is not None else len(jax.devices())
    sp = 2 if (n > 1 and n % 2 == 0) else 1
    return make_mesh(n_devices, sp=sp)
