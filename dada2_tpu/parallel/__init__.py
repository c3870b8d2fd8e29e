"""Multi-chip distribution: meshes, sharded compare, collectives.

`use_mesh(mesh)` makes every subsequently-created compare backend shard
its block grid over the mesh's "pairs" axis (see core/backend_tpu.py);
`dist` holds the shard_map'd compare-and-tally step and the multichip
dry run.
"""
from __future__ import annotations

from typing import Optional

_MESH = None


def use_mesh(mesh) -> None:
    """Set the process-wide device mesh for compare sweeps. The mesh must
    have a "pairs" axis; pass None to return to single-device."""
    global _MESH
    if mesh is not None and "pairs" not in getattr(mesh, "shape", {}):
        raise ValueError('mesh must have a "pairs" axis')
    _MESH = mesh


def get_mesh():
    return _MESH


from .dist import (build_compare_and_tally, cpu_devices,  # noqa: E402
                   dryrun_multichip, make_mesh, trans_tally)
