"""Checkpoint / resume of level-set evolutions.

The reference has no checkpointing (SURVEY.md section 5): its resumable unit is
``(current_state, current_time)`` and ``integrate!`` is incremental. Here that
unit is an explicit, durable artifact: ``save_checkpoint`` writes the state
pytree (phi values, band mask, time, term coefficient arrays) as a compressed
``.npz`` plus a JSON manifest of the static structure (grid, BCs, band depth),
and ``load_checkpoint`` reconstructs the field so ``integrate`` continues
exactly where it left off — across processes, hosts, and device counts
(arrays are pulled to host, so resharding on load is free).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.bc import Extrapolation, Periodic, Symmetry, normalize_bcs
from ..core.field import MeshField
from ..core.grid import Grid
from ..core.narrowband import NarrowBandField

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 1


def _bc_to_json(bcs) -> Optional[list]:
    if bcs is None:
        return None
    out = []
    for left, right in bcs:
        pair = []
        for b in (left, right):
            if isinstance(b, Periodic):
                pair.append({"kind": "periodic"})
            elif isinstance(b, Extrapolation):
                pair.append({"kind": "extrapolation", "degree": b.degree})
            elif isinstance(b, Symmetry):
                pair.append({"kind": "symmetry"})
            else:
                raise TypeError(f"cannot serialize boundary condition {b!r}")
        out.append(pair)
    return out


def _bc_from_json(data):
    if data is None:
        return None
    kinds = {"periodic": lambda d: Periodic(),
             "extrapolation": lambda d: Extrapolation(d["degree"]),
             "symmetry": lambda d: Symmetry()}
    return tuple(
        (kinds[l["kind"]](l), kinds[r["kind"]](r)) for l, r in data
    )


def save_checkpoint(
    path,
    phi: MeshField,
    t: float = 0.0,
    extra_arrays: Optional[Dict[str, Any]] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> Path:
    """Write the resumable state to ``path`` (``.npz``).

    ``extra_arrays`` may carry term coefficient fields (velocities, speeds);
    ``metadata`` any JSON-serializable run info (step counts, config).
    """
    path = Path(path)
    manifest = {
        "format": _FORMAT_VERSION,
        "t": float(t),
        "grid": {"lo": phi.grid.lo, "hi": phi.grid.hi, "shape": phi.grid.shape},
        "bcs": _bc_to_json(phi.bcs),
        "kind": "narrowband" if isinstance(phi, NarrowBandField) else "dense",
        "nlayers": getattr(phi, "nlayers", None),
        "metadata": metadata or {},
    }
    arrays = {"values": np.asarray(phi.values)}
    if isinstance(phi, NarrowBandField):
        arrays["mask"] = np.asarray(phi.mask)
    for name, arr in (extra_arrays or {}).items():
        arrays[f"extra.{name}"] = np.asarray(arr)
    np.savez_compressed(path, manifest=json.dumps(manifest), **arrays)
    return path


def load_checkpoint(path) -> Tuple[MeshField, float, Dict[str, np.ndarray], Dict]:
    """Load ``(phi, t, extra_arrays, metadata)`` saved by :func:`save_checkpoint`."""
    with np.load(Path(path), allow_pickle=False) as data:
        manifest = json.loads(str(data["manifest"]))
        if manifest["format"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint format {manifest['format']}")
        g = manifest["grid"]
        grid = Grid(g["lo"], g["hi"], g["shape"])
        bcs = _bc_from_json(manifest["bcs"])
        values = jnp.asarray(data["values"])
        if manifest["kind"] == "narrowband":
            phi = NarrowBandField(
                values, grid, bcs, jnp.asarray(data["mask"]),
                manifest["nlayers"], _normalized=True,
            )
        else:
            phi = MeshField(values, grid, bcs, _normalized=True)
        extra = {
            k[len("extra."):]: np.asarray(v)
            for k, v in data.items()
            if k.startswith("extra.")
        }
    return phi, manifest["t"], extra, manifest["metadata"]
