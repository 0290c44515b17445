"""In-model sharding hints.

``shard_hint(x, *axes)`` applies ``jax.lax.with_sharding_constraint`` with a
named PartitionSpec when tracing happens under a mesh whose axis names cover
the spec, and is a no-op otherwise — so model code carries its parallel
layout declaratively and still runs un-meshed (single chip, tests).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def _active_axis_names() -> tuple:
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:
        return ()
    if mesh is None or getattr(mesh, "empty", True):
        return ()
    return tuple(mesh.axis_names)


def shard_hint(x, *axes):
    """axes: one entry per leading dim of x ('data', 'k', or None); trailing
    dims are unconstrained."""
    names = _active_axis_names()
    used = {a for a in axes if a is not None}
    if not names or not used.issubset(set(names)):
        return x
    spec = P(*axes)
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:
        return x
