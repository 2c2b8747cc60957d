"""Bit-exact checkpoint/restore of the model state pytree.

Functional replacement for the reference's Checkpointer + prognostic_state
machinery (`src/sea_ice_model.jl:414-445`, `test/test_checkpointing.jl`): the
state is already one pytree, so a checkpoint is just its leaves (+ treedef
path keys) in an ``.npz``; restore must reproduce bit-identical trajectories.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path, state):
    """Write every array leaf of ``state`` to ``path`` (.npz), keyed by its
    pytree path."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in leaves}
    np.savez(path, **arrays)
    return path


def load_checkpoint(path):
    """Load a checkpoint into a {path: ndarray} dict."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


class Checkpointer:
    """Scheduled checkpoint writer + pickup source (Oceananigans
    `Checkpointer` analog; `test/test_checkpointing.jl:29-127`).

    Writes ``<prefix>_iteration<N>.npz`` on schedule; ``latest()`` returns the
    most recent file for ``Simulation.run(pickup=True)``.
    """

    def __init__(self, prefix, schedule):
        self.prefix = prefix
        self.schedule = schedule

    def maybe_write(self, sim):
        if self.schedule(sim):
            save_checkpoint(f"{self.prefix}_iteration{sim.iteration}.npz", sim.state)

    def latest(self):
        import glob
        import re
        files = glob.glob(f"{self.prefix}_iteration*.npz")
        if not files:
            return None
        return max(files, key=lambda f: int(re.search(r"iteration(\d+)", f).group(1)))


def restore_state(template_state, checkpoint):
    """Restore a state pytree from a checkpoint dict, using ``template_state``
    for the tree structure.  Bit-exact: leaves are taken verbatim."""
    if isinstance(checkpoint, str):
        checkpoint = load_checkpoint(checkpoint)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    new_leaves = []
    for p, old in paths:
        key = _path_str(p)
        if key in checkpoint:
            new_leaves.append(jnp.asarray(checkpoint[key]))
        else:
            new_leaves.append(old)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
