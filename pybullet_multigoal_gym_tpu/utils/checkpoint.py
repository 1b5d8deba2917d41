"""Checkpoint / resume for vectorised env state.

The reference has no serialization at all — env state lives inside the
Bullet C++ world (SURVEY.md §5). Here the entire `EnvState` (physics,
PRNG keys, goals, curriculum counters) is a pytree, so checkpointing is a
structural save/restore; deterministic resume falls out for free.

Leaves are stored under their pytree *paths* (e.g. ``.phys.q``), so
checkpoints stay loadable across schema evolution: a field added to
`EnvState` after a checkpoint was written restores from the template, and a
removed field is skipped — each with a warning instead of a hard failure.
Legacy index-keyed checkpoints (the pre-path format) still load when the
leaf count matches.
"""

import json
import os
import re
import warnings

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _path_names(tree):
    """Stable, npz-safe name per leaf (pytree path, sanitized)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    names = []
    for path, _leaf in flat:
        s = jax.tree_util.keystr(path)
        names.append(re.sub(r'[^A-Za-z0-9_.]', '_', s) or 'root')
    return names


def save(path: str, state) -> None:
    """Save an env-state pytree (or any pytree of arrays) to ``path``.

    Writes ``<path>.npz`` (leaves keyed by pytree path) + ``<path>.json``
    (tree structure summary)."""
    leaves, treedef = _flatten(state)
    names = _path_names(state)
    assert len(set(names)) == len(names), 'pytree paths not unique'
    os.makedirs(os.path.dirname(os.path.abspath(path)) or '.', exist_ok=True)
    np.savez(path + '.npz', **{k: np.asarray(l)
                               for k, l in zip(names, leaves)})
    with open(path + '.json', 'w') as f:
        json.dump({'treedef': str(treedef), 'n_leaves': len(leaves),
                   'leaf_paths': names}, f)


def restore(path: str, like):
    """Restore a pytree saved by :func:`save`. ``like``: a pytree with the
    target structure (e.g. a freshly reset state) used as the template.

    Leaves are matched by pytree path; paths present only in the template
    keep the template's value (schema grew), paths present only in the file
    are ignored (schema shrank) — both warn."""
    leaves, treedef = _flatten(like)
    names = _path_names(like)
    with np.load(path + '.npz') as data:
        files = set(data.files)
        if files == {str(i) for i in range(len(files))}:
            # legacy index-keyed checkpoint: positional restore
            assert len(files) == len(leaves), \
                'legacy checkpoint has %d leaves, template has %d' \
                % (len(files), len(leaves))
            new_leaves = [jax.numpy.asarray(data[str(i)])
                          for i in range(len(leaves))]
        else:
            new_leaves = []
            for name, tmpl in zip(names, leaves):
                if name in files:
                    new_leaves.append(jax.numpy.asarray(data[name]))
                else:
                    warnings.warn('checkpoint %s: missing leaf %s; keeping '
                                  'template value' % (path, name))
                    new_leaves.append(tmpl)
            extra = files - set(names)
            if extra:
                warnings.warn('checkpoint %s: ignoring unknown leaves %s'
                              % (path, sorted(extra)))
    for a, b, name in zip(new_leaves, leaves, names):
        assert a.shape == b.shape, (name, a.shape, b.shape)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
