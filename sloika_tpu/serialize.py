"""Model and checkpoint (de)serialisation.

Two formats:

* **Model JSON** — the reference's interchange format
  (/root/reference/bin/dump_json.py, per-layer ``json()`` methods): a nested
  layer description with optional parameter lists.  ``save_model_json`` /
  ``load_model_json`` round-trip it exactly and can read dumps of reference
  models.
* **Checkpoint** — a ``.npz`` of the flattened parameter pytree (and
  optionally ADAMski optimiser state — fixing the reference's
  lost-optimiser-state-on-resume flaw, updates.py:71-81) plus the model JSON
  structure alongside, so a checkpoint is self-describing.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from sloika_tpu import optim
from sloika_tpu.nn import core as nn_core


# ---------------------------------------------------------------------------
# pytree <-> flat dict-of-arrays
# ---------------------------------------------------------------------------

def flatten_tree(tree):
    """Flatten a pytree to {path: ndarray} with '/'-joined key paths."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_element(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_element(p):
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def unflatten_like(template, flat):
    """Rebuild a pytree shaped like ``template`` from a flat {path: array}."""
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        key = "/".join(_path_element(p) for p in path)
        arr = flat[key]
        assert arr.shape == tuple(np.shape(leaf)), \
            "shape mismatch at {}: {} vs {}".format(key, arr.shape, np.shape(leaf))
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


# ---------------------------------------------------------------------------
# Model JSON
# ---------------------------------------------------------------------------

def save_model_json(path, layer, params=None, indent=None):
    with open(path, "w") as fh:
        json.dump(layer.to_json(params), fh, indent=indent)


def load_model_json(path_or_obj):
    """Load (layer, params) from a JSON file path, file object or dict."""
    if isinstance(path_or_obj, dict):
        obj = path_or_obj
    elif hasattr(path_or_obj, "read"):
        obj = json.load(path_or_obj)
    else:
        with open(path_or_obj) as fh:
            obj = json.load(fh)
    return nn_core.from_json(obj)


# ---------------------------------------------------------------------------
# Checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path, layer, params, opt_state=None, meta=None):
    """Write a self-describing checkpoint.

    :param path: output ``.npz`` path (model JSON goes to ``path + '.json'``)
    :param opt_state: optional :class:`sloika_tpu.optim.OptState`
    :param meta: optional JSON-compatible dict stored alongside
    """
    # np.savez appends '.npz' to suffix-less paths, which load_checkpoint
    # would then never find — normalise so save/load stay symmetric
    assert path.endswith(".npz"), "checkpoint path must end in .npz"
    flat = {"params/" + k: v for k, v in flatten_tree(params).items()}
    if isinstance(opt_state, optim.SGDState):
        flat.update({"opt/vel/" + k: v
                     for k, v in flatten_tree(opt_state.vel).items()})
    elif opt_state is not None:
        flat["opt/count"] = np.asarray(opt_state.count)
        flat.update({"opt/mu/" + k: v
                     for k, v in flatten_tree(opt_state.mu).items()})
        flat.update({"opt/nu/" + k: v
                     for k, v in flatten_tree(opt_state.nu).items()})
    np.savez(path, **flat)
    struct = {"model": layer.to_json(None), "meta": meta or {}}
    with open(path + ".json", "w") as fh:
        json.dump(struct, fh)


def load_checkpoint(path, layer=None):
    """Load (layer, params, opt_state_or_None) from a checkpoint.

    :param layer: reuse an existing layer configuration; None rebuilds it
        from the stored model JSON.
    """
    with open(path + ".json") as fh:
        struct = json.load(fh)
    if layer is None:
        layer, _ = nn_core.from_json(struct["model"])
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    template = layer.init(jax.random.PRNGKey(0))
    params = unflatten_like(
        template, {k[len("params/"):]: v for k, v in flat.items()
                   if k.startswith("params/")})
    opt_state = None
    if any(k.startswith("opt/vel/") for k in flat):
        vel = unflatten_like(template, {k[len("opt/vel/"):]: v
                                        for k, v in flat.items()
                                        if k.startswith("opt/vel/")})
        opt_state = optim.SGDState(vel=vel)
    elif "opt/count" in flat:
        mu = unflatten_like(template, {k[len("opt/mu/"):]: v
                                       for k, v in flat.items()
                                       if k.startswith("opt/mu/")})
        nu = unflatten_like(template, {k[len("opt/nu/"):]: v
                                       for k, v in flat.items()
                                       if k.startswith("opt/nu/")})
        opt_state = optim.OptState(count=jnp.asarray(flat["opt/count"]),
                                   mu=mu, nu=nu)
    return layer, params, opt_state
