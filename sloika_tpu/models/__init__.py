"""Model zoo: named architecture factories + loading of user model files.

The reference loads user models via ``imp.load_source`` and aliases like
``raw_0.98_rgrgr`` (/root/reference/bin/train_network.py:266-270,
models/*.py).  Here a model is resolved by:

1. a registered name from :data:`REGISTRY` (dots/dashes normalised), or
2. a path to a ``.py`` file exposing ``network(...)``, or
3. a path to a ``.json`` model dump (structure + params).
"""
import importlib
import importlib.util
import os

REGISTRY = {
    "tiny_gru": "sloika_tpu.models.tiny_gru",
    "baseline_gru": "sloika_tpu.models.baseline_gru",
    "baseline_lstm": "sloika_tpu.models.baseline_lstm",
    "baseline_raw_gru": "sloika_tpu.models.baseline_raw_gru",
    "bigger_raw_gru": "sloika_tpu.models.bigger_raw_gru",
    "raw_0.98_rgrgr": "sloika_tpu.models.raw_0_98_rgrgr",
    "raw_0_98_rgrgr": "sloika_tpu.models.raw_0_98_rgrgr",
    "raw_1.00_rGr": "sloika_tpu.models.raw_1_00_rGr",
    "raw_1_00_rGr": "sloika_tpu.models.raw_1_00_rGr",
}


def network_factory(model):
    """Resolve a model name or ``.py`` path to its ``network`` factory."""
    if model in REGISTRY:
        return importlib.import_module(REGISTRY[model]).network
    if os.path.exists(model) and model.endswith(".py"):
        spec = importlib.util.spec_from_file_location("netmodule", model)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.network
    raise ValueError("Unknown model {!r}; known: {}".format(
        model, sorted(set(REGISTRY))))


def build(model, klen, sd, nbase=4, nfeature=1, winlen=11, stride=1):
    """Construct a layer configuration for a named model."""
    return network_factory(model)(klen=klen, sd=sd, nbase=nbase,
                                  nfeature=nfeature, winlen=winlen,
                                  stride=stride)
