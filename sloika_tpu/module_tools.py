"""Namespace for user model-definition files.

The reference exposes a star-import DSL consumed by ``models/*.py``
(/root/reference/sloika/module_tools.py:1-13).  Model files written against
this module construct layer *configurations*; parameters are created
separately with ``layer.init(rng)``.

``truncated_normal`` here is a factory: the reference's
``partial(truncated_normal, sd=sd)`` idiom maps to ``truncated_normal(sd=sd)``
which returns an ``init(key, shape)`` callable.
"""
from functools import partial  # noqa: F401  (kept for model-file compatibility)

from sloika_tpu.config import sloika_dtype  # noqa: F401
from sloika_tpu.activations import *  # noqa: F401,F403
from sloika_tpu.nn import *  # noqa: F401,F403
from sloika_tpu.nn.core import truncated_normal  # noqa: F401
from sloika_tpu.variables import (DEFAULT_ALPHABET, DEFAULT_NBASE,  # noqa: F401
                                  nkmer, nstate)
