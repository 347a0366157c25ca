"""Global numeric configuration for sloika_tpu.

The reference pins everything to Theano's floatX=float32
(/root/reference/sloika/config.py:1-3).  On TPU we keep float32 as the
parameter/IO dtype for parity with the reference, and expose a compute-dtype
knob so matmul-heavy paths can run in bfloat16 on the MXU when parity is not
required.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

#: dtype used for parameters, inputs and outputs (reference parity dtype)
sloika_dtype = np.float32

#: jnp view of the same dtype
jax_dtype = jnp.float32

#: compute dtype for matmuls inside the hot path.  float32 by default for
#: parity; set SLOIKA_TPU_COMPUTE_DTYPE=bfloat16 for maximum MXU throughput.
compute_dtype = jnp.bfloat16 if os.environ.get(
    "SLOIKA_TPU_COMPUTE_DTYPE", "float32") == "bfloat16" else jnp.float32


def set_matmul_precision(precision: str = "highest") -> None:
    """Set default matmul precision for f32 matmuls on TPU.

    'highest' = full f32 (6-pass bf16), 'high' = 3-pass, 'default' = bf16.
    """
    jax.config.update("jax_default_matmul_precision", precision)
