"""sloika_tpu — a TPU-native nanopore basecaller training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ONT's sloika
(see SURVEY.md): raw-signal/event chunking and labelling, transducer RNN
training, Viterbi decoding into DNA sequence, signal remapping against
references, and alignment-based evaluation — expressed as pure-functional
pytree models, `lax.scan` recurrences, Pallas DP kernels and pjit-sharded
training/basecalling that scale over a TPU device mesh.
"""

__version__ = "0.1.0"
