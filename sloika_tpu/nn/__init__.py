"""TPU-native neural network layer library (functional, pytree-parameterised)."""
from sloika_tpu.nn.core import (Layer, from_json, zeros_init, truncated_normal,
                                affine, register)
from sloika_tpu.nn.layers import (Identity, FeedForward, Softmax, SoftmaxTheano,
                                  Studentise, NormaliseL1, Window, Convolution,
                                  MaxPool)
from sloika_tpu.nn.rnn import (RNNBase, Recurrent, Gru, Lstm, LstmCIFG, LstmO,
                               Forget, Scrn, Mut1, Mut2, Mut3, Genmut)
from sloika_tpu.nn.combinators import Serial, Parallel, Reverse, Residual, birnn
from sloika_tpu.nn.decode_layer import Decode

__all__ = [
    "Layer", "from_json", "zeros_init", "truncated_normal", "affine", "register",
    "Identity", "FeedForward", "Softmax", "SoftmaxTheano", "Studentise",
    "NormaliseL1", "Window", "Convolution", "MaxPool",
    "RNNBase", "Recurrent", "Gru", "Lstm", "LstmCIFG", "LstmO", "Forget",
    "Scrn", "Mut1", "Mut2", "Mut3", "Genmut",
    "Serial", "Parallel", "Reverse", "Residual", "birnn", "Decode",
]
