"""Larger raw-signal Nanonet with per-stage sizes.

Architecture spec of /root/reference/models/bigger_raw_gru.py.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=1, winlen=11,
            stride=2, size=(32, 96, 128)):
    init = smt.truncated_normal(sd)
    nstate = smt.nstate(klen, nbase=nbase)
    s0, s1, s2 = size

    return smt.Serial([
        smt.Convolution(nfeature, s0, winlen, stride, init=init,
                        has_bias=True, fun=smt.tanh),
        smt.birnn(smt.Gru(s0, s1, init=init, has_bias=True),
                  smt.Gru(s0, s1, init=init, has_bias=True)),
        smt.FeedForward(2 * s1, s2, has_bias=True),
        smt.birnn(smt.Gru(s2, s1, init=init, has_bias=True),
                  smt.Gru(s2, s1, init=init, has_bias=True)),
        smt.FeedForward(2 * s1, s2, init=init, has_bias=True),
        smt.Softmax(s2, nstate, init=init, has_bias=True),
    ])
