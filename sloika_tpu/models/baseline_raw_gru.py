"""Raw-signal Nanonet: strided convolution front end + GRU stack.

Architecture spec of /root/reference/models/baseline_raw_gru.py.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=1, winlen=11,
            stride=2, size=64):
    init = smt.truncated_normal(sd)
    nstate = smt.nstate(klen, nbase=nbase)

    return smt.Serial([
        smt.Convolution(nfeature, size, winlen, stride, init=init,
                        has_bias=True, fun=smt.tanh),
        smt.birnn(smt.Gru(size, size, init=init, has_bias=True),
                  smt.Gru(size, size, init=init, has_bias=True)),
        smt.FeedForward(2 * size, size, has_bias=True),
        smt.birnn(smt.Gru(size, size, init=init, has_bias=True),
                  smt.Gru(size, size, init=init, has_bias=True)),
        smt.FeedForward(2 * size, size, init=init, has_bias=True),
        smt.Softmax(size, nstate, init=init, has_bias=True),
    ])
