"""Standard event-domain Nanonet with GRU units.

Architecture spec of /root/reference/models/baseline_gru.py: Window ->
biGRU -> FF -> biGRU -> FF -> Softmax.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=4, winlen=3,
            stride=1, size=64):
    assert stride == 1, "Model only supports stride of 1"
    init = smt.truncated_normal(sd)
    nstate = smt.nstate(klen, nbase=nbase)
    insize = nfeature * winlen

    return smt.Serial([
        smt.Window(nfeature, winlen),
        smt.birnn(smt.Gru(insize, size, init=init, has_bias=True),
                  smt.Gru(insize, size, init=init, has_bias=True)),
        smt.FeedForward(2 * size, size, has_bias=True),
        smt.birnn(smt.Gru(size, size, init=init, has_bias=True),
                  smt.Gru(size, size, init=init, has_bias=True)),
        smt.FeedForward(2 * size, size, init=init, has_bias=True),
        smt.Softmax(size, nstate, init=init, has_bias=True),
    ])
