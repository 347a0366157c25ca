"""Standard event-domain Nanonet with peephole LSTM units.

Architecture spec of /root/reference/models/baseline_lstm.py.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=4, winlen=3,
            stride=1, size=64):
    assert stride == 1, "Model only supports stride of 1"
    init = smt.truncated_normal(sd)
    nstate = smt.nstate(klen, nbase=nbase)
    insize = nfeature * winlen

    def lstm(i, s):
        return smt.Lstm(i, s, init=init, has_bias=True, has_peep=True)

    return smt.Serial([
        smt.Window(nfeature, winlen),
        smt.birnn(lstm(insize, size), lstm(insize, size)),
        smt.FeedForward(2 * size, size, has_bias=True),
        smt.birnn(lstm(size, size), lstm(size, size)),
        smt.FeedForward(2 * size, size, init=init, has_bias=True),
        smt.Softmax(size, nstate, init=init, has_bias=True),
    ])
