"""Raw model: tanh convolution + three alternating-direction GRUs.

Architecture spec of /root/reference/models/raw_1.00_rGr.py (sizes
128/110/142/110); matches the layer graph of models/pretrained.pkl.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=1, winlen=11,
            stride=2):
    n, k, l, m = 128, 110, 142, 110
    init = smt.truncated_normal(sd)

    return smt.Serial([
        smt.Convolution(nfeature, n, winlen, stride, init=init,
                        has_bias=True, fun=smt.tanh),
        smt.Reverse(smt.Gru(n, k, init=init, has_bias=True, fun=smt.tanh)),
        smt.Gru(k, l, init=init, has_bias=True, fun=smt.tanh),
        smt.Reverse(smt.Gru(l, m, init=init, has_bias=True, fun=smt.tanh)),
        smt.Softmax(m, smt.nstate(klen, nbase=nbase), init=init,
                    has_bias=True),
    ])
