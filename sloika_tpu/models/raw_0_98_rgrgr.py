"""Raw model: elu convolution (stride 5) + five alternating-direction GRUs.

Architecture spec of /root/reference/models/raw_0.98_rgrgr.py — the flagship
raw basecalling architecture.
"""
import sloika_tpu.module_tools as smt


def network(klen, sd, nbase=smt.DEFAULT_NBASE, nfeature=1, winlen=11,
            stride=5):
    n = 96
    init = smt.truncated_normal(sd)

    def gru():
        return smt.Gru(n, n, init=init, has_bias=True, fun=smt.tanh)

    return smt.Serial([
        smt.Convolution(nfeature, n, winlen, stride, init=init,
                        has_bias=True, fun=smt.elu),
        smt.Reverse(gru()),
        gru(),
        smt.Reverse(gru()),
        gru(),
        smt.Reverse(gru()),
        smt.Softmax(n, smt.nstate(klen, nbase=nbase), init=init,
                    has_bias=True),
    ])
