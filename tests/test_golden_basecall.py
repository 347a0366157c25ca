"""Golden-basecall regression: the batched device exact-mode pipeline must
reproduce the committed oracle calls verbatim.

The fixture (tests/data/golden_calls.npz, regenerate with
scripts/make_golden_calls.py) holds per-read call-state sequences produced
by the *numpy* Viterbi oracle on per-read unpadded forwards of the imported
reference ``pretrained.pkl`` — the reference's golden-value pattern
(/root/reference/test/unit/test_decode.py:201-241) scaled to whole reads
(BASELINE.md anchor 1).  Any change to the forward pass, posterior flooring,
Viterbi, or traceback that alters a single call on any bundled read fails
here.
"""
import os

import numpy as np
import pytest

from sloika_tpu import basecall as bc
from sloika_tpu import bio

FIXTURE = os.path.join(os.path.dirname(__file__), "data", "golden_calls.npz")
PRETRAINED = "/root/reference/models/pretrained.pkl"


@pytest.mark.slow
def test_exact_mode_matches_golden_calls(reference_reads):
    from sloika_tpu.compat import theano_pickle

    golden = np.load(FIXTURE)
    layer, params = theano_pickle.load_model(PRETRAINED)
    caller = bc.Basecaller(layer, params, 5, batch_size=8)

    names, sigs = [], []
    for fn in reference_reads:
        name, sig = bc.load_raw_signal(fn)
        names.append(name)
        sigs.append(sig)
    assert len(sigs) == 8

    out = caller.basecall_signals(sigs)
    kmers = bio.all_kmers(5)
    for name, (score, call) in zip(names, out):
        want = golden["call_" + name]
        np.testing.assert_array_equal(
            np.asarray(call, dtype=np.int64), want.astype(np.int64),
            err_msg="exact-mode calls changed for {}".format(name))
        assert score == pytest.approx(float(golden["score_" + name]),
                                      rel=1e-4)
        seq = bio.kmers_to_sequence([kmers[i] for i in call],
                                    always_move=True)
        if isinstance(seq, str):
            seq = seq.encode()
        assert seq == bytes(golden["seq_" + name])
