"""Headline-claim consistency (VERDICT r4 weak #1/#2, next-round #8).

Every number in README.md's headline table must be backed by a
driver-captured artifact: the quoted values must match the BENCH round they
cite exactly, and must not drift materially from the LATEST capture present
in the repo — so a better in-round run, or a stale claim surviving a
regression, fails the suite instead of shipping.
"""
import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: END-TO-END numbers ride the tunnel: captured bests span 1.82M (r3) to
#: 1.10M (an in-round r5 check in poor weather) for the SAME program — a
#: 1.66x spread that is pure transport (h2d bandwidth varies ~3x,
#: docs/PERF.md).  A stale/overstated CLAIM is what this file guards
#: against, so tunnel-exposed rows get a one-sided factor-2 envelope in
#: each direction, while the DEVICE-side rate (weather-insensitive:
#: 56.55M/56.47M/56.43M samples/s across r3/r4/today, a 0.2% spread) is
#: held to a tight band — a real program regression fails loudly.
WEATHER_FACTOR = 2.0
DEVICE_RTOL = 0.10


def _latest_bench():
    """Newest SUCCESSFUL driver capture (a failed capture — tunnel outage
    during the driver's run — is an environment fact, not a claim, and
    must not redden the claims suite)."""
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no driver-captured bench artifacts"
    for p in reversed(paths):
        with open(p) as f:
            data = json.load(f)
        if data.get("rc") == 0 and "parsed" in data:
            return p, data["parsed"]
    raise AssertionError("no successful bench capture among: %s" % paths)


def _bench_for_round(n):
    path = os.path.join(REPO, "BENCH_r{:02d}.json".format(n))
    with open(path) as f:
        return json.load(f)["parsed"]


def _readme():
    with open(os.path.join(REPO, "README.md")) as f:
        return f.read()


def _headline_row(readme, label):
    for line in readme.splitlines():
        if line.startswith("|") and label in line.split("|")[1]:
            return line
    raise AssertionError("README headline table has no row: " + label)


def _numbers(text):
    """All numbers in a table cell, commas stripped ('1,752,542' -> 1752542)."""
    return [float(t.replace(",", ""))
            for t in re.findall(r"\d[\d,]*\.?\d*", text.replace("~", ""))]


def test_basecall_row_matches_cited_and_latest_capture():
    readme = _readme()
    row = _headline_row(readme, "Basecalling")
    cite = re.search(r"\(r(\d+) capture", row)
    assert cite, "basecall row must cite the capture round it quotes"
    cited = _bench_for_round(int(cite.group(1)))
    nums = _numbers(row.split("|")[2])
    # quoted best/mean must be the cited round's captured values, verbatim
    assert any(abs(n - cited["value"]) < 1 for n in nums), \
        "quoted best does not match the cited capture"
    assert any(abs(n - cited["mean_bases_per_sec"]) < 1 for n in nums), \
        "quoted mean does not match the cited capture"
    # and the cited round must not be stale vs the newest capture.
    # Two checks: the weather-insensitive device rate must agree tightly
    # (catches a real fused-program regression or unquoted improvement);
    # the tunnel-exposed end-to-end number only has to stay inside the
    # observed cross-day weather envelope in either direction.
    path, latest = _latest_bench()
    if "device_samples_per_sec" in cited and \
            "device_samples_per_sec" in latest:
        assert abs(cited["device_samples_per_sec"]
                   - latest["device_samples_per_sec"]) \
            <= DEVICE_RTOL * latest["device_samples_per_sec"], \
            "device rate drifted vs {} — the fused program changed; " \
            "update the README table".format(os.path.basename(path))
    assert cited["value"] <= WEATHER_FACTOR * latest["value"], \
        "README cites r{} but {} is far lower even for tunnel weather " \
        "— overstated claim".format(int(cite.group(1)),
                                    os.path.basename(path))
    assert latest["value"] <= WEATHER_FACTOR * cited["value"], \
        "latest capture {} far exceeds the quoted number — stale " \
        "understatement; update the table".format(os.path.basename(path))


def test_training_row_tracks_latest_capture():
    row = _headline_row(_readme(), "Training (")
    quoted = _numbers(row.split("|")[2])[0]
    _, latest = _latest_bench()
    assert abs(quoted - latest["training_chunks_per_sec"]) \
        <= 0.15 * latest["training_chunks_per_sec"]


def test_remap_row_tracks_latest_capture():
    # remap is tunnel-exposed too (DAC h2d + path pulls): weather envelope
    row = _headline_row(_readme(), "remapping")
    quoted = _numbers(row.split("|")[2])[0] * 1e6   # "~5.2M"
    _, latest = _latest_bench()
    assert quoted <= WEATHER_FACTOR * latest["remap_samples_per_sec"]
    assert latest["remap_samples_per_sec"] <= WEATHER_FACTOR * quoted


def test_accuracy_row_brackets_latest_per_read_accuracies():
    row = _headline_row(_readme(), "accuracy vs in-file")
    lo, hi = sorted(_numbers(row.split("|")[2]))[:2]
    _, latest = _latest_bench()
    accs = [100 * v for v in latest["accuracy_per_read"].values()]
    assert lo - 1.0 <= min(accs) and max(accs) <= hi + 1.0, \
        "per-read accuracy range in README no longer brackets the capture"


def test_speedup_row_tracks_latest_capture():
    # derived from the end-to-end headline -> same weather envelope
    row = _headline_row(_readme(), "CPU reference")
    lo, hi = sorted(_numbers(row.split("|")[2])[-2:])
    _, latest = _latest_bench()
    assert lo <= WEATHER_FACTOR * latest["vs_baseline"]
    assert latest["vs_baseline"] <= WEATHER_FACTOR * hi


def test_synth_scale_claims_match_artifact():
    """The trainer-at-reference-scale row (README + training-quality doc)
    must equal the committed synthetic-run and oracle artifacts."""
    tq = os.path.join(REPO, "docs", "training_quality")
    with open(os.path.join(tq, "r5_synth_summary.json")) as f:
        summary = json.load(f)
    with open(os.path.join(tq, "r5_oracle.json")) as f:
        oracle = json.load(f)
    acc = summary["test_best"]["mean_accuracy"]
    assert summary["test_best"]["scored"] == summary["n_test_reads"], \
        "every synthetic test read must score"
    row = _headline_row(_readme(), "reference scale")
    nums = _numbers(row.split("|")[2])
    assert acc in nums, "README synth row must quote the artifact accuracy"
    assert oracle["oracle_mean_accuracy"] in nums, \
        "README synth row must quote the committed oracle ceiling"
    with open(os.path.join(tq, "README.md")) as f:
        doc = f.read()
    assert ("%.4f" % acc) in doc and \
        ("%.4f" % oracle["oracle_mean_accuracy"]) in doc


def test_training_quality_claims_match_artifact():
    """The fine-tuning numbers quoted in docs/training_quality/README.md's
    round-5 section must equal the committed cv_summary artifact."""
    art = os.path.join(REPO, "docs", "training_quality",
                       "r5_cv_summary.json")
    doc = os.path.join(REPO, "docs", "training_quality", "README.md")
    if not os.path.exists(art):
        pytest.skip("round-5 CV artifact not yet committed")
    with open(art) as f:
        summary = json.load(f)
    with open(doc) as f:
        text = f.read()
    assert "RETRACTED" in text, \
        "the circular round-4 headline must stay retracted"
    for fold in summary["folds"]:
        token = "{:+.4f}".format(fold["delta_mean"])
        assert token in text, \
            "fold {} mean delta {} not quoted in README".format(
                fold["fold"], token)
    assert "{:+.4f}".format(summary["mean_delta"]) in text
