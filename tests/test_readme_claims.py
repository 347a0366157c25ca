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

#: run-to-run tunnel-weather envelope (docs/PERF.md measures ±7% on the
#: headline; allow 3x that before declaring a claim stale)
WEATHER_RTOL = 0.25


def _latest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert paths, "no driver-captured bench artifacts"
    with open(paths[-1]) as f:
        data = json.load(f)
    assert data.get("rc") == 0, "latest bench capture failed: " + paths[-1]
    return paths[-1], data["parsed"]


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
    # and the cited round must not be stale vs the newest capture
    path, latest = _latest_bench()
    assert abs(cited["value"] - latest["value"]) \
        <= WEATHER_RTOL * latest["value"], \
        "README cites r{} but {} differs materially — update the table" \
        .format(int(cite.group(1)), os.path.basename(path))


def test_training_row_tracks_latest_capture():
    row = _headline_row(_readme(), "Training (")
    quoted = _numbers(row.split("|")[2])[0]
    _, latest = _latest_bench()
    assert abs(quoted - latest["training_chunks_per_sec"]) \
        <= 0.15 * latest["training_chunks_per_sec"]


def test_remap_row_tracks_latest_capture():
    row = _headline_row(_readme(), "remapping")
    quoted = _numbers(row.split("|")[2])[0] * 1e6   # "~5.2M"
    _, latest = _latest_bench()
    assert abs(quoted - latest["remap_samples_per_sec"]) \
        <= WEATHER_RTOL * latest["remap_samples_per_sec"]


def test_accuracy_row_brackets_latest_per_read_accuracies():
    row = _headline_row(_readme(), "accuracy vs in-file")
    lo, hi = sorted(_numbers(row.split("|")[2]))[:2]
    _, latest = _latest_bench()
    accs = [100 * v for v in latest["accuracy_per_read"].values()]
    assert lo - 1.0 <= min(accs) and max(accs) <= hi + 1.0, \
        "per-read accuracy range in README no longer brackets the capture"


def test_speedup_row_tracks_latest_capture():
    row = _headline_row(_readme(), "CPU reference")
    lo, hi = sorted(_numbers(row.split("|")[2])[-2:])
    _, latest = _latest_bench()
    assert lo * (1 - WEATHER_RTOL) <= latest["vs_baseline"] \
        <= hi * (1 + WEATHER_RTOL)


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
