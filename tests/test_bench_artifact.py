"""bench.py artifact-size contract.

The driver captures only the TAIL (~2000 chars) of bench.py's stdout;
rounds 4 and 10 both shipped a final JSON line long enough that the
head — including "metric" and "value" — was truncated and the round
recorded ``parsed: null``.  These tests pin the compact/detail split so
the stdout line can never grow past the capture window again.
"""

from __future__ import annotations

import json

import bench


def _representative_full() -> dict:
    """A full artifact dict with worst-case-realistic field widths:
    every HEADLINE query present with max-width floats, both probes,
    verbose detail blocks populated."""
    queries = {name: 12345.678 for name in bench.HEADLINE}
    full = {
        "metric": "headline_warm_total",
        "value": 123456.789,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "calibration": 1234.567,
        "calibration2": 1234.567,
        "fault_mbps": 123456.7,
        "calibrated_total": 12345.678,
        "calibrated_queries": {n: 1234.567 for n in queries},
        "runs": {n: [12345.678] * bench.N_RUNS for n in queries},
        "methodology": "x" * 600,
        "vs_prior": {
            "prior": "BENCH_r99.json",
            "prior_value": 123456.789,
            "prior_sf": 0.1,
            "raw_ratio": 1.234,
            "comparable_total": 12345.678,
            "prior_comparable_total": 12345.678,
            "comparable_ratio": 1.234,
            "query_ratios": {n: 1.234 for n in queries},
            "calibrated_query_ratios": {n: 1.234 for n in queries},
            "calibrated_comparable_ratio": 1.234,
        },
    }
    return full


def test_compact_line_fits_driver_tail_capture():
    compact, _ = bench.split_artifact(_representative_full())
    line = json.dumps(compact)
    assert len(line) <= bench.MAX_COMPACT_LINE, (
        f"compact line is {len(line)} chars — exceeds the "
        f"{bench.MAX_COMPACT_LINE} budget that keeps it inside the "
        "driver's ~2000-char stdout tail capture"
    )


def test_compact_line_has_driver_fields_and_no_verbose_ones():
    compact, detail = bench.split_artifact(_representative_full())
    for k in ("metric", "value", "unit", "queries", "sf", "calibration"):
        assert k in compact, f"driver-required field {k!r} missing"
    for k in ("runs", "methodology", "vs_prior", "calibrated_queries"):
        assert k not in compact, (
            f"verbose field {k!r} on the stdout line — this is how the "
            "r04/r10 truncation happened; it belongs in BENCH_DETAIL.json"
        )
        assert k in detail, f"verbose field {k!r} lost from the detail side"


def test_headline_uses_linear_dedup_form():
    """Round-10 verdict ask #2: the benched near-dup must be the
    production verdict form (output linear in corpus size), never the
    pair-list form (quadratic on clone-heavy corpora)."""
    assert "dedup_minhash_lsh" not in bench.HEADLINE.values()
    assert bench.HEADLINE.get("dedup_minhash_verdicts") == "dedup_minhash_verdicts"


def test_vs_prior_suppresses_raw_ratio_on_query_set_change():
    """raw_ratio compares totals of IDENTICAL query sets only — a grown
    set read as a fake ~11x regression in r10 (ADVICE)."""
    import os
    import tempfile

    times = {"a": 1.0, "b": 2.0, "new": 3.0}
    with tempfile.TemporaryDirectory() as d:
        prior = {
            "value": 3.0,
            "sf": 0.1,
            "calibration": 1.0,
            "queries": {"a": 1.0, "b": 2.0},
        }
        with open(os.path.join(d, "BENCH_r98.json"), "w") as fh:
            json.dump(prior, fh)
        # explicit root param (r11 ADVICE: no global os.path monkeypatch)
        cmp = bench._vs_prior(times, calibration=1.0, root=d)
    assert cmp["raw_ratio"] is None
    assert cmp["comparable_ratio"] == 1.0
    assert set(cmp["query_ratios"]) == {"a", "b"}


def test_overflow_fallback_emits_minimal_parseable_line(capsys, monkeypatch):
    """If the compact line somehow outgrows the budget at driver time,
    bench must still print a parseable line with metric+value (the
    minimal core), never crash artifact-less or ship a truncatable one."""
    monkeypatch.setattr(bench, "MAX_COMPACT_LINE", 10)  # force overflow
    compact, _ = bench.split_artifact(_representative_full())
    line = json.dumps(compact)
    assert len(line) > bench.MAX_COMPACT_LINE
    # exercise the fallback shaping directly
    minimal = {
        k: compact[k]
        for k in ("metric", "value", "unit", "sf", "calibration")
        if k in compact
    }
    out = json.dumps(minimal)
    parsed = json.loads(out)
    assert parsed["metric"] and parsed["value"] is not None
    assert len(out) < 200
