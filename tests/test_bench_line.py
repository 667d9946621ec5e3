"""bench.py's compact stdout line: the driver keeps only the final
~2000 chars of stdout, and both round 5 and round 8 lost their
per-query maps to that tail. The compact emitter must stay under
budget at ANY registry size, keep the most expensive rows inline, and
count (never silently drop) the overflow."""

from __future__ import annotations

import json

import bench


def _fake(n):
    times = {f"query_family_name_{i:03d}": round(0.1 * (i + 1), 3) for i in range(n)}
    norm = {k: round(v / 0.3, 3) for k, v in times.items()}
    base = {
        "metric": "headline-suite-wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": n,
        "control": [0.301, 0.299],
        "control_spread": 1.01,
        "serve_warm": {
            "rollup_distinct_users_1d_serve": 0.21,
            "knn_ann_serve": 0.18,
            "rollup_retention_1d_serve": 0.27,
            "events_watchlist_cms_serve": 0.19,
        },
        "artifact": "BENCH_local_sf0.1.json",
    }
    return base, times, norm


def test_budget_holds_at_any_registry_size():
    for n in (5, 73, 120, 400):
        base, times, norm = _fake(n)
        line = bench.compact_line(base, times, norm)
        assert len(line) <= bench.LINE_BUDGET, (n, len(line))
        doc = json.loads(line)  # one complete JSON document
        assert doc["n_queries"] == n
        assert doc["q_omitted"] + len(doc["q"]) == n


def test_most_expensive_rows_survive():
    base, times, norm = _fake(200)
    doc = json.loads(bench.compact_line(base, times, norm))
    kept = set(doc["q"])
    assert doc["q_omitted"] > 0  # 200 rows cannot all fit
    cheapest_kept = min(times[n] for n in kept)
    dropped = [n for n in times if n not in kept]
    assert all(times[n] <= cheapest_kept for n in dropped)
    # inline values are [median, norm] as recorded
    name = next(iter(kept))
    assert doc["q"][name] == [times[name], norm[name]]


def test_small_registry_fits_entirely():
    base, times, norm = _fake(10)
    doc = json.loads(bench.compact_line(base, times, norm))
    assert doc["q_omitted"] == 0
    assert set(doc["q"]) == set(times)


def test_current_registry_keeps_warm_serving_inline():
    """The four warm serving medians are part of the compact base —
    they must survive at the CURRENT registry size (the round-9 ask:
    serving latency adjudicable from the driver artifact alone)."""
    n_now = len(bench.HEADLINE) + len(bench.EXT_HEADLINE)
    base, times, norm = _fake(n_now)
    doc = json.loads(bench.compact_line(base, times, norm))
    assert set(doc["serve_warm"]) == set(base["serve_warm"])
    assert len(doc["q"]) >= 30  # a meaningful inline slice rides along
