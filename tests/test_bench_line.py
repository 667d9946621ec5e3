"""bench.py's final stdout line: the driver keeps only the final
~2000 chars of stdout AND its round-over-round perf comparer reads a
scalar ``queries`` map of name → seconds from that line (round 10
shipped [med, norm] pairs under ``q`` and the comparer saw zero
queries — PERF_r10 n_common == 0). The emitter must carry the full
registry inline at its real name lengths, stay under budget at ANY
registry size, keep the most expensive rows when overflow is forced,
and count (never silently drop) the overflow."""

from __future__ import annotations

import json

import bench


def _base(times):
    return {
        "metric": "headline-suite-wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "control": [0.301, 0.299],
    }


def _fake(n):
    times = {f"query_family_name_{i:03d}": round(0.1 * (i + 1), 3) for i in range(n)}
    return _base(times), times


def test_budget_holds_at_any_registry_size():
    for n in (5, 73, 120, 400):
        base, times = _fake(n)
        line = bench.compact_line(base, times)
        assert len(line) <= bench.LINE_BUDGET, (n, len(line))
        doc = json.loads(line)  # one complete JSON document
        assert doc.get("q_omitted", 0) + len(doc["queries"]) == n


def test_queries_map_is_driver_scalar_seconds():
    """The contract the driver's PERF comparer parses: name → seconds
    as a JSON number (not a [med, norm] pair)."""
    base, times = _fake(40)
    doc = json.loads(bench.compact_line(base, times))
    assert doc.get("q_omitted", 0) == 0
    for name, sec in doc["queries"].items():
        assert isinstance(sec, (int, float))
        assert abs(sec - times[name]) < 0.006  # ≥2-decimal fidelity


def test_most_expensive_rows_survive_overflow():
    base, times = _fake(400)
    doc = json.loads(bench.compact_line(base, times))
    kept = set(doc["queries"])
    assert doc["q_omitted"] > 0  # 400 rows cannot all fit
    cheapest_kept = min(times[n] for n in kept)
    dropped = [n for n in times if n not in kept]
    assert all(times[n] <= cheapest_kept for n in dropped)


def test_current_registry_fits_entirely():
    """The REAL registry (real name lengths) must ride the final line
    complete — the driver's comparer can only diff rows it can see, so
    n_common should be the whole bench surface, fast window or slow."""
    names = bench.HEADLINE + bench.EXT_HEADLINE
    for scale in (1.0, 2.5):  # steady box and a slow host window
        times = {n: round(scale * (0.3 + (i % 17) * 0.45), 3)
                 for i, n in enumerate(names)}
        line = bench.compact_line(_base(times), times)
        assert len(line) <= bench.LINE_BUDGET
        doc = json.loads(line)
        assert doc.get("q_omitted", 0) == 0
        assert set(doc["queries"]) == set(times)
