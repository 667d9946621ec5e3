"""Keep the README's registry-count claim honest: the numbers on the
"driver contract" line must equal len(all_queries()) / len(all_oracles()).
(Round-3 verdict flagged a stale hand-edited count.)"""

from __future__ import annotations

import re
from pathlib import Path


def test_readme_counts_match_registry():
    from dqe_spark.entry import all_oracles, all_queries

    text = Path(__file__).resolve().parent.parent.joinpath("README.md").read_text()
    m = re.search(r"(\d+) registry\s+queries \((\d+) with an ANSI-SQL oracle", text)
    assert m, "README driver-contract line not found — update the test's regex"
    assert int(m.group(1)) == len(all_queries()), (
        f"README says {m.group(1)} queries; registry has {len(all_queries())}"
    )
    assert int(m.group(2)) == len(all_oracles()), (
        f"README says {m.group(2)} oracles; registry has {len(all_oracles())}"
    )
