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


def test_priority_prefix_is_stable():
    """The driver's correctness gate checks a PREFIX of queries(); the
    PRIORITY list pins those keys. Rounds 2-4 kept them frozen — any
    accidental edit would rotate the driver's checked set and void
    round-over-round comparability."""
    import hashlib

    from dqe_spark.entry import PRIORITY, all_queries

    names = list(all_queries())
    assert names[: len(PRIORITY)] == PRIORITY
    # frozen as of round 3 (50 keys); update ONLY deliberately
    digest = hashlib.md5("|".join(PRIORITY).encode()).hexdigest()
    assert len(PRIORITY) == 50
    assert digest == "f4aa0413c407a8a952e8623a1083af16", (
        "PRIORITY changed — the driver's checked prefix would rotate; "
        "revert unless the rotation is deliberate (then update this digest)"
    )
