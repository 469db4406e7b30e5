"""Driver-gate registry pin (VERDICT r04 #5).

The driver's correctness gate runs the FIRST 50 entries of
__spark_entry__.queries() against their oracle_sql() mirrors. Rounds 2-3
drifted: new operators pushed gate entries out of the 50-query window and
whole green rows silently left the record. Pin the contract: exactly 50
registered queries, every one with an oracle (or a documented rows-only
exemption), and the set equal to the round-4 driver artifact so additions
are a DELIBERATE swap, not an accidental eviction.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402

# ops whose semantics have no ANSI-SQL mirror; the driver records a
# weaker rows-only check for these (keep this list short and justified)
ROWS_ONLY_OK = {"stream_running_stats"}


def test_registry_is_exactly_the_driver_window():
    qs = entry.queries()
    assert len(qs) == 50, (
        f"queries() has {len(qs)} entries; the driver gates exactly 50. "
        "Adding an operator means SWAPPING an existing entry deliberately "
        "and updating this pin, not growing past the window."
    )


def test_every_query_has_an_oracle_or_documented_exemption():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles - ROWS_ONLY_OK
    assert not missing, f"queries without oracle_sql nor exemption: {sorted(missing)}"
    stale = oracles - qs
    assert not stale, f"oracle_sql entries not in queries(): {sorted(stale)}"


def test_registry_matches_last_recorded_gate():
    import glob

    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_full_r*.json")))
    if not arts:
        return
    with open(arts[-1]) as f:
        recorded = set(json.load(f))
    assert set(entry.queries()) == recorded, (
        "registry drifted from the last recorded driver gate; if the swap "
        "is deliberate, update this test with the new round artifact"
    )
