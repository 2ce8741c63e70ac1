"""Driver-contract invariants (no SparkSession needed): every query has
an oracle, and the CORRECTNESS-window ordering contract holds — the
driver records only the FIRST 50 queries() entries, so entries without
a committed green CORRECTNESS row must sit inside that window."""

import json
import os

import __spark_entry__ as entry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recorded() -> set[str]:
    seen: set[str] = set()
    for fn in sorted(os.listdir(ROOT)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(ROOT, fn)) as f:
                rows = json.load(f)
            seen |= {
                k
                for k, v in rows.items()
                if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            }
    return seen


def test_every_query_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o)


def test_unrecorded_queries_sit_inside_the_50_row_window():
    names = list(entry.queries())
    window = set(names[:50])
    unrecorded = set(names) - _recorded()
    outside = sorted(unrecorded - window)
    assert not outside, (
        f"queries with no green CORRECTNESS row are outside the driver's "
        f"50-row window: {outside} — reorder queries()"
    )
