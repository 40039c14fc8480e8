"""Driver-contract invariants: entry() runs, queries()/oracle_sql()
stay consistent. A regression here zeroes the round regardless of
library quality — guard it.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == [
        "c_mktsegment", "n_items", "revenue", "returned", "revenue_share_pct"
    ]
    # shares must cover the whole pie
    assert abs(sum(r.revenue_share_pct for r in rows) - 100.0) < 0.01


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    # every oracle belongs to a declared query
    assert set(oracles) <= set(qs)
    # every declared query is oracle-checked — no rows-only entries
    # (approximate ops are declared in recall-1.0 configs / portable
    # hash variants precisely so they CAN be oracle-checked)
    assert set(qs) == set(oracles)
    # all callables, all SQL strings
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
