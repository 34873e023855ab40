"""Test helpers: table comparison under token-array equality per row."""

import pyarrow as pa


def normalize(table: pa.Table) -> list[tuple]:
    """Rows sorted by doc_id, list/primitive values py-converted."""
    names = sorted(table.column_names)
    rows = table.select(names).to_pylist()
    rows.sort(key=lambda r: r["doc_id"])
    return [tuple((n, _norm(r[n])) for n in names) for r in rows]


def _norm(v):
    if isinstance(v, list):
        return tuple(int(x) for x in v)
    if isinstance(v, float):
        return round(v, 9)
    return v


def assert_tables_equal(actual: pa.Table, expected: pa.Table):
    a, e = normalize(actual), normalize(expected)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    for i, (ra, re_) in enumerate(zip(a, e)):
        assert ra == re_, f"row {i} differs:\n  actual:   {ra}\n  expected: {re_}"


class ScriptedSource:
    """Scripted live-source double for pump() tests: returns each
    pre-baked poll result once, then empties; tracks the source cursor
    like the real adapters."""

    def __init__(self, polls):
        self.polls = list(polls)
        self.cursor = 0

    def poll(self, limit=10_000):
        out = self.polls.pop(0) if self.polls else []
        self.cursor += len(out)
        return out
