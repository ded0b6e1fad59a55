"""Full-registry oracle sweep at sf0.01 — the driver's correctness gate,
pre-driver.

Every ``queries()`` entry with an ``oracle_sql()`` twin runs against DuckDB
with the driver's documented compare (columns sorted by name, rows sorted by
all columns, dtypes counted). One test, all entries: any non-green row fails
with the per-query verdict map, so a regression is caught before the round's
CORRECTNESS file is ever written. ~50-90 s wall (marked slow); the per-query
sf0.001 parametrization in test_queries.py remains the fast-feedback layer.
"""

import importlib.util
import os

import duckdb
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "compare_oracle", os.path.join(os.path.dirname(__file__), "..",
                                   "tools", "compare_oracle.py"))
_co = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_co)

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.slow
def test_full_oracle_sweep_sf001(ray_session):
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in _co.TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    bad = {}
    for name in (n for n in qs if n in oracles):
        try:
            r = _co.compare(name, _co.to_pandas(qs[name](SF)),
                            con.execute(oracles[name]).fetchdf())
            if not all(v for v in r.values() if v is not None):
                bad[name] = r
        except Exception as ex:  # noqa: BLE001 — any crash is a red row
            bad[name] = f"{type(ex).__name__}: {ex}"
    assert not bad, bad
