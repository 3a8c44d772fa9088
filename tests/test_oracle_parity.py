"""Full queries() vs oracle_sql() parity at sf0.001 — the same comparison
the driver runs at sf0.01 (row count, column names, order-insensitive
values)."""

import duckdb
import pytest

from pdf_parser_benchmark_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_TEST

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_TEST}/{t}.parquet')"
        )
    return c


def _normalize(df):
    import math

    import numpy as np

    def norm(v):
        if isinstance(v, np.ndarray):
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return "nan"
        return v  # EXACT values — floats must match bitwise

    cols = sorted(df.columns)
    out = []
    for r in df.to_dict("records"):
        out.append(tuple(norm(r[c]) for c in cols))
    return cols, sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, con):
    sdf = QUERIES[name](spark, SF_TEST).toPandas()
    if name not in ORACLES:
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = con.sql(ORACLES[name]).df()
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows
