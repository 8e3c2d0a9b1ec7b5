"""In-suite guard over the driver contract: a representative subset of
``__spark_entry__.queries()`` is value-compared against its
``oracle_sql()`` DuckDB twin on every pytest run (the full 29-query
sweep is scripts/check_entry.py). Catches Spark-vs-SQL drift before the
driver's correctness gate does."""

import duckdb
import pytest

import __spark_entry__ as E
from scripts.check_entry import TABLES, compare

SF = "/root/testdata/sf0.001"
SUBSET = [
    "q01_first_wins_dedup",   # agg-form dedup
    "q04_consensus_histogram",
    "q06_scalar_clean",       # portable rounding
    "q31_merge_with_delete",
    "q18_minhash_lsh_pairs",  # portable hashing
    "q19_simhash",
    "q20_embedding_topk",     # float parity
    "q22_text_quality",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = E.queries()[name](spark, SF).toPandas()
    duck_pdf = duck.execute(E.oracle_sql()[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["host", "url", "urlhash", "priority"]
