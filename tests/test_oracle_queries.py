"""Driver-contract conformance: every ``queries()`` entry runs, and every
``oracle_sql()`` entry matches its Ray result (row count + sorted-column
value equality) via DuckDB at sf0.001 — a faster local version of the
driver's sf0.01 gate."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pdf(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


import __ray_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql(SF_DIR)  # r5: twins parameterized by scale


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, ray_session):
    got = _canon(_to_pdf(QUERIES[name](SF_DIR)))
    want = _canon(_con().execute(ORACLES[name]).df())
    if len(got) == 0 and len(want) == 0:
        return  # both empty — Ray drops schema on empty pandas conversion
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c].tolist(), want[c].tolist()
        bad = [i for i, (x, y) in enumerate(zip(g, w)) if x != y and not (
            isinstance(x, float) and isinstance(y, float) and math.isclose(x, y, rel_tol=1e-9)
        )]
        assert not bad, f"{name}.{c}: {len(bad)} mismatches, first {bad[0]}: {g[bad[0]]!r} != {w[bad[0]]!r}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES) - {"flagship_verdicts", "streaming_verdicts"}))
def test_rows_only_queries_run(name, ray_session):
    got = _to_pdf(QUERIES[name](SF_DIR))
    assert len(got) >= 0
    assert len(got.columns) > 0


def test_flagship_queries_run(ray_session):
    got = _to_pdf(QUERIES["flagship_verdicts"](SF_DIR))
    assert len(got) > 0
    got_s = _to_pdf(QUERIES["streaming_verdicts"](SF_DIR))
    # batch and streaming flagship agree on the fired subset
    a = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = got_s.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()


def test_entry_runs(ray_session):
    res = entrymod.entry()
    pdf = _to_pdf(res)
    assert len(pdf) > 0
    assert "conv_id" in pdf.columns and "__verdicts" in pdf.columns
