"""Property tests for the round-4 relational additions: semi/anti joins
partition the left side, ROLLUP levels are mutually consistent, the
rolling ROWS frame telescopes, and triangle corner counts are conserved
(every triangle increments exactly three corners)."""

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_semi_anti_partition_left_side(ray_session):
    from osprey_ray.pipelines.analytics import q_anti_join, q_semi_join

    anti = q_anti_join(SF_DIR).to_pandas()
    semi = q_semi_join(SF_DIR).to_pandas()
    n_cust = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'"
    ).fetchone()[0]
    # disjoint and exhaustive
    assert set(anti.c_custkey).isdisjoint(set(semi.c_custkey))
    assert len(anti) + len(semi) == n_cust
    # neither side duplicates a customer (semi must not fan out per order)
    assert semi.c_custkey.is_unique and anti.c_custkey.is_unique


def test_rollup_levels_consistent(ray_session):
    from osprey_ray.pipelines.analytics import q_rollup_agg

    df = q_rollup_agg(SF_DIR).to_pandas()
    finest = df[(df.l_returnflag != "ALL") & (df.l_linestatus != "ALL")]
    per_flag = df[(df.l_returnflag != "ALL") & (df.l_linestatus == "ALL")]
    grand = df[(df.l_returnflag == "ALL") & (df.l_linestatus == "ALL")]
    assert len(grand) == 1
    assert grand.n.iloc[0] == finest.n.sum() == per_flag.n.sum()
    assert grand.qty_cents.iloc[0] == finest.qty_cents.sum()
    got_flag = finest.groupby("l_returnflag").qty_cents.sum().sort_index()
    want_flag = per_flag.set_index("l_returnflag").qty_cents.sort_index()
    assert (got_flag == want_flag).all()


def test_rolling_window_telescopes(ray_session):
    from osprey_ray.pipelines.analytics import q_rolling_window

    df = (
        q_rolling_window(SF_DIR, preceding=0)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # frame of just the current row: roll equals the row's own cents
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_id", "value"])
    ev = ev.sort_values("event_id").reset_index(drop=True)
    cents = np.floor(ev.value.to_numpy() * 100 + 0.5).astype(np.int64)
    assert (df.n_in_frame == 1).all()
    assert (df.roll_cents.to_numpy() == cents).all()


def test_triangle_corner_conservation(ray_session):
    from osprey_ray.pipelines.ann import q_triangle_count

    df = q_triangle_count(SF_DIR).to_pandas()
    # total corner increments = 3 x number of triangles
    assert df.n_triangles.sum() % 3 == 0
    assert (df.n_triangles > 0).all()


def test_triangle_driver_equals_distributed(ray_session):
    """The driver sorted-adjacency wedge-closing fast path (edges <= cap)
    must equal the two-join distributed enumeration (forced with cap=0)."""
    from osprey_ray.pipelines.ann import q_triangle_count

    fast = (
        q_triangle_count(SF_DIR)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        q_triangle_count(SF_DIR, driver_edge_cap=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast.equals(dist)


def test_incremental_dedup_subset_of_new(ray_session):
    from osprey_ray.pipelines.textops import q_incremental_dedup

    df = q_incremental_dedup(SF_DIR).to_pandas()
    assert (df.doc_id % 2 == 1).all()
    n_new = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' WHERE doc_id % 2 = 1"
    ).fetchone()[0]
    assert len(df) < n_new  # something was actually dropped at this sf
    assert df.doc_id.is_unique


def test_full_outer_join_exercises_both_sides(ray_session):
    from osprey_ray.pipelines.analytics import q_full_outer_join

    df = q_full_outer_join(SF_DIR).to_pandas()
    # genuine full-outer: rows that exist on only one side, zero-filled
    assert ((df.purchase_cents > 0) & (df.n_errors == 0)).any()
    assert ((df.purchase_cents == 0) & (df.n_errors > 0)).any()
    assert ((df.purchase_cents > 0) & (df.n_errors > 0)).any()
    # key uniqueness after the coalesce
    assert not df.duplicated(["user_id", "hour_us"]).any()


def test_train_val_split_fractions(ray_session):
    from osprey_ray.pipelines.textops import q_train_val_split

    df = q_train_val_split(SF_DIR).to_pandas()
    tot = df.groupby("split").n_docs.sum()
    n = tot.sum()
    assert n == duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    # hash split: train ~90%, val/test ~5% each (loose bounds at 500 docs)
    assert tot.get("train", 0) > 0.8 * n
    assert 0 < tot.get("val", 0) < 0.12 * n
    assert 0 < tot.get("test", 0) < 0.12 * n


def test_ntile_rank_invariants(ray_session):
    from osprey_ray.pipelines.analytics import q_ntile_rank

    df = q_ntile_rank(SF_DIR).to_pandas()
    for _, g in df.groupby("event_type"):
        # rn is a permutation of 1..n; tiles differ in size by at most 1
        assert sorted(g.rn) == list(range(1, len(g) + 1))
        sizes = g.tile.value_counts()
        assert sizes.max() - sizes.min() <= 1
        assert g.pr_ppm.min() == 0 and g.pr_ppm.max() == 1_000_000
        # cents non-increasing in rank order
        assert (g.sort_values("rn").cents.diff().dropna() <= 0).all()


def test_pareto_frontier_no_dominated_point(ray_session):
    from osprey_ray.pipelines.analytics import q_pareto_frontier

    df = q_pareto_frontier(SF_DIR).to_pandas()
    assert len(df) > 0
    pts = df[["cents", "n_events"]].to_numpy()
    for i in range(len(pts)):
        for j in range(len(pts)):
            if i == j:
                continue
            dom = (
                pts[j][0] >= pts[i][0]
                and pts[j][1] >= pts[i][1]
                and (pts[j][0] > pts[i][0] or pts[j][1] > pts[i][1])
            )
            assert not dom, f"frontier point {i} dominated by {j}"


def test_kcore_membership(ray_session):
    from osprey_ray.pipelines.ann import q_kcore

    df = q_kcore(SF_DIR, core_k=3).to_pandas()
    # converged core: every surviving node keeps >= core_k in-core edges
    assert (df.core_degree >= 3).all()
    assert df.node.is_unique


def test_kcore_driver_equals_distributed(ray_session):
    """The driver bincount-peel fast path (edges <= cap) must equal the
    distributed semi-join loop (forced with cap=0) row for row."""
    from osprey_ray.pipelines.ann import q_kcore

    fast = (
        q_kcore(SF_DIR, core_k=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        q_kcore(SF_DIR, core_k=3, driver_edge_cap=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert fast.equals(dist)


def test_group_kmv_estimate_accuracy(ray_session):
    from osprey_ray.pipelines.analytics import q_group_kmv_distinct

    df = q_group_kmv_distinct(SF_DIR).to_pandas()
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM "
        f"'{SF_DIR}/events.parquet' GROUP BY event_type"
    ).df().set_index("event_type")["n"]
    for _, row in df.iterrows():
        e = exact[row.event_type]
        # KMV with k=16: loose 3/sqrt(k) relative-error bound
        assert abs(row.est_distinct - e) <= max(0.75 * e, 2), (row.event_type, row.est_distinct, e)


def test_mad_outliers_robustness(ray_session):
    from osprey_ray.pipelines.analytics import q_mad_outliers

    df = q_mad_outliers(SF_DIR).to_pandas()
    med = int(df.n_events.sort_values().iloc[
        max(int(np.ceil(len(df) * 0.5)) - 1, 0)
    ])
    assert (df.dev == (df.n_events - med).abs()).all()
    # flagged set = strictly-greater-than-threshold set
    mad = int(df.dev.sort_values().iloc[max(int(np.ceil(len(df) * 0.5)) - 1, 0)])
    assert (df.is_outlier == (df.dev > 3 * mad)).all()


def test_weighted_sample_weight_bias(ray_session):
    from osprey_ray.pipelines.textops import q_weighted_sample

    df = q_weighted_sample(SF_DIR).to_pandas()
    assert len(df) == 50
    corpus_mean = duckdb.sql(
        f"SELECT AVG(n_chars) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    # weight-proportional: sampled docs skew long vs the corpus mean
    assert df.weight.mean() > corpus_mean


def test_funnel_steps_monotone(ray_session):
    from osprey_ray.pipelines.analytics import q_funnel_steps

    df = q_funnel_steps(SF_DIR).to_pandas().set_index("step")
    # prefix completion counts must be non-increasing down the funnel
    assert df.loc["signup", "n_users"] >= df.loc["click", "n_users"]
    assert df.loc["click", "n_users"] >= df.loc["purchase", "n_users"]
    assert df.loc["signup", "n_users"] > 0


def test_corr_matrix_bounds(ray_session):
    from osprey_ray.pipelines.analytics import q_corr_matrix

    df = q_corr_matrix(SF_DIR).to_pandas()
    # all unordered type pairs, r^2 in [0, 1e6], sign in {-1,0,1}
    assert (df.r2_ppm >= 0).all() and (df.r2_ppm <= 1_000_000).all()
    assert df.sign.isin([-1, 0, 1]).all()
    assert not df.duplicated(["type_a", "type_b"]).any()
    assert (df.type_a < df.type_b).all()


def test_time_weighted_avg_exactness(ray_session):
    from osprey_ray.pipelines.analytics import q_time_weighted_avg

    df = q_time_weighted_avg(SF_DIR).to_pandas()
    # exact rational carried: twa == num // den for every user
    assert (df.twa_scaled == df.num // df.den).all()
    assert (df.den > 0).all()
    # TWA lies within the user's value range
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "value"])
    cents = (ev.value * 100 + 0.5).astype("int64")
    rng = cents.groupby(ev.user_id).agg(["min", "max"])
    j = df.set_index("user_id").join(rng)
    assert (j.twa_scaled >= j["min"] - 1).all() and (j.twa_scaled <= j["max"]).all()


def test_window_dedup_suppresses(ray_session):
    from osprey_ray.pipelines.analytics import q_window_dedup

    df = q_window_dedup(SF_DIR).to_pandas()
    assert (df.n_kept <= df.n_events).all()
    assert (df.n_kept >= 1).all()
    assert (df.n_kept < df.n_events).any()  # suppression actually happens


def test_retention_cohorts_monotone(ray_session):
    from osprey_ray.pipelines.analytics import q_retention_cohorts

    df = q_retention_cohorts(SF_DIR).to_pandas()
    assert (df.week_offset >= 0).all()
    # offset-0 cell of a cohort is at least as big as any later offset
    for cw, g in df.groupby("cohort_week_us"):
        base = g[g.week_offset == 0]
        assert len(base) == 1
        assert g.n_users.max() == base.iloc[0].n_users


def test_bloom_join_matches_semi_join(ray_session):
    from osprey_ray.pipelines.analytics import q_bloom_join, q_semi_join

    a = q_bloom_join(SF_DIR).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    b = q_semi_join(SF_DIR).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    # the Bloom prefilter is an execution shortcut: outputs identical
    assert a.equals(b)


def test_group_quantiles_ordering(ray_session):
    from osprey_ray.pipelines.analytics import q_group_quantiles

    df = q_group_quantiles(SF_DIR).to_pandas()
    assert (df.p25 <= df.p50).all() and (df.p50 <= df.p95).all()
    assert len(df) == 5


def test_gap_fill_dense_grid(ray_session):
    from osprey_ray.pipelines.analytics import q_gap_fill_ma

    df = q_gap_fill_ma(SF_DIR).to_pandas()
    # dense grid: every type has the identical full hour span
    spans = df.groupby("event_type").hour_us.agg(["min", "max", "count"])
    assert spans["min"].nunique() == 1 and spans["max"].nunique() == 1
    assert (spans["count"] == spans["count"].iloc[0]).all()
    # gap filling actually inserted zero rows
    assert (df.n == 0).any()
    assert (df.trailing_sum >= df.n).all()


def test_fully_shipped_partitions_orders(ray_session):
    """n_full <= n_orders per priority, and the priority totals cover
    exactly the orders that have at least one lineitem."""
    from osprey_ray.pipelines.relational import q_fully_shipped

    df = q_fully_shipped(SF_DIR).to_pandas()
    assert (df.n_full <= df.n_orders).all()
    want = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    assert df.n_orders.sum() == want


def test_brand_coverage_antitone_in_brand_set(ray_session):
    """Requiring MORE brands can only shrink the qualifying set."""
    from osprey_ray.pipelines.relational import q_brand_coverage

    two = set(q_brand_coverage(SF_DIR).to_pandas().custkey)
    one = set(
        q_brand_coverage(SF_DIR, brands=("Brand#12",)).to_pandas().custkey
    )
    assert two <= one


def test_waiting_suppliers_zero_horizon_counts_multisupplier(ray_session):
    """With late_days large enough no lineitem is late -> empty result."""
    from osprey_ray.pipelines.relational import q_waiting_suppliers

    out = q_waiting_suppliers(SF_DIR, late_days=100_000)
    assert out.num_rows == 0


def test_session_paths_totals_match_session_count(ray_session):
    """Sum of path counts (unlimited top_n) equals the total number of
    sessions from the independent sessionizer."""
    from osprey_ray.pipelines.analytics import q_session_counts, q_session_paths

    paths = q_session_paths(SF_DIR, top_n=10**9)
    n_paths = sum(paths["n_sessions"].to_pylist())
    sess = q_session_counts(SF_DIR).to_pandas()
    assert n_paths == sess.n_sessions.sum()


def test_percentile_cont_brackets_disc(ray_session):
    """The interpolated p50 lies within the discrete neighbourhood and
    respects p25 <= p50 <= p75."""
    from osprey_ray.pipelines.analytics import q_percentile_cont

    df = q_percentile_cont(SF_DIR).to_pandas()
    assert (df.p25_qcents <= df.p50_qcents).all()
    assert (df.p50_qcents <= df.p75_qcents).all()


def test_embedding_gram_diagonal_nonnegative(ray_session):
    from osprey_ray.pipelines.ann import q_embedding_gram

    df = q_embedding_gram(SF_DIR).to_pandas()
    diag = df[df.i == df.j]
    assert len(diag) == 64 and (diag.sum_xy >= 0).all()
    assert len(df) == 64 * 65 // 2


def test_contrastive_pairs_split_exact(ray_session):
    """View token counts partition the doc's token count, and the two
    view hashes reproduce a direct recomputation on a sample."""
    import hashlib

    from osprey_ray.pipelines.textops import q_contrastive_pairs

    df = q_contrastive_pairs(SF_DIR).to_pandas().set_index("doc_id")
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' LIMIT 20"
    ).df()
    for _, row in docs.iterrows():
        toks = row.text.split(" ")
        k = (len(toks) + 1) // 2
        got = df.loc[row.doc_id]
        assert got.n_tokens_a == k and got.n_tokens_b == len(toks) - k
        assert got.view_a_md5 == hashlib.md5(
            " ".join(toks[:k]).encode()
        ).hexdigest()
        assert got.view_b_md5 == hashlib.md5(
            " ".join(toks[k:]).encode()
        ).hexdigest()
