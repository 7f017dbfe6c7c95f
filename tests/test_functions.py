"""asof_join / range_join_binned semantics."""

from pyspark.sql import functions as F

from kiji_mapreduce_spark.functions import asof_join, range_join_binned


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 25, "p2"), (2, 5, "p3")],
        "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "k long, t long, v double")
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"])
    got = {r.name: r.v for r in out.collect()}
    assert got == {"p1": 100.0,  # equal ts matches (inclusive)
                   "p2": 200.0,  # latest earlier
                   "p3": None}   # nothing at-or-before


def test_asof_strict(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"],
                    strict=True)
    got = {r.name: r.v for r in out.collect()}
    assert got == {"p1": None, "p2": 200.0, "p3": None}


def test_asof_ties_pick_max_value(spark):
    left = spark.createDataFrame([(1, 10, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 9.0)], "k long, t long, v double")
    out = asof_join(left, right, on="k", left_ts="t", value_cols=["v"])
    assert out.first().v == 9.0  # deterministic tie-break


def test_asof_match_is_one_row_not_per_column(spark):
    """ASOF semantics: all value columns come from the single matched
    right row — a NULL in one column of the newest right row must not be
    backfilled from an older row, and a newer all-but-one-NULL row must
    override an older complete one."""
    left = spark.createDataFrame([(1, 30, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "old"), (1, 20, None, "new")],
        "k long, t long, v double, s string")
    out = asof_join(left, right, on="k", left_ts="t",
                    value_cols=["v", "s"]).first()
    assert out.s == "new"
    assert out.v is None  # the matched row's v IS null; no column mixing


def test_asof_preserves_left_count(spark):
    left, right = _sides(spark)
    assert asof_join(left, right, on="k", left_ts="t").count() == left.count()


def test_range_join_binned_matches_predicate(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 7)], "id long, x double")
    ranges = spark.createDataFrame(
        [("lo", 0.0, 30.0), ("mid", 30.0, 60.0), ("hi", 60.0, 95.0)],
        "band string, lo double, hi double")
    out = range_join_binned(points, ranges, "x", "lo", "hi", bin_width=10)
    got = {(r.id, r.band) for r in out.collect()}
    expect = {(i, b) for i in range(0, 100, 7)
              for b, lo, hi in [("lo", 0, 30), ("mid", 30, 60), ("hi", 60, 95)]
              if lo <= i < hi}
    assert got == expect


def test_gapfill_locf_fills_and_flags(spark):
    from kiji_mapreduce_spark.functions import gapfill_locf

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0),
         (1, "2024-01-01 18:00:00", 7.0),   # same day: latest wins
         (1, "2024-01-04 00:00:00", 9.0),   # days 2-3 are gaps
         (2, "2024-01-02 00:00:00", 1.0)],
        "k long, t string, v double").withColumn("t", F.col("t").cast("timestamp"))
    out = gapfill_locf(df, ["k"], "t", "v", "1 day")
    got = {(r.k, r.bucket.day, r.value_filled, r.observed)
           for r in out.collect()}
    assert got == {(1, 1, 7.0, True), (1, 2, 7.0, False),
                   (1, 3, 7.0, False), (1, 4, 9.0, True),
                   (2, 2, 1.0, True)}


def test_gapfill_locf_rejects_multi_unit_step(spark):
    import pytest as _pytest

    from kiji_mapreduce_spark.functions import gapfill_locf

    df = spark.createDataFrame([(1, "2024-01-01", 1.0)],
                               "k long, t string, v double")
    with _pytest.raises(ValueError):
        gapfill_locf(df, ["k"], "t", "v", "15 minutes")


def test_snapshot_diff_classifies(spark):
    from kiji_mapreduce_spark.functions import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, s string, v double")
    after = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)],
        "id long, s string, v double")
    got = {(r.id, r.change)
           for r in snapshot_diff(before, after, ["id"]).collect()}
    assert got == {(1, "deleted"), (3, "updated"), (4, "inserted")}


def test_snapshot_diff_respects_compare_cols(spark):
    from kiji_mapreduce_spark.functions import snapshot_diff

    before = spark.createDataFrame([(1, "a", 10.0)], "id long, s string, v double")
    after = spark.createDataFrame([(1, "a", 99.0)], "id long, s string, v double")
    # v excluded from comparison -> no change rows at all
    assert snapshot_diff(before, after, ["id"], ["s"]).count() == 0


def test_fuzzy_match_blocked_best_match(spark):
    from kiji_mapreduce_spark.pipeline.entity import fuzzy_match_blocked

    canonical = spark.createDataFrame(
        [(1, "Acme Corporation"), (2, "Globex Industries"),
         (3, "Initech LLC")], "cid long, cname string")
    records = spark.createDataFrame(
        [(10, "acme corporation"),      # exact after casefold
         (11, "Acme Corporatino"),      # transposition, dist 2
         (12, "Globex Industies"),      # deletion, dist 1
         (13, "Umbrella Corp")],        # no match within dist 2
        "rid long, rname string")
    out = fuzzy_match_blocked(records, canonical, "rid", "cid",
                              "rname", "cname", max_dist=2)
    got = {(r.record_id, r.canonical_id, r.dist) for r in out.collect()}
    assert got == {(10, 1, 0), (11, 1, 2), (12, 2, 1)}


def test_audit_profile_and_orphans(spark):
    from kiji_mapreduce_spark.audit import (
        audit_union, column_profile, fk_orphans)

    child = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(100,)], "pk long")
    report = audit_union([
        column_profile(child, "child", ["fk"]),
        fk_orphans(child, parent, "fk", "pk", "child.fk->parent.pk"),
    ])
    got = {(r.check_name, r.subject): r.value for r in report.collect()}
    assert got[("n_rows", "child")] == 4.0
    assert got[("n_nulls", "child.fk")] == 1.0
    assert got[("n_distinct", "child.fk")] == 2.0
    assert got[("min", "child.fk")] == 100.0
    assert got[("max", "child.fk")] == 200.0
    # SQL FK semantics (r13): the NULL-fk row passes the check — only
    # fk=200 is an orphan
    assert got[("fk_orphans", "child.fk->parent.pk")] == 1.0


def test_snapshot_diff_detects_null_column_swap(spark):
    """A value moving between columns across a NULL is an update —
    xxhash64 skips null children, so ('x', NULL) and (NULL, 'x') hashed
    identically and the change was silently dropped (r5 review)."""
    from kiji_mapreduce_spark.functions import snapshot_diff

    before = spark.createDataFrame([(1, "x", None)],
                                   "id long, a string, b string")
    after = spark.createDataFrame([(1, None, "x")],
                                  "id long, a string, b string")
    out = snapshot_diff(before, after, ["id"]).collect()
    assert [(r.id, r.change) for r in out] == [(1, "updated")]


def test_distribution_drift_psi(spark):
    """PSI drift: identical distributions score ~0 / not drifted; a
    shifted distribution crosses the 0.25 threshold; result matches a
    numpy PSI on the same bins; empty input raises."""
    import numpy as np
    import pytest

    from kiji_mapreduce_spark.audit import distribution_drift

    rng = np.random.RandomState(7)
    base = rng.normal(50, 10, size=4000)
    same = rng.normal(50, 10, size=4000)
    shifted = rng.normal(80, 10, size=4000)
    mk = lambda a: spark.createDataFrame(
        [(float(x),) for x in a], "x double")

    stable = distribution_drift(mk(base), mk(same), "x", bins=20).first()
    assert stable.psi < 0.1 and not stable.drifted
    assert stable.n_before == stable.n_after == 4000

    drift = distribution_drift(mk(base), mk(shifted), "x", bins=20).first()
    assert drift.psi > 0.25 and drift.drifted

    # cross-check against numpy on fixed explicit bounds
    lo, hi = 0.0, 120.0
    got = distribution_drift(mk(base), mk(shifted), "x", bins=10,
                             lo=lo, hi=hi).first().psi
    edges = np.linspace(lo, hi, 11)
    nb, _ = np.histogram(np.clip(base, lo, hi), bins=edges)
    na, _ = np.histogram(np.clip(shifted, lo, hi), bins=edges)
    pb, pa = nb / nb.sum() + 1e-6, na / na.sum() + 1e-6
    want = float(((pa - pb) * np.log(pa / pb)).sum())
    assert abs(got - want) < 1e-4, (got, want)

    # binned KS = max cumulative-CDF gap, cross-checked against numpy
    # on the same fixed bins (unsmoothed proportions)
    row = distribution_drift(mk(base), mk(shifted), "x", bins=10,
                             lo=lo, hi=hi).first()
    want_ks = float(np.abs(np.cumsum(nb / nb.sum())
                           - np.cumsum(na / na.sum())).max())
    assert abs(row.ks - want_ks) < 1e-4, (row.ks, want_ks)
    assert stable.ks < 0.05  # identical distributions: tiny gap

    with pytest.raises(ValueError, match="no non-null"):
        distribution_drift(mk([]).filter("1=0"), mk([]).filter("1=0"), "x")


def test_zorder_key_interleaves_and_clusters(spark):
    """Morton key: bit interleaving matches a Python reference; sorting
    by it clusters BOTH columns (each half of the z-sorted output spans
    at most ~half of each dimension's range, unlike a single-column
    sort where the second column spans everything everywhere)."""
    import pytest

    from kiji_mapreduce_spark.functions import zorder_key

    def ref_z(vals, bits):
        z = 0
        n = len(vals)
        for b in range(bits):
            for i, v in enumerate(vals):
                z |= ((v >> b) & 1) << (b * n + i)
        return z

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x int, y int")
    out = df.select(
        "x", "y",
        zorder_key(["x", "y"], bits=4,
                   ranges=[(0, 15), (0, 15)]).alias("z")).collect()
    for r in out:
        assert r.z == ref_z([r.x, r.y], 4), (r.x, r.y)

    # clustering: the first quarter of the z-order covers the (0-7, 0-7)
    # quadrant exactly — both dimensions bounded, the property parquet
    # min/max skipping exploits
    first_q = sorted(out, key=lambda r: r.z)[:64]
    assert {(r.x, r.y) for r in first_q} == {
        (x, y) for x in range(8) for y in range(8)}

    with pytest.raises(ValueError, match=">= 2"):
        zorder_key(["x"], ranges=[(0, 1)])
    with pytest.raises(ValueError, match="signed long"):
        zorder_key(["x", "y"], bits=32, ranges=[(0, 1), (0, 1)])


def test_distribution_drift_empty_side_raises(spark):
    """With explicit lo/hi an empty/all-NULL snapshot raises instead of
    returning a NaN psi that flags as drifted (review finding)."""
    import pytest

    from kiji_mapreduce_spark.audit import distribution_drift

    full = spark.createDataFrame([(float(i),) for i in range(10)],
                                 "x double")
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="empty snapshot"):
        distribution_drift(empty, full, "x", lo=0.0, hi=10.0)
    with pytest.raises(ValueError, match="empty snapshot"):
        distribution_drift(full, empty, "x", lo=0.0, hi=10.0)


def test_salted_topk_k_exceeds_group_size(spark):
    """k larger than a group's row count returns the whole group,
    ranked, with no phantom rows."""
    from kiji_mapreduce_spark.functions import salted_topk

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "g string, v int")
    out = salted_topk(df, "g", "v", k=10)
    got = {(r.g, r.v, r.rank) for r in out.collect()}
    assert got == {("a", 2, 1), ("a", 1, 2), ("b", 5, 1)}


def test_asof_null_ts_right_rows_never_match(spark):
    """A right row with a NULL timestamp has no event time and must not
    fabricate an as-of match (r13 review finding: NULLS FIRST ordering
    made it 'earlier than everything'); a NULL-ts LEFT row matches
    nothing and emits NULL values — both mirror DuckDB ASOF / pandas
    merge_asof."""
    left = spark.createDataFrame(
        [(1, 5, "p"), (1, None, "q")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k long, t long, v double")
    out = {r.name: r.v for r in asof_join(
        left, right, on="k", left_ts="t", value_cols=["v"]).collect()}
    assert out == {"p": None, "q": None}
    # and a real right row still matches alongside a NULL-ts one
    right2 = spark.createDataFrame(
        [(1, None, 99.0), (1, 3, 42.0)], "k long, t long, v double")
    out2 = {r.name: r.v for r in asof_join(
        left, right2, on="k", left_ts="t", value_cols=["v"]).collect()}
    assert out2 == {"p": 42.0, "q": None}


def test_histogram_quantiles_nan_and_inf_guards(spark):
    """One NaN value must not poison the derived range into silent
    NaN estimates (NaN wins F.max and survives the hi<=lo guard —
    r13 review finding); an infinite derived range raises instead of
    emitting inf/NaN rows; explicit non-finite bounds are rejected."""
    import pytest

    from kiji_mapreduce_spark.functions import histogram_quantiles

    nan_df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (float("nan"),)], "x double")
    rows = histogram_quantiles(nan_df, "x", probs=[0.5, 1.0],
                               bins=4).collect()
    by_p = {r.prob: r.quantile_est for r in rows}
    assert by_p[1.0] == 3.0        # NaN excluded from the range
    assert rows[0].n == 3          # ...and from the counts
    assert all(r.quantile_est == r.quantile_est for r in rows)  # no NaN

    inf_df = spark.createDataFrame([(1.0,), (float("inf"),)], "x double")
    with pytest.raises(ValueError, match="not finite"):
        histogram_quantiles(inf_df, "x", probs=[0.5])
    # explicit finite bounds clamp the infinity into the top bin
    ok = histogram_quantiles(inf_df, "x", probs=[1.0], bins=4,
                             lo=0.0, hi=2.0).collect()
    assert ok[0].n == 2
    with pytest.raises(ValueError, match="finite"):
        histogram_quantiles(inf_df, "x", probs=[0.5], lo=0.0,
                            hi=float("inf"))


def test_salted_topk_map_column_schema(spark):
    """The default whole-row salt must skip MapType columns (F.hash
    raises HASH_MAP_TYPE on maps — r13 review finding; webdataset
    sample rows and map families are map-typed in this engine)."""
    from kiji_mapreduce_spark.functions import salted_topk

    df = spark.createDataFrame(
        [("a", 1, {"k": "x"}), ("a", 2, {"k": "y"}), ("b", 5, {"k": "z"})],
        "g string, v int, m map<string,string>")
    out = salted_topk(df, "g", "v", k=1)
    assert {(r.g, r.v) for r in out.collect()} == {("a", 2), ("b", 5)}


def test_snapshot_diff_null_keys_match_null_safely(spark):
    """A row whose key is NULL must compare across snapshots instead of
    double-reporting as deleted+inserted (r13 review finding: the USING
    join can never match NULL keys)."""
    from kiji_mapreduce_spark.functions import snapshot_diff

    before = spark.createDataFrame(
        [(None, 1), (1, 10), (2, 20)], "k int, x int")
    after_same = spark.createDataFrame(
        [(None, 1), (1, 10), (2, 21)], "k int, x int")
    got = {(r.k, r.change) for r in snapshot_diff(
        before, after_same, key_cols=["k"]).collect()}
    assert got == {(2, "updated")}  # the NULL-key row is unchanged
    after_changed = spark.createDataFrame(
        [(None, 2), (1, 10), (2, 20)], "k int, x int")
    got2 = {(r.k, r.change) for r in snapshot_diff(
        before, after_changed, key_cols=["k"]).collect()}
    assert got2 == {(None, "updated")}


def test_local_table_matches_classic_create(spark):
    """local_table (r14: Arrow-local model tables — the classic list
    createDataFrame replays a pickled RDD through defaultParallelism
    Python workers on every action) must be value- and schema-identical
    to the classic path across the call sites' shapes."""
    from kiji_mapreduce_spark.functions import local_table

    cases = [
        ([(b, b * 0.001) for b in range(100)], "bucket int, lr double"),
        ([("a.b", True, False, True), ("c", False, True, False)],
         "t string, x boolean, y boolean, z boolean"),
        ([(0, [1.0, 2.0]), (1, [3.0, 4.5])],
         "cell int, center array<double>"),
        ([("q1", "alpha beta")], "query_id string, query_text string"),
    ]
    for rows, schema in cases:
        a = local_table(spark, rows, schema)
        b = spark.createDataFrame(rows, schema)
        assert a.schema == b.schema, schema
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect())), schema
    # empty rows fall back to the classic path with the right schema
    e = local_table(spark, [], "k int, v double")
    assert e.count() == 0 and [f.name for f in e.schema.fields] == ["k", "v"]
