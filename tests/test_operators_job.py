"""Operator archetypes + job layer (SURVEY.md §2.3, §2.7).

Mirrors the reference's in-process job tests (TestGatherer,
TestBulkImporter, TestProducer, TestPivoter, TestKijiCellRewriter,
builder-validation tests) on tiny DataFrames; the canonical email-domain
example follows KijiProducer.java:83-95 / KijiGatherer.java:79-91 docs."""

import os

import pytest
from pyspark.sql import functions as F

from kiji_mapreduce_spark.cells import latest_value
from kiji_mapreduce_spark.operators import (
    BulkImporter, CellRewriter, Gatherer, MapReduceOperator, Pivoter, Producer,
)
from kiji_mapreduce_spark.job import (
    BulkImportJobBuilder, GatherJobBuilder, JobHistory, PivotJobBuilder,
)
from kiji_mapreduce_spark.io.outputs import job_output
from kiji_mapreduce_spark.kvstore import InMemoryMapKeyValueStore


def _people(spark):
    return spark.createDataFrame(
        [("gwu", "gwu@usermail.example.com", 94110),
         ("aaron", "aaron@usermail.example.com", 94110),
         ("bob", "bob@example.com", 10001)],
        "name string, email string, zip int")


class DomainGatherer(Gatherer):
    """The docs' email-domain gather+count."""

    def gather_df(self, df, ctx):
        return df.select(F.substring_index("email", "@", -1).alias("domain"))

    def reduce_df(self, g, ctx):
        return g.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))


def test_gather_job_end_to_end(spark, tmp_path):
    hist = JobHistory(path=str(tmp_path / "hist"))
    job = (GatherJobBuilder()
           .with_input(_people(spark))
           .with_gatherer(DomainGatherer())
           .with_output(job_output(f"format=text file={tmp_path}/out nsplits=1"))
           .with_history(hist).with_name("domain-count").build())
    assert job.run()
    part = [f for f in os.listdir(tmp_path / "out") if f.startswith("part")][0]
    lines = sorted(open(tmp_path / "out" / part).read().splitlines())
    assert lines == ["example.com\t1", "usermail.example.com\t2"]
    assert job.counters["GATHERER_ROWS_PROCESSED"] == 3  # input rows
    h = hist.read(spark).first()
    assert h.job_name == "domain-count" and h.job_end_status == "SUCCEEDED"


def test_submit_async(spark):
    job = (GatherJobBuilder().with_input(_people(spark))
           .with_gatherer(DomainGatherer()).build())
    job.submit()
    assert job.join(60)
    assert job.is_complete()


class PandasImporter(BulkImporter):
    """Python-style importer (mapInPandas path): rowkey:value lines like
    TestBulkImportInput.txt."""

    import_output_schema = "row_key string, name string"

    def import_pandas(self, batches):
        for pdf in batches:
            parts = pdf["value"].str.split(":", n=1, expand=True)
            parts.columns = ["row_key", "name"]
            yield parts


def test_bulk_import_pandas_path(spark):
    raw = spark.createDataFrame(
        [("row1:Marsellus Wallace",), ("row2:Vincent Vega",)], "value string")
    out = (BulkImportJobBuilder().with_input(raw)
           .with_importer(PandasImporter()).build().dataframe())
    rows = {r.row_key: r.name for r in out.collect()}
    assert rows == {"row1": "Marsellus Wallace", "row2": "Vincent Vega"}


class RejectingImporter(BulkImporter):
    """Drops malformed records — they count as REJECTED."""

    def import_df(self, df, ctx):
        return df.filter(F.col("value").contains(":")).select(
            F.substring_index("value", ":", 1).alias("row_key"))


def test_bulk_import_rejected_counter(spark):
    raw = spark.createDataFrame(
        [("a:1",), ("malformed",), ("b:2",), ("junk",)], "value string")
    job = (BulkImportJobBuilder().with_input(raw)
           .with_importer(RejectingImporter()).build())
    job.run()
    assert job.counters["BULKIMPORTER_ROWS_PROCESSED"] == 4
    assert job.counters["BULKIMPORTER_ROWS_OUT"] == 2
    assert job.counters["BULKIMPORTER_RECORDS_REJECTED"] == 2


class DomainProducer(Producer):
    def output_column(self):
        return "derived:domain"

    def produce_expr(self, df, ctx):
        return F.substring_index("email", "@", -1)


def test_producer_flat_table(spark):
    out = DomainProducer().compile(_people(spark))
    assert dict((r.name, r.domain) for r in out.collect())["bob"] == "example.com"


def test_producer_versioned_table(spark):
    df = spark.createDataFrame(
        [(("u1",), ([(10, "x@a.com")],))],
        "entity_id struct<key:string>, "
        "info struct<email:array<struct<ts:long,value:string>>>")

    class P(Producer):
        def output_column(self):
            return "info:email"

        def produce_expr(self, d, ctx):
            return F.lit("new@b.com")

        def produce_ts(self, d, ctx):
            return F.lit(20).cast("long")

    out = P().compile(df)
    assert out.select(
        latest_value(F.col("info.email"))).first()[0] == "new@b.com"


class ZipPivoter(Pivoter):
    def output_key(self):
        return ["zip"]

    def pivot_df(self, df, ctx):
        return df.groupBy("zip").agg(F.collect_set("name").alias("names"))


def test_pivoter_repartitions_by_new_key(spark):
    out = (PivotJobBuilder().with_input(_people(spark))
           .with_pivoter(ZipPivoter()).build().dataframe())
    got = {r.zip: sorted(r.names) for r in out.collect()}
    assert got == {94110: ["aaron", "gwu"], 10001: ["bob"]}


def test_cell_rewriter_chain_and_cycle():
    cr = CellRewriter("f:c", {"int": "long", "long": "double"})
    assert cr._final_type("int") == "double"
    with pytest.raises(ValueError, match="cycle"):
        CellRewriter("f:c", {"int": "long", "long": "int"})._final_type("int")


def test_cell_rewriter_applies(spark):
    df = spark.createDataFrame(
        [(1, ([(10, 5)],))],
        "id int, fam struct<c:array<struct<ts:long,value:int>>>")
    out = CellRewriter("fam:c", {"int": "long"}).compile(df)
    assert dict(out.dtypes)["fam"] == "struct<c:array<struct<ts:bigint,value:bigint>>>"
    cell = out.first().fam.c[0]
    assert (cell.ts, cell.value) == (10, 5)


def test_cell_rewriter_record_to_record(spark):
    """Record-schema migration (KijiCellRewriter.java:250-269): fields
    matched by name, new field from default, dropped field discarded,
    nulls and timestamps preserved."""
    df = spark.createDataFrame(
        [(1, ([(10, (5, "old")), (20, None)],))],
        "id int, fam struct<c:array<struct<ts:long,"
        "value:struct<n:int,legacy:string>>>>")
    target = {"type": "record", "name": "V2", "fields": [
        {"name": "n", "type": "long"},
        {"name": "tag", "type": "string"},
    ]}
    out = CellRewriter("fam:c", record_target=target,
                       record_defaults={"tag": "v2"}).compile(df)
    assert dict(out.dtypes)["fam"] == (
        "struct<c:array<struct<ts:bigint,value:struct<n:bigint,tag:string>>>>")
    cells = out.first().fam.c
    assert (cells[0].ts, cells[0].value.n, cells[0].value.tag) == (10, 5, "v2")
    assert cells[1].ts == 20 and cells[1].value is None  # null stays null


def test_cell_rewriter_record_target_on_primitive_raises(spark):
    df = spark.createDataFrame(
        [(1, ([(10, 5)],))],
        "id int, fam struct<c:array<struct<ts:long,value:int>>>")
    with pytest.raises(TypeError, match="not a record"):
        CellRewriter("fam:c", record_target="struct<n:bigint>").compile(df)


class StatsMR(MapReduceOperator):
    def group_keys(self):
        return ["zip"]

    def reduce_exprs(self, ctx):
        return [F.count(F.lit(1)).alias("n")]


def test_mapreduce_operator(spark):
    out = StatsMR().compile(_people(spark))
    assert {r.zip: r.n for r in out.collect()} == {94110: 2, 10001: 1}


class PandasReducerMR(MapReduceOperator):
    """Python-style reducer: whole group in memory via applyInPandas
    (the Hadoop reducer Iterable analogue)."""

    reduce_output_schema = "zip int, names string"

    def group_keys(self):
        return ["zip"]

    @staticmethod
    def reduce_pandas(key, pdf):
        import pandas as pd

        return pd.DataFrame({
            "zip": [key[0]],
            "names": [",".join(sorted(pdf["name"]))],
        })


def test_mapreduce_pandas_reducer(spark):
    out = PandasReducerMR().compile(_people(spark))
    got = {r.zip: r.names for r in out.collect()}
    assert got == {94110: "aaron,gwu", 10001: "bob"}


def test_builder_validations(spark):
    with pytest.raises(TypeError):
        GatherJobBuilder().with_operator(DomainProducer())
    with pytest.raises(ValueError, match="with_input"):
        GatherJobBuilder().with_gatherer(DomainGatherer()).build()


class NeedsStoreGatherer(Gatherer):
    def required_stores(self):
        return {"dim": None}

    def gather_df(self, df, ctx):
        reader = ctx.get_store("dim").reader(df.sparkSession)
        return df.filter(F.col("name").isin(list(reader)))


def test_job_store_binding(spark):
    b = (GatherJobBuilder().with_input(_people(spark))
         .with_gatherer(NeedsStoreGatherer()))
    with pytest.raises(ValueError, match="not bound"):
        b.build()
    b.with_store("dim", InMemoryMapKeyValueStore(data={"bob": "1"}))
    assert b.build().dataframe().count() == 1


def test_jobstats_aggregation(spark):
    """tools/jobstats.py (the kijistats analogue) rolls the job-history
    table up into per-job runs/failures/wall-clock/throughput."""
    import json as _json
    import sys

    sys.path.insert(0, ".")
    from tools.jobstats import job_stats

    hist = spark.createDataFrame(
        [("j1", "wordcount", 1000, 3000, "SUCCEEDED",
          _json.dumps({"GATHERER_ROWS_PROCESSED": 100}), "{}"),
         ("j2", "wordcount", 5000, 6000, "SUCCEEDED",
          _json.dumps({"GATHERER_ROWS_PROCESSED": 50}), "{}"),
         ("j3", "importer", 0, 500, "FAILED",
          _json.dumps({"BULKIMPORTER_ROWS_PROCESSED": 7}), "{}")],
        "job_id string, job_name string, job_start_time long, "
        "job_end_time long, job_end_status string, job_counters string, "
        "job_configuration string")
    out = {r.job_name: r for r in job_stats(hist).collect()}
    wc = out["wordcount"]
    assert (wc.runs, wc.failures, wc.total_rows) == (2, 0, 150)
    assert wc.avg_wall_s == 1.5 and wc.max_wall_s == 2.0
    assert wc.rows_per_s == 50.0  # 150 rows / 3 s
    imp = out["importer"]
    assert (imp.runs, imp.failures, imp.total_rows) == (1, 1, 7)
    # name filter narrows to one job
    assert [r.job_name for r in job_stats(hist, "importer").collect()] \
        == ["importer"]


def test_history_write_failure_does_not_mask_success(spark, tmp_path):
    """ADVICE r14: a job whose body succeeded but whose history-table
    write failed must NOT crash — every side effect is already
    committed. The bookkeeping failure surfaces as a RuntimeWarning
    plus ``job.history_error``."""
    import warnings as _warnings

    from kiji_mapreduce_spark.job import Job, JobHistory

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("a file where the history dir must go")
    hist = JobHistory(path=str(blocker / "history"))
    job = Job("hist-fail", spark.range(3).toDF("id"), output=None,
              history=hist)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        assert job.run() is True
    assert job.history_error is not None
    assert any("history-table write failed" in str(w.message)
               for w in caught)
