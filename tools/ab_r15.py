"""Interleaved same-session A/B for the r15 operator rewrites.

Loads the PREVIOUS (HEAD-committed) implementations of the touched
modules side-by-side with the working tree's, builds each target query
in both forms, and times them alternating A, B, A, B ... within ONE
Spark session (the r14 measurement discipline: cross-run bench deltas
on this host are unadjudicable under its contention waves, interleaved
pairs are not). Reports per-form medians over the noop sink.

Usage: python tools/ab_r15.py [reps] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import importlib.util
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


#: the r14 round-end tree — the "old" side of every A/B this round
BASELINE_REF = os.environ.get("AB_BASELINE_REF", "36fc6c7")


def load_old(rel: str, name: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{BASELINE_REF}:{rel}"],
        capture_output=True, text=True, check=True).stdout
    path = f"/tmp/old_{name}.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(f"old_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"old_{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from kiji_mapreduce_spark.session import make_session
    from kiji_mapreduce_spark.suite.common import _t
    from kiji_mapreduce_spark.pipeline import dedup, lm, text as text_ops
    from kiji_mapreduce_spark.pipeline import dsir
    from kiji_mapreduce_spark import audit
    from kiji_mapreduce_spark.pipeline.sample import split_assign

    old_dedup = load_old("kiji_mapreduce_spark/pipeline/dedup.py", "dedup")
    old_lm = load_old("kiji_mapreduce_spark/pipeline/lm.py", "lm")
    old_text = load_old("kiji_mapreduce_spark/pipeline/text.py", "text")
    old_dsir = load_old("kiji_mapreduce_spark/pipeline/dsir.py", "dsir")
    old_audit = load_old("kiji_mapreduce_spark/audit.py", "audit")

    spark = make_session(master="local[32]", shuffle_partitions=32,
                         extra_conf={"spark.ui.enabled": "false"})

    def docs():
        return _t(spark, sf_dir, "documents")

    pairs = {
        "dedup_exact_substring": (
            lambda: old_dedup.exact_substring_dedup(docs(), min_tokens=8)
            .select("doc_id", F.col("text").alias("stripped_text"),
                    "tokens_dropped"),
            lambda: dedup.exact_substring_dedup(docs(), min_tokens=8)
            .select("doc_id", F.col("text").alias("stripped_text"),
                    "tokens_dropped"),
        ),
        "lm_bigram_quality": (
            lambda: old_lm.bigram_lm_scores(docs(), alpha=0.1,
                                            hash_fn="md5"),
            lambda: lm.bigram_lm_scores(docs(), alpha=0.1, hash_fn="md5"),
        ),
        "text_repetition": (
            lambda: old_text.repetition_features(docs(), top_ns=(2, 3),
                                                 dup_ns=(5,)),
            lambda: text_ops.repetition_features(docs(), top_ns=(2, 3),
                                                 dup_ns=(5,)),
        ),
        "split_leakage": (
            lambda: old_audit.split_leakage(
                split_assign(docs(), seed=42, hash_fn="md5").join(
                    old_text.fingerprints(docs(), hash_fn="md5"),
                    on="doc_id"),
                digest_col="fingerprint"),
            lambda: audit.split_leakage(
                split_assign(docs(), seed=42, hash_fn="md5").join(
                    text_ops.fingerprints(docs(), hash_fn="md5"),
                    on="doc_id"),
                digest_col="fingerprint"),
        ),
        "dsir_log_weights": (
            lambda: old_dsir.dsir_log_weights(
                docs().select("doc_id", "text"),
                docs().select("doc_id", "text")
                .filter(F.col("doc_id") % 10 == 3),
                dim=64, hash_fn="md5", smoothing=1.0),
            lambda: dsir.dsir_log_weights(
                docs().select("doc_id", "text"), dim=64, hash_fn="md5",
                smoothing=1.0,
                target_pred=F.col("doc_id") % 10 == 3),
        ),
    }
    if only:
        pairs = {k: v for k, v in pairs.items() if k in only}

    def run(fn):
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for name, (old_fn, new_fn) in pairs.items():
        # untimed warm-up of both forms
        run(old_fn), run(new_fn)
        olds, news = [], []
        for _ in range(reps):
            olds.append(run(old_fn))
            news.append(run(new_fn))
        om, nm = statistics.median(olds), statistics.median(news)
        print(f"A/B {name}: old {om:.3f}s {['%.2f' % t for t in olds]} "
              f"-> new {nm:.3f}s {['%.2f' % t for t in news]} "
              f"({om / nm:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
