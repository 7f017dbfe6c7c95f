"""Operator base: lifecycle, data requests, KV stores, counters.

Mirrors the reference operator contract (``setConf -> getDataRequest ->
setup -> N x process -> cleanup``, ``KijiProducer.java:44-75``) without the
Hadoop plumbing: an Operator declares *what* it reads (DataRequest), which
side inputs it needs (``required_stores``), and a transformation; the job
layer (kiji_mapreduce_spark.job) compiles and runs it.

Counters use ``DataFrame.observe`` — the Spark-native analogue of Hadoop
counters (``JobHistoryCounters.java:35``) that runs inside the job instead
of a second pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from kiji_mapreduce_spark.request import DataRequest


@dataclass
class OperatorContext:
    """Runtime context handed to operators: bound KV stores and config.

    ``stores`` maps store name -> KeyValueStore (see
    kiji_mapreduce_spark.kvstore); ``conf`` carries job configuration the
    way the reference carried ``kiji.*`` Configuration keys.
    """

    stores: dict[str, Any] = field(default_factory=dict)
    conf: dict[str, Any] = field(default_factory=dict)

    def get_store(self, name: str):
        if name not in self.stores:
            raise KeyError(
                f"store {name!r} not bound; declared stores must be bound "
                f"by the job builder (reference: UnconfiguredKeyValueStore)"
            )
        return self.stores[name]


class Operator:
    """Common base for the archetypes."""

    #: counter name prefix recorded into the job-history table
    COUNTER_PREFIX = "OPERATOR"

    def __init__(self, conf: dict[str, Any] | None = None):
        self.conf = conf or {}

    def data_request(self) -> DataRequest | None:
        """Columns to read (None = all). Compiled to a pruned projection
        that Catalyst pushes into the scan."""
        return None

    def required_stores(self) -> dict[str, Any]:
        """Declared side inputs: name -> default store (or ``None`` to
        force binding, like UnconfiguredKeyValueStore)."""
        return {}

    def setup(self, context: OperatorContext) -> None:  # pragma: no cover
        pass

    def cleanup(self, context: OperatorContext) -> None:  # pragma: no cover
        pass

    # -- helpers -----------------------------------------------------------
    def apply_request(self, df: DataFrame) -> DataFrame:
        req = self.data_request()
        return req.apply(df) if req is not None else df
