"""The engine's query suite over the driver's test tables.

Each entry exercises a specific operator from SURVEY.md §2 through the
engine's own API (operators / kv stores / cells / pipeline modules) and has
a DuckDB-equivalent oracle SQL (except genuinely non-SQL-expressible ops,
which are flagged rows-only).

Package layout (split from the former 3k-line suite.py, r5 verdict ask
#7 — a pure move, registry order and hashes unchanged):

- ``common``               shared session hardening + table readers
- ``queries_table``        operator archetypes, kv stores, versioned cells
- ``queries_relational``   joins / aggs / windows / set ops / as-of / range
- ``queries_events``       event-table analytics
- ``queries_text``         text analysis + search + multimodal
- ``queries_dedup``        dedup / decontamination / curation
- ``queries_vectors``      KNN / clustering / PageRank / classifier gate
- ``queries_sample_sketch`` sampling, mixtures, sketches
- ``queries_streaming``    Structured Streaming twins
- ``registry``             QUERIES / FIRST_WINDOW_REQUIRED / ORACLES

Conventions for oracle hash-matching:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (sums -> 2 dp, ratios/avgs -> 4 dp) so
  accumulation-order FP noise cannot flip the value hash;
- timestamps cross the engine boundary as epoch milliseconds
  (``unix_millis`` / ``epoch_ms``);
- int casts that truncate use explicit ``floor`` in both dialects
  (Spark casts truncate; DuckDB casts round).
"""

from __future__ import annotations

from kiji_mapreduce_spark.suite.common import (  # noqa: F401
    _ensure_session_conf, _events, _t,
)
from kiji_mapreduce_spark.suite.queries_dedup import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_events import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_relational import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_sample_sketch import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_streaming import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_table import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_text import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.queries_vectors import *  # noqa: F401,F403
from kiji_mapreduce_spark.suite.registry import (  # noqa: F401
    FIRST_WINDOW_REQUIRED, NEW_PENDING_WINDOW, ORACLES, QUERIES,
    STAGED, STAGED_ORACLES,
)
