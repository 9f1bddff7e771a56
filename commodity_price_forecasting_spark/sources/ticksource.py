"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic tick feed — the extensibility lane for
sources Spark has no built-in reader for (internal feed handlers,
REST-paginated APIs, proprietary tick archives).

Scale design: ``partitions()`` returns ONE InputPartition per
instrument, so a 1000-instrument feed reads as 1000 parallel tasks —
the planner parallelism contract of the DataSource API; each task
generates/fetches only its own instrument's rows (no driver
materialization, no skew beyond per-instrument row counts).

Determinism: px is pure integer arithmetic
(``100 + instrument/2 + ((seq·9973) mod 1000)/100``) so an ANSI-SQL
oracle regenerates the identical feed from ``range()`` — no RNG, no
libm (sin/exp differ across engines at the last ulp).

The classes are defined inside a factory FUNCTION so cloudpickle
serializes them BY VALUE: the source works on executors that do not
have this package on PYTHONPATH (vanilla driver sessions included).
"""

from __future__ import annotations


def make_tick_source():
    """Return the TickSource DataSource class (function-scoped for
    by-value pickling)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class TickPartition(InputPartition):
        def __init__(self, instrument: int, n_rows: int):
            self.instrument = instrument
            self.n_rows = n_rows

    class TickReader(DataSourceReader):
        def __init__(self, options):
            self.n_instruments = int(options.get("instruments", "8"))
            self.n_rows = int(options.get("rows", "100"))

        def partitions(self):
            return [
                TickPartition(i, self.n_rows)
                for i in range(self.n_instruments)
            ]

        def read(self, partition):
            i = partition.instrument
            for seq in range(partition.n_rows):
                px = 100.0 + i / 2.0 + ((seq * 9973) % 1000) / 100.0
                yield (i, seq, px)

    class TickSource(DataSource):
        @classmethod
        def name(cls):
            return "ticks"

        def schema(self):
            return "instrument int, seq int, px double"

        def reader(self, schema):
            return TickReader(self.options)

    return TickSource


def register_tick_source(spark) -> None:
    """Idempotently register the ``ticks`` format on this session."""
    spark.dataSource.register(make_tick_source())
