"""Custom Python DataSource (Spark 4 API) for the tick stream — T1 as a
first-class source instead of a rate-source adaptation.

The reference's stream is a 1 Hz poll loop pushing one record at a time
(reference src/ingest_strem_btc.py:44-58). The DataSource API is where
that fetch belongs in Spark 4: the engine owns offsets, replay, and
exactly-once; the source only answers "give me records from offset X".
The fetch here is the engine's deterministic synthetic price (a pure
function of the tick index) so offsets replay identically; a production
deployment swaps ``_tick_row`` for the real API call and keeps the
offset/replay contract.

Like ``table_source.py``, the class is built inside a factory so
cloudpickle ships it BY VALUE: Spark unpickles registered DataSource
classes in python workers that cannot import this package under the
round driver's file-path loading (a module-level class here dies with
ModuleNotFoundError on the batch-read path, which runs on executors).

Usage::

    spark.dataSource.register(TickDataSource)
    ticks = spark.readStream.format("b3_ticks")
        .option("ticks_per_batch", "100").load()
    df = spark.read.format("b3_ticks").option("n_ticks", "1000").load()
"""

from __future__ import annotations


def build_tick_source():
    """Return the (by-value-picklable) tick DataSource class."""
    import datetime as dt

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        SimpleDataSourceStreamReader,
    )

    # fixed epoch so every offset maps to one reproducible event time
    base = dt.datetime(2025, 8, 1, 0, 0, 0)

    def _splitmix64(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return x ^ (x >> 31)

    def _tick_row(i: int, base_price: float = 600_000.0):
        """Pure function offset → (event_time, price): the deterministic
        stand-in for the API fetch (same drift+jitter shape as
        sources.synthetic_price, different hash — values differ)."""
        import math

        jitter = (_splitmix64(i) % 20_000 - 10_000) / 100.0
        drift = math.sin(i / 600.0) * 5_000.0
        return (
            base + dt.timedelta(seconds=i),
            round(base_price + drift + jitter, 2),
        )

    class _TickBatchReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n_ticks", "1000"))

        def read(self, partition):
            for i in range(self.n):
                yield _tick_row(i)

    class _TickStreamReader(SimpleDataSourceStreamReader):
        """Offset = next tick index. ``read`` advances by
        ticks_per_batch; ``readBetweenOffsets`` replays any committed
        range bit-identically — that replayability is what upgrades the
        reference's at-least-once delivery to exactly-once."""

        def __init__(self, options):
            self.per_batch = int(options.get("ticks_per_batch", "10"))

        def initialOffset(self) -> dict:
            return {"next": 0}

        def read(self, start: dict):
            lo = start["next"]
            hi = lo + self.per_batch
            return iter([_tick_row(i) for i in range(lo, hi)]), {"next": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(
                [_tick_row(i) for i in range(start["next"], end["next"])]
            )

    class TickDataSource(DataSource):
        """``format("b3_ticks")`` — batch and streaming tick generator."""

        @classmethod
        def name(cls) -> str:
            return "b3_ticks"

        def schema(self) -> str:
            return "data_hora timestamp, preco_brl double"

        def reader(self, schema) -> DataSourceReader:
            return _TickBatchReader(self.options)

        def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
            return _TickStreamReader(self.options)

    return TickDataSource


# factory-instantiated: qualname points into function locals, so
# cloudpickle serializes the class by value for the workers
TickDataSource = build_tick_source()
