"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The extension point for feeds Spark has no built-in connector for —
internal services, proprietary formats, synthetic generators — written in
pure Python but planned like any other source: the reader declares
InputPartitions, Spark schedules one task per partition, and the rows
enter the JVM through the same scan interface as parquet.

This instance generates a deterministic arithmetic row stream (no RNG, no
clock), so a SQL oracle can replay it exactly from `range()` — which is
what makes it differential-testable. At 100 TB the same shape holds: the
generator becomes a paginated service client, partitions map to shards or
key ranges, and parallelism is the partition count, not executor count.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SYNTH_ROWS = 50_000
SYNTH_PARTITIONS = 8
# Knuth multiplicative hash constant; products stay < 2^63 for i < ~3.4e9,
# so the same expression evaluates exactly in any 64-bit-integer engine.
SYNTH_MULT = 2654435761
SYNTH_MOD = 100_000
SYNTH_GROUPS = 53


class SynthRowsDataSource(DataSource):
    """`spark.read.format("t20_synth")` — deterministic synthetic rows."""

    @classmethod
    def name(cls) -> str:
        return "t20_synth"

    def schema(self) -> str:
        return "i bigint, grp int, amount bigint"

    def reader(self, schema) -> "SynthRowsReader":
        n = int(self.options.get("n", SYNTH_ROWS))
        return SynthRowsReader(n)

    def simpleStreamReader(self, schema) -> "SynthRowsStreamReader":
        n = int(self.options.get("n", SYNTH_ROWS))
        chunk = int(self.options.get("chunk", 10_000))
        return SynthRowsStreamReader(n, chunk)


class SynthRowsReader(DataSourceReader):
    def __init__(self, n: int) -> None:
        self.n = n

    def partitions(self):
        # contiguous index ranges — the "shard per partition" plan shape
        step = -(-self.n // SYNTH_PARTITIONS)
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        # Arrow fast path: one vectorized RecordBatch per partition instead
        # of 50k Python-tuple yields (~10× less per-row overhead; same
        # Arrow-batch transfer pandas UDFs use).
        import numpy as np
        import pyarrow as pa

        lo, hi = partition.value
        i = np.arange(lo, hi, dtype=np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i, type=pa.int64()),
                pa.array((i % SYNTH_GROUPS).astype(np.int32), type=pa.int32()),
                pa.array((i * SYNTH_MULT) % SYNTH_MOD, type=pa.int64()),
            ],
            names=["i", "grp", "amount"],
        )


class SynthRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same feed: the offset is the next row index,
    each microbatch drains up to `chunk` rows, and the stream is exhausted
    at n — so `trigger(availableNow=True)` terminates and the accumulated
    result must equal the batch read (pinned in tests/test_streaming.py).
    Checkpointed restarts resume from the committed offset dict, exactly
    like a paginated service client resuming from a cursor."""

    def __init__(self, n: int, chunk: int) -> None:
        self.n = n
        self.chunk = chunk

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.chunk, self.n)
        # a list-iterator: the prefetch path both next()s it and pickles it
        # (generators don't pickle; bare lists aren't iterators)
        rows = [
            (i, i % SYNTH_GROUPS, (i * SYNTH_MULT) % SYNTH_MOD)
            for i in range(lo, hi)
        ]
        return iter(rows), {"next": hi}
