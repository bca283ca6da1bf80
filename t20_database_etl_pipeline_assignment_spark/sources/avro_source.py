"""`spark.read.format("t20_avro")` — Avro container files via the custom
Python DataSource API, no spark-avro jar required.

Planning model (the 100 TB shape): the driver does a metadata-only pass
per file (avro_io.index_blocks — ~20 bytes per block, never the data),
then emits one InputPartition per GROUP of container blocks. Avro blocks
are natural split points (length-prefixed, sync-terminated), so a single
huge container file scans in parallel — the same block-level splitting
the JVM connector does, and the opposite of the gzip-CSV unsplittable
trap (io_ops.scan_csv_gzip docstring). Records cross into the JVM as
Arrow RecordBatches, one per block group, not per-row Python tuples.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from . import avro_io

DEFAULT_BLOCKS_PER_SPLIT = 8


def _arrow_type(schema):
    import pyarrow as pa

    if isinstance(schema, str):
        return {
            "boolean": pa.bool_(),
            "int": pa.int32(),
            "long": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
            "bytes": pa.binary(),
            "string": pa.string(),
        }[schema]
    if isinstance(schema, list):
        other = [b for b in schema if b != "null"]
        return _arrow_type(other[0])
    t = schema["type"]
    if t in avro_io._PRIMITIVES:
        return _arrow_type(t)
    if t == "record":
        return pa.struct(
            [(f["name"], _arrow_type(f["type"])) for f in schema["fields"]]
        )
    if t == "enum":
        return pa.string()
    if t == "fixed":
        return pa.binary()
    if t == "array":
        return pa.list_(_arrow_type(schema["items"]))
    if t == "map":
        return pa.map_(pa.string(), _arrow_type(schema["values"]))
    raise NotImplementedError(f"avro: type {t!r}")


def _arrow_schema(schema: dict):
    import pyarrow as pa

    return pa.schema([(f["name"], _arrow_type(f["type"])) for f in schema["fields"]])


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.avro")))
    hits = sorted(glob.glob(path))
    if not hits:
        raise FileNotFoundError(f"t20_avro: no files match {path!r}")
    return hits


class AvroContainerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "t20_avro"

    def _paths(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise ValueError("t20_avro: .load(path) is required")
        return _expand(path)

    def schema(self) -> str:
        first = self._paths()[0]
        with open(first, "rb") as f:
            schema, _, _, _ = avro_io._read_header(f)
        return avro_io.spark_ddl(schema)

    def reader(self, schema) -> "AvroContainerReader":
        return AvroContainerReader(
            self._paths(),
            int(self.options.get("blocks_per_split", DEFAULT_BLOCKS_PER_SPLIT)),
        )


class AvroContainerReader(DataSourceReader):
    def __init__(self, paths: list[str], blocks_per_split: int) -> None:
        self.paths = paths
        self.blocks_per_split = max(1, blocks_per_split)

    def partitions(self):
        splits = []
        for p in self.paths:
            schema, codec, _, blocks = avro_io.index_blocks(p)
            sj = json.dumps(schema)
            for lo in range(0, len(blocks), self.blocks_per_split):
                splits.append(
                    InputPartition(
                        (p, codec, sj, blocks[lo : lo + self.blocks_per_split])
                    )
                )
            # valid header-only container (zero blocks): one split carrying
            # zero blocks so the scan yields a correctly-typed empty result
            if not blocks:
                splits.append(InputPartition((p, codec, sj, [])))
        return splits

    def read(self, partition: InputPartition):
        import pyarrow as pa

        path, codec, schema_json, blocks = partition.value
        schema = json.loads(schema_json)
        arrow = _arrow_schema(schema)
        if not blocks:  # header-only container: one empty, typed batch
            yield pa.RecordBatch.from_pylist([], schema=arrow)
            return
        for offset, n_rec, n_bytes in blocks:
            data = avro_io.read_block(path, codec, offset, n_bytes)
            records = avro_io.decode_block(data, schema, n_rec)
            yield pa.RecordBatch.from_pylist(records, schema=arrow)
