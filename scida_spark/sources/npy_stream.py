"""Streaming npy source: tail a growing on-disk array as micro-batches.

Completes the custom-source story (SURVEY §2.7 is net-new capability):
the same npy-dir layout the batch source reads (sources/npy.py) exposed
through Spark 4's ``SimpleDataSourceStreamReader`` — each trigger reads
the rows appended since the last committed offset, so a simulation
writing snapshots row-by-row (or a pipeline appending documents) can be
consumed incrementally with the full Structured Streaming machinery
(windows, watermarks, stateful ops) downstream.

Offsets are ``{"row": n}`` — exactly-once via Spark's offset log: on
restart, ``readBetweenOffsets`` replays the committed range
deterministically from the immutable rows on disk.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from scida_spark.sources.npy import discover_schema


class NpyStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, rows_per_batch: int):
        self.path = path
        self.schema_ = schema
        self.rows_per_batch = rows_per_batch
        self.fields = [f.name for f in schema.fields if f.name != "uid"]
        # Last row count successfully observed on disk. A torn read
        # (writer mid-`np.save`, truncated npy header) falls back to
        # this so the trigger is a no-op instead of killing the query.
        self._last_rows = 0

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"row": 0}

    def _current_rows(self) -> int:
        # Re-discover on every trigger: the array may have grown
        # (writers replace the .npy files with longer ones). A writer
        # SHOULD publish atomically (tmp file + os.replace), but a
        # production tailing source must survive one that doesn't:
        # any parse/IO error here just means "no new rows this
        # trigger" — the offset stays put and the next trigger retries.
        try:
            _, nrows, _ = discover_schema(self.path)
        except Exception:
            return self._last_rows
        self._last_rows = max(self._last_rows, nrows)
        return nrows

    def _read_range(self, lo: int, hi: int, strict: bool = False):
        # Returns a LIST: the runtime pickles the prefetched batch into
        # its offset cache for replay, so a generator won't do.
        #
        # ``strict`` is the replay contract: the forward ``read()``
        # path may swallow a torn read (the offset simply doesn't
        # advance and the next trigger retries), but
        # ``readBetweenOffsets`` replays a COMMITTED range — silently
        # returning fewer rows there would permanently DROP committed
        # rows from the recovered stream. In strict mode any load
        # failure or short field raises, so Spark fails/retries the
        # task instead of committing an empty or truncated replay.
        if hi <= lo:
            return []
        arrays = {}
        try:
            for name in self.fields:
                arrays[name] = np.load(
                    os.path.join(self.path, name + ".npy"), mmap_mode="r"
                )
        except Exception:
            if strict:
                raise
            # Torn header mid-replace on the FORWARD path: treat as
            # "nothing new yet" — the offset stays put and the next
            # trigger retries.
            return []
        # Writers replace field files one at a time (non-atomic): clamp
        # to the shortest field actually on disk so a mid-update trigger
        # reads a consistent prefix instead of crashing; the remainder
        # arrives with the next trigger.
        shortest = min(a.shape[0] for a in arrays.values())
        if strict and shortest < hi:
            raise IOError(
                f"npy stream replay: committed range [{lo},{hi}) but field "
                f"files hold only {shortest} rows — refusing to truncate a "
                "committed replay (retry will see the writer's update land)"
            )
        hi = min(hi, shortest)
        if hi <= lo:
            return []
        arrays = {name: a[lo:hi] for name, a in arrays.items()}
        out = []
        for i in range(hi - lo):
            row = [lo + i]
            for name in self.fields:
                v = arrays[name][i]
                row.append(v.tolist() if getattr(v, "ndim", 0) else v.item())
            out.append(tuple(row))
        return out

    def read(self, start: dict):
        lo = start["row"]
        hi = min(self._current_rows(), lo + self.rows_per_batch)
        # iter() over a materialized list: the runtime drives it as an
        # iterator but pickles the MATERIALIZED rows into its prefetch
        # cache (a bare generator fails pickling; a bare list fails
        # next()). The committed offset advances by the rows ACTUALLY
        # read — _read_range may clamp below ``hi`` mid-writer-update.
        rows = self._read_range(lo, hi)
        return iter(rows), {"row": lo + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(self._read_range(start["row"], end["row"], strict=True))

    def commit(self, end: dict) -> None:
        pass  # rows are immutable on disk; nothing to clean up


class NpyStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npystream"

    def schema(self) -> StructType:
        schema, _, _ = discover_schema(self.options["path"])
        return schema

    def simpleStreamReader(self, schema: StructType) -> NpyStreamReader:  # noqa: N802
        return NpyStreamReader(
            self.options["path"], schema, int(self.options.get("rows_per_batch", 1 << 16))
        )


def register(spark) -> None:
    spark.dataSource.register(NpyStreamDataSource)
