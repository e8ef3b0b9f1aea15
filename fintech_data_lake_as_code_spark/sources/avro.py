"""Pure-Python Avro object-container codec behind the Spark 4 Python
DataSource API.

The `avro` lake format is the one mainstream format whose Spark
datasource is an EXTERNAL module (spark-avro): pyspark bundles the
avro-*.jar core libraries but not the datasource, and a no-network
environment cannot fetch it — which is why `scan_avro` was
environment-gated for eleven rounds. This module closes that gap from
first principles: a from-scratch implementation of the Avro object
container file format (the public Apache Avro 1.x specification —
magic `Obj\\x01`, metadata map carrying `avro.schema`/`avro.codec`,
16-byte sync-marker-delimited blocks, zigzag-varint primitives) exposed
as a `pyavro` batch DataSource with a partition-parallel reader (one
input partition per container file, rows decoded executor-side) and a
writer (one container file per task). Codecs: null and deflate (raw
DEFLATE per spec, stdlib zlib) — snappy/zstandard need external libs
and belong to the native module; the reader refuses them loudly.

Supported schema subset: a record of primitive fields (long, int,
double, float, string, boolean, bytes), each written as the nullable
union `["null", T]` exactly like spark-avro writes nullable columns —
so files written here are readable by any Avro implementation and vice
versa. `tests/test_fixtures_contract.py` differentially certifies both
directions against the JVM's bundled org.apache.avro reference
implementation (write here / read there, write there / read here).

IO note: Python DataSource workers run outside the JVM, so there is no
Hadoop FileSystem handle executor-side — file IO is plain `open()`,
which on a cluster means the format's paths must be on a
POSIX-reachable mount (or an fsspec adapter slotted into `_open`); the
native spark-avro module remains the right choice where its jar is
loadable (`operators/scale.py::scan_avro` probes and prefers it).
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Iterator

MAGIC = b"Obj\x01"
# Per spec the sync marker is any 16 bytes, unique per writer instance;
# a fixed deterministic marker keeps files byte-reproducible
SYNC = bytes.fromhex("73706172:6b2d6772:61667420:61767231".replace(":", ""))
BLOCK_ROWS = 1000

# spark simpleString type <-> avro primitive type
_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_SPARK = {v: k for k, v in _SPARK_TO_AVRO.items()}


def _arrow_type(spark_type: str):
    """pyarrow type for a supported spark simpleString type (r22 Arrow
    marshalling; import deferred so the codec half of this module stays
    importable without pyarrow)."""
    import pyarrow as pa

    return {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
    }[spark_type]


# rows per Arrow record batch on the read side: large enough to amortize
# the per-batch conversion, small enough to bound worker memory on wide
# binary rows (guide S4.2's maxRecordsPerBatch rationale, applied to the
# source side)
ARROW_BATCH_ROWS = 8192


# --- primitive encoders/decoders (Avro binary encoding, public spec) ---------


def _write_long(out: bytearray, v: int) -> None:
    # Avro long is 64-bit; a Python int outside the range would zigzag
    # into an over-long varint that reference readers reject or misread
    # — refuse it loudly (write_container is also a public tooling API)
    if not -(1 << 63) <= v < (1 << 63):
        raise ValueError(f"value {v} outside the 64-bit Avro long range")
    u = (v << 1) ^ (v >> 63)  # zigzag; arithmetic shift handles the sign
    while u > 0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _write_value(out: bytearray, avro_type: str, v) -> None:
    if avro_type == "long":
        _write_long(out, int(v))
    elif avro_type == "int":
        # avro int is 32-bit: the same over-long-varint hazard as long
        # — the reference reader's readInt() rejects >5-byte varints
        iv = int(v)
        if not -(1 << 31) <= iv < (1 << 31):
            raise ValueError(
                f"value {iv} outside the 32-bit Avro int range"
            )
        _write_long(out, iv)
    elif avro_type == "double":
        out += struct.pack("<d", float(v))
    elif avro_type == "float":
        out += struct.pack("<f", float(v))
    elif avro_type == "string":
        b = v.encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif avro_type == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    elif avro_type == "boolean":
        out.append(1 if v else 0)
    else:
        raise ValueError(f"unsupported avro type {avro_type!r}")


def _read_value(buf: bytes, pos: int, avro_type: str):
    if avro_type in ("long", "int"):
        return _read_long(buf, pos)
    if avro_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if avro_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if avro_type == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if avro_type == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if avro_type == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported avro type {avro_type!r}")


# --- container files ----------------------------------------------------------


def schema_json(fields: list[tuple[str, str]], name: str = "spark_row") -> str:
    """Avro record schema for (name, avro primitive type) fields — every
    field a nullable union, the way spark-avro maps nullable columns."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": ["null", t]} for n, t in fields],
        }
    )


def _union_base(t) -> str:
    """Base primitive of a field type that may be `T` or `["null", T]`."""
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) == 1 and isinstance(non_null[0], str):
            return non_null[0]
    raise ValueError(f"unsupported avro field type {t!r}")


def parse_schema(text: str) -> list[tuple[str, str, bool]]:
    """(name, base type, nullable) per field of a record schema."""
    sch = json.loads(text)
    if sch.get("type") != "record":
        raise ValueError(f"not a record schema: {text[:80]}")
    return [
        (
            f["name"],
            _union_base(f["type"]),
            isinstance(f["type"], list) and "null" in f["type"],
        )
        for f in sch["fields"]
    ]


def write_container(
    path: str, fields: list[tuple[str, str]], rows, codec: str = "null"
) -> int:
    """Write rows (tuples, field order) as one Avro object container
    file with the null or deflate codec. Returns the row count."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported write codec {codec!r}")
    header = bytearray()
    header += MAGIC
    meta = [
        ("avro.schema", schema_json(fields).encode("utf-8")),
        ("avro.codec", codec.encode()),
    ]
    _write_long(header, len(meta))
    for k, v in meta:
        _write_value(header, "string", k)
        _write_value(header, "bytes", v)
    _write_long(header, 0)  # map terminator
    header += SYNC

    n_total = 0
    with open(path, "wb") as fh:
        fh.write(bytes(header))
        block = bytearray()
        n_block = 0

        def flush() -> None:
            nonlocal block, n_block
            if not n_block:
                return
            data = bytes(block)
            if codec == "deflate":
                import zlib

                co = zlib.compressobj(wbits=-15)
                data = co.compress(data) + co.flush()
            head = bytearray()
            _write_long(head, n_block)
            _write_long(head, len(data))
            fh.write(bytes(head))
            fh.write(data)
            fh.write(SYNC)
            block, n_block = bytearray(), 0

        for row in rows:
            for (name, t), v in zip(fields, row):
                if v is None:
                    _write_long(block, 0)  # union branch: null
                else:
                    _write_long(block, 1)  # union branch: T
                    _write_value(block, t, v)
            n_block += 1
            n_total += 1
            if n_block >= BLOCK_ROWS:
                flush()
        flush()
    return n_total


def _read_long_fh(fh) -> int | None:
    """Varint zigzag long read directly off a file handle; None at EOF
    (only legal between blocks)."""
    u, shift = 0, 0
    while True:
        b = fh.read(1)
        if not b:
            if shift == 0:
                return None
            raise ValueError("truncated varint at end of file")
        byte = b[0]
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return (u >> 1) ^ -(u & 1)
        shift += 7


def _read_exact(fh, n: int | None, what: str) -> bytes:
    if n is None:
        raise ValueError(f"truncated container: missing length before {what}")
    b = fh.read(n)
    if len(b) != n:
        raise ValueError(f"truncated container: {what} ({len(b)}/{n}B)")
    return b


def read_container(path: str):
    """Yield (fields, row) decoding of one container file: first item is
    the parsed field list, subsequent items are row tuples. Streams
    block by block — memory is one (decompressed) block, never the
    file, so driver-side header reads (schema inference) and multi-GB
    containers both stay cheap."""
    with open(path, "rb") as fh:
        if _read_exact(fh, 4, "magic") != MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta = {}
        while True:
            n = _read_long_fh(fh)
            if n is None:
                raise ValueError(f"{path}: truncated metadata map")
            if n == 0:
                break
            if n < 0:  # spec: negative count carries a byte size next
                n = -n
                _read_long_fh(fh)
            for _ in range(n):
                klen = _read_long_fh(fh)
                k = _read_exact(fh, klen, "meta key").decode("utf-8")
                vlen = _read_long_fh(fh)
                meta[k] = _read_exact(fh, vlen, "meta value")
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(
                f"{path}: codec {codec!r} not supported by the fallback "
                "reader (null and deflate are; use the native spark-avro "
                "module for snappy/zstandard)"
            )
        fields = parse_schema(meta["avro.schema"].decode("utf-8"))
        sync = _read_exact(fh, 16, "sync marker")
        yield fields
        while True:
            n_rows = _read_long_fh(fh)
            if n_rows is None:
                return  # clean EOF between blocks
            size = _read_long_fh(fh)
            block = _read_exact(fh, size, "block data")
            if codec == "deflate":
                # per spec: raw DEFLATE, no zlib header/checksum
                import zlib

                block = zlib.decompress(block, -15)
            bpos, bend = 0, len(block)
            for _ in range(n_rows):
                row = []
                for _, t, nullable in fields:
                    if nullable:
                        branch, bpos = _read_long(block, bpos)
                        if branch == 0:
                            row.append(None)
                            continue
                    v, bpos = _read_value(block, bpos, t)
                    row.append(v)
                yield tuple(row)
            if bpos != bend:
                raise ValueError(
                    f"{path}: block decoded {bpos}B of {bend}B declared"
                )
            if _read_exact(fh, 16, "block sync") != sync:
                raise ValueError(f"{path}: sync marker mismatch after block")


# --- the pyavro DataSource ----------------------------------------------------


def _container_paths(root: str, require_commit: bool = True) -> list[str]:
    """Container files under `root` (or `root` itself if it's a file).

    A DIRECTORY must carry the `_SUCCESS` commit marker: the pyavro
    writer clears the target then writes one file per task, so a failed
    job leaves a partial file set behind — listing it would silently
    serve a fraction of the rows as a valid dataset. Directories
    written by other tools (no marker convention) opt out with the
    `commitMarker=false` read option."""
    if os.path.isfile(root):
        return [root]
    if require_commit and not os.path.exists(os.path.join(root, "_SUCCESS")):
        raise ValueError(
            f"{root}: no _SUCCESS commit marker — the directory is an "
            "uncommitted/failed write (rerun it), or was produced by a "
            "tool without the marker convention (read with "
            ".option('commitMarker', 'false'))"
        )
    return sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".avro")
    )


def _require_commit(options) -> bool:
    return str(options.get("commitMarker", "true")).lower() != "false"


def register_pyavro(spark) -> None:
    """Register the `pyavro` batch format on this session (idempotent)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        InputPartition,
        WriterCommitMessage,
    )

    class _FilePart(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _Reader(DataSourceReader):
        def __init__(self, options, schema):
            self.root = options["path"]
            self.require_commit = _require_commit(options)
            # the read schema Spark will bind the yielded tuples to,
            # POSITIONALLY — each file's decoded rows must be reordered
            # to match it (a user-supplied .schema(...) or a directory
            # of heterogeneously-ordered foreign files would otherwise
            # silently bind values to the wrong columns)
            self.expected = [
                (f.name, f.dataType.simpleString()) for f in schema.fields
            ]
            # r22 (guide S4): rows crossed the Python->JVM boundary as
            # pickled tuples — per-row marshalling measured as the
            # dominant cost of the round-trip (the decode itself is
            # ~0.6 core-s). Batch them through Arrow instead; the file
            # decode is unchanged, only the boundary format. The "rows"
            # escape hatch remains for A/B and for environments without
            # pyarrow (which pyspark itself requires, so default arrow).
            self.arrow = str(options.get("marshal", "arrow")) != "rows"

        def partitions(self):
            # one task per container file — the same parallelism contract
            # as file splits (avro blocks are further splittable by sync
            # marker; per-file is the honest granularity for a fallback)
            return [
                _FilePart(p)
                for p in _container_paths(self.root, self.require_commit)
            ]

        def read(self, part):
            # close the container generator on EVERY exit — the schema
            # validation below raises on name/type mismatch, and an
            # unclosed generator pins the open file handle until GC
            it = read_container(part.path)
            try:
                fields = next(it)  # this FILE's header field order
                by_name = {n: (j, t) for j, (n, t, _) in enumerate(fields)}
                idx = []
                for name, spark_type in self.expected:
                    if name not in by_name:
                        raise ValueError(
                            f"{part.path}: field {name!r} required by the "
                            f"read schema is absent (file has "
                            f"{sorted(by_name)})"
                        )
                    j, avro_t = by_name[name]
                    want = _AVRO_TO_SPARK.get(avro_t)
                    if want != spark_type:
                        raise ValueError(
                            f"{part.path}: field {name!r} is avro {avro_t!r} "
                            f"({want}), read schema wants {spark_type!r}"
                        )
                    idx.append(j)
                if idx == list(range(len(fields))):
                    rows = it
                else:
                    rows = (tuple(r[j] for j in idx) for r in it)
                if not self.arrow:
                    yield from rows
                    return
                import pyarrow as pa

                schema = pa.schema(
                    [(n, _arrow_type(t)) for n, t in self.expected]
                )
                buf = []
                for row in rows:
                    buf.append(row)
                    if len(buf) >= ARROW_BATCH_ROWS:
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array([r[i] for r in buf], schema.types[i])
                                for i in range(len(self.expected))
                            ],
                            schema=schema,
                        )
                        buf = []
                if buf:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array([r[i] for r in buf], schema.types[i])
                            for i in range(len(self.expected))
                        ],
                        schema=schema,
                    )
            finally:
                it.close()

    class _Writer(DataSourceArrowWriter):
        def __init__(self, options, schema, overwrite):
            import uuid

            self.root = options["path"]
            self.fields = [
                (f.name, _SPARK_TO_AVRO[f.dataType.simpleString()])
                for f in schema.fields
            ]
            # job-scoped filename component, fixed driver-side: part
            # files are part-<partition>-<job>.avro, so (a) an APPEND
            # job can never clobber a previous job's same-numbered
            # files, and (b) a RETRIED task (same partition, same job)
            # still overwrites its own attempt idempotently.
            self.job = uuid.uuid4().hex[:8]
            # driver-side, once per write job: implement overwrite here —
            # the Python datasource API delegates mode semantics to the
            # source (commit() later drops the _SUCCESS marker)
            import shutil

            if overwrite:
                shutil.rmtree(self.root, ignore_errors=True)
            os.makedirs(self.root, exist_ok=True)

        def write(self, batches: Iterator) -> WriterCommitMessage:
            # r22 (guide S4): rows used to arrive as pickled Rows — the
            # JVM->Python marshalling dominated the write side the same
            # way it did the read side. This writer subclasses
            # DataSourceArrowWriter, so batches arrive as Arrow record
            # batches and feed the SAME write_container encoder with
            # tuples: the container bytes are identical to the old Row
            # path (same field order; to_pylist yields the same Python
            # value types int/float/str/bytes/bool/None — differentially
            # re-certified against org.apache.avro by tests).
            from pyspark import TaskContext

            def rows():
                for batch in batches:
                    cols = [c.to_pylist() for c in batch.columns]
                    yield from zip(*cols)

            pid = TaskContext.get().partitionId()
            final = os.path.join(
                self.root, f"part-{pid:05d}-{self.job}.avro"
            )
            # task-attempt temp + atomic rename: a retried task must not
            # leave a torn container behind the final name
            tmp = final + f".inprogress-{os.getpid()}"
            write_container(tmp, self.fields, rows())
            os.replace(tmp, final)
            return WriterCommitMessage()

        def commit(self, messages) -> None:
            with open(os.path.join(self.root, "_SUCCESS"), "w"):
                pass

        def abort(self, messages) -> None:
            # drop this job's part files so an appending job that fails
            # cannot leave its fragments next to the previous commit
            # (overwrite-mode data loss is inherent to destroy-then-
            # write; the _SUCCESS gate makes THAT loud at read time)
            for f in os.listdir(self.root):
                if self.job in f:
                    try:
                        os.remove(os.path.join(self.root, f))
                    except OSError:
                        pass

    class AvroFallbackSource(DataSource):
        @classmethod
        def name(cls):
            return "pyavro"

        def schema(self):
            # self-describing format: the schema lives in the container
            # header (like a parquet footer) — the streaming reader only
            # pulls the header bytes driver-side, never the file
            paths = _container_paths(
                self.options["path"], _require_commit(self.options)
            )
            if not paths:
                raise FileNotFoundError(
                    f"no .avro container files under {self.options['path']!r}"
                )
            it = read_container(paths[0])
            fields = next(it)
            it.close()
            # backtick-quote the names: an Avro field named like a SQL
            # reserved word (`order`, `select`) or carrying
            # non-identifier characters must still parse as DDL
            return ", ".join(
                "`{}` {}".format(n.replace("`", "``"), _AVRO_TO_SPARK[t])
                for n, t, _ in fields
            )

        def reader(self, schema):
            return _Reader(self.options, schema)

        def writer(self, schema, overwrite):
            return _Writer(self.options, schema, overwrite)

    spark.dataSource.register(AvroFallbackSource)
