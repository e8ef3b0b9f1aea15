"""The pure-Python Avro fallback (sources/avro.py): codec round-trip
properties, the pyavro DataSource contract, and — the load-bearing part —
byte-level SPEC COMPATIBILITY certified differentially against the JVM's
bundled org.apache.avro reference implementation (pyspark ships
avro-1.12 core even though the spark-avro datasource is absent): files
we write must read back identically through the reference reader, and
files the reference writes must read back identically through ours."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fintech_data_lake_as_code_spark.sources.avro import (
    read_container,
    register_pyavro,
    schema_json,
    write_container,
)

FIELDS = [("k", "long"), ("s", "string"), ("v", "double"), ("b", "boolean")]

row_st = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.one_of(st.none(), st.text(max_size=20)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=True, width=64),
    ),
    st.one_of(st.none(), st.booleans()),
)


@given(st.lists(row_st, max_size=50))
@settings(max_examples=50, deadline=None)
def test_codec_roundtrip_is_identity(tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    n = write_container(path, FIELDS, rows)
    it = read_container(path)
    fields = next(it)
    assert [(f[0], f[1]) for f in fields] == FIELDS
    assert list(it) == rows and n == len(rows)


def _jvm_read(spark, path):
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    rows = []
    while reader.hasNext():
        rec = reader.__next__() if hasattr(reader, "__next__") else reader.next()
        vals = []
        for name, _ in FIELDS:
            v = rec.get(name)
            # avro strings come back as org.apache.avro.util.Utf8
            if v is not None and not isinstance(v, (int, float, bool, str)):
                v = v.toString()
            vals.append(v)
        rows.append(tuple(vals))
    reader.close()
    return rows


def test_our_files_read_back_through_the_reference_jvm_reader(spark, tmp_path):
    rows = [
        (1, "abc", 1.5, True),
        (-(2**62), "", -0.0, False),
        (None, None, None, None),
        (7, "héllo wörld", 2.25, None),
    ]
    path = str(tmp_path / "ours.avro")
    write_container(path, FIELDS, rows)
    assert _jvm_read(spark, path) == rows


def test_reference_jvm_files_read_back_through_our_decoder(spark, tmp_path):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json(FIELDS))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    path = str(tmp_path / "theirs.avro")
    writer.create(schema, jvm.java.io.File(path))
    # long values stay OUTSIDE int32 range: py4j boxes a Python int as
    # java.lang.Integer when it fits, and Integer is "not in union
    # [null, long]" for the reference writer
    rows = [
        (2**40 + 5, "ref", 0.125, True),
        (-(2**40) - 1, None, 1e300, False),
        (None, "only-string", None, None),
    ]
    for k, s, v, b in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("k", k)
        rec.put("s", s)
        rec.put("v", v)
        rec.put("b", b)
        writer.append(rec)
    writer.close()
    it = read_container(path)
    next(it)
    assert list(it) == rows


def test_pyavro_datasource_roundtrip_and_parallelism(spark, tmp_path):
    register_pyavro(spark)
    df = spark.createDataFrame(
        [(i, f"s{i}", i * 1.25, i % 2 == 0) for i in range(2500)],
        "k bigint, s string, v double, b boolean",
    )
    out = str(tmp_path / "ds")
    df.repartition(4).write.format("pyavro").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("pyavro").load(out)
    # one read task per container file — the format's parallelism unit
    assert back.rdd.getNumPartitions() == 4
    assert back.schema.simpleString() == df.schema.simpleString()
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    # overwrite replaces, never appends
    df.limit(10).repartition(1).write.format("pyavro").mode(
        "overwrite"
    ).save(out)
    assert spark.read.format("pyavro").load(out).count() == 10


def test_deflate_containers_interop_both_directions(spark, tmp_path):
    # deflate (raw DEFLATE per spec) is the codec real avro files
    # mostly use — certify it differentially like the null codec
    rows = [(2**40 + i, f"row {i}", i * 0.5, i % 3 == 0) for i in range(2200)]
    ours = str(tmp_path / "ours-deflate.avro")
    write_container(ours, FIELDS, rows, codec="deflate")
    assert _jvm_read(spark, ours) == rows

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json(FIELDS))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    theirs = str(tmp_path / "theirs-deflate.avro")
    writer.create(schema, jvm.java.io.File(theirs))
    for k, s, v, b in rows[:500]:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("k", k)
        rec.put("s", s)
        rec.put("v", v)
        rec.put("b", b)
        writer.append(rec)
    writer.close()
    it = read_container(theirs)
    next(it)
    assert list(it) == rows[:500]


def test_pyavro_refuses_unknown_codecs(tmp_path):
    # snappy/zstandard need external libraries: the reader must refuse
    # loudly, never misdecode. Build a snappy-tagged header with the
    # module's own primitives.
    from fintech_data_lake_as_code_spark.sources import avro as A

    path = str(tmp_path / "snappy.avro")
    header = bytearray()
    header += A.MAGIC
    meta = [
        ("avro.schema", schema_json(FIELDS).encode()),
        ("avro.codec", b"snappy"),
    ]
    A._write_long(header, len(meta))
    for k, v in meta:
        A._write_value(header, "string", k)
        A._write_value(header, "bytes", v)
    A._write_long(header, 0)
    header += A.SYNC
    with open(path, "wb") as fh:
        fh.write(bytes(header))
    with pytest.raises(ValueError, match="snappy"):
        next(read_container(path))


def test_pyavro_append_accumulates_without_clobbering(spark, tmp_path):
    register_pyavro(spark)
    df1 = spark.createDataFrame(
        [(i, "a", 1.0, True) for i in range(100)],
        "k bigint, s string, v double, b boolean",
    )
    df2 = spark.createDataFrame(
        [(i, "b", 2.0, False) for i in range(100, 150)],
        "k bigint, s string, v double, b boolean",
    )
    out = str(tmp_path / "appended")
    df1.repartition(4).write.format("pyavro").mode("overwrite").save(out)
    # same partition numbering as the first job — job-scoped filenames
    # must keep both file sets
    df2.repartition(4).write.format("pyavro").mode("append").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.count() == 150
    both = df1.unionByName(df2)
    assert back.exceptAll(both).count() == 0
    assert both.exceptAll(back).count() == 0


def test_pyavro_read_refuses_uncommitted_directories(spark, tmp_path):
    # a failed/partial write leaves part files but no _SUCCESS: reading
    # it must fail loudly, not silently serve a fraction of the rows —
    # unless the caller opts out for foreign-written directories
    register_pyavro(spark)
    out = tmp_path / "torn"
    out.mkdir()
    write_container(
        str(out / "part-00000.avro"), FIELDS, [(1, "x", 1.0, True)]
    )
    with pytest.raises(Exception, match="_SUCCESS|commit"):
        spark.read.format("pyavro").load(str(out)).collect()
    ok = (
        spark.read.format("pyavro")
        .option("commitMarker", "false")
        .load(str(out))
    )
    assert ok.count() == 1


def test_pyavro_binds_columns_by_name_across_field_orders(spark, tmp_path):
    # two foreign files with the SAME fields in DIFFERENT header order:
    # the reader must bind each file's values to the read schema by
    # NAME, never positionally (ADVICE r12)
    register_pyavro(spark)
    out = tmp_path / "mixed"
    out.mkdir()
    write_container(
        str(out / "a.avro"), [("k", "long"), ("s", "string")], [(1, "one")]
    )
    write_container(
        str(out / "b.avro"), [("s", "string"), ("k", "long")], [("two", 2)]
    )
    (out / "_SUCCESS").touch()
    back = spark.read.format("pyavro").load(str(out))
    got = {(r.k, r.s) for r in back.collect()}
    assert got == {(1, "one"), (2, "two")}
    # explicit user schema in the OTHER order also binds by name
    back2 = (
        spark.read.format("pyavro")
        .schema("s string, k bigint")
        .load(str(out))
    )
    assert {(r.k, r.s) for r in back2.collect()} == {(1, "one"), (2, "two")}


def test_pyavro_read_schema_mismatch_raises(spark, tmp_path):
    register_pyavro(spark)
    out = tmp_path / "typed"
    out.mkdir()
    write_container(str(out / "a.avro"), [("k", "long")], [(1,)])
    (out / "_SUCCESS").touch()
    with pytest.raises(Exception, match="read schema wants"):
        spark.read.format("pyavro").schema("k string").load(
            str(out)
        ).collect()
    with pytest.raises(Exception, match="absent"):
        spark.read.format("pyavro").schema("missing bigint").load(
            str(out)
        ).collect()


def test_write_long_refuses_out_of_range(tmp_path):
    # an int outside [-2^63, 2^63) would zigzag into an over-long varint
    # that reference readers reject or misread — refuse at encode time
    with pytest.raises(ValueError, match="64-bit"):
        write_container(
            str(tmp_path / "big.avro"), [("k", "long")], [(2**63,)]
        )
    with pytest.raises(ValueError, match="64-bit"):
        write_container(
            str(tmp_path / "neg.avro"), [("k", "long")], [(-(2**63) - 1,)]
        )


def test_pyavro_schema_quotes_reserved_field_names(spark, tmp_path):
    # an Avro field named like a SQL keyword must survive the inferred
    # DDL (backtick-quoted), not die in the parser
    register_pyavro(spark)
    out = tmp_path / "reserved"
    out.mkdir()
    write_container(
        str(out / "a.avro"),
        [("order", "long"), ("select", "string")],
        [(5, "w")],
    )
    (out / "_SUCCESS").touch()
    back = spark.read.format("pyavro").load(str(out))
    rows = back.collect()
    assert back.columns == ["order", "select"]
    assert (rows[0]["order"], rows[0]["select"]) == (5, "w")


def test_write_int_refuses_out_of_32bit_range(spark, tmp_path):
    # avro `int` is 32-bit: an out-of-range value writes an over-long
    # varint the reference reader's readInt() rejects — refuse at
    # encode time, same as the long guard (in-range ints still
    # round-trip through the JVM reference reader)
    with pytest.raises(ValueError, match="32-bit"):
        write_container(str(tmp_path / "i.avro"), [("k", "int")], [(2**31,)])
    with pytest.raises(ValueError, match="32-bit"):
        write_container(
            str(tmp_path / "j.avro"), [("k", "int")], [(-(2**31) - 1,)]
        )
    path = str(tmp_path / "ok.avro")
    write_container(
        path, [("k", "int")], [(2**31 - 1,), (-(2**31),), (None,)]
    )
    it = read_container(path)
    next(it)
    assert list(it) == [(2**31 - 1,), (-(2**31),), (None,)]
