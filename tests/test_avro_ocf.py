"""Avro Object Container Files (functions/avro_ocf — r15 post-seal):
the from-scratch reader/writer cross-adjudicated against the
REFERENCE Java implementation that already rides Spark's classpath
(avro-1.12.1.jar, reached through the JVM gateway): Java re-reads and
rewrites every engine-authored file per codec, Java authors
independent fixtures (via its own JsonDecoder) that the engine must
decode to the exact values, and the block/sync grammar is pinned as
the in-file split unit. Engine-only legs cover round-trips across
all codecs, recursive schemas, determinism, hostile inputs, and
mutation fuzz."""

from __future__ import annotations

import json
import os
import random
import tempfile

import pytest

from data_warehouse_migration_spark.functions.avro_ocf import (
    avro_block_spans,
    avro_rows,
    avro_schema,
    avro_write,
)

SCHEMA = {
    "type": "record", "name": "Doc", "namespace": "corpus",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {
            "type": "enum", "name": "Kind", "symbols": ["A", "B", "C"]}},
        {"name": "digest", "type": {
            "type": "fixed", "name": "Md5", "size": 16}},
        {"name": "payload", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "ratio", "type": "float"},
    ],
}


def make_rows(n: int) -> list[dict]:
    return [
        {
            "id": i * (-3) ** (i % 2),
            "title": f"doc ü中 {i}",
            "score": None if i % 3 == 0 else i * 0.5,
            "tags": [f"t{j}" for j in range(i % 4)],
            "attrs": {f"k{j}": j * 7 for j in range(i % 3)},
            "kind": "ABC"[i % 3],
            "digest": bytes(range(16)),
            "payload": bytes([i % 256]) * (i % 9),
            "flag": i % 2 == 0,
            "ratio": i * 0.25,  # exactly representable in float32
        }
        for i in range(n)
    ]


ENGINE_CODECS = ["null", "deflate", "snappy", "zstandard", "bzip2"]


@pytest.mark.parametrize("codec", ENGINE_CODECS)
def test_own_roundtrip_and_determinism(codec):
    rows = make_rows(300)
    blob = avro_write(SCHEMA, rows, codec=codec, rows_per_block=64)
    assert avro_rows(blob) == rows
    assert avro_write(SCHEMA, rows, codec=codec, rows_per_block=64) == blob
    assert avro_schema(blob)["name"] == "Doc"
    spans = avro_block_spans(blob)
    assert sum(s["count"] for s in spans) == 300 and len(spans) == 5


def test_recursive_schema_and_max_rows():
    rec = {"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "long"},
        {"name": "next", "type": ["null", "Node"]}]}
    chain = {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    blob = avro_write(rec, [chain] * 20, rows_per_block=7)
    assert avro_rows(blob) == [chain] * 20
    assert avro_rows(blob, max_rows=5) == [chain] * 5


def test_blocks_decode_independently():
    """The split-unit claim: each block decodes on its own from its
    span — byte offsets from avro_block_spans, no sequential state —
    and the concatenation equals the sequential read."""
    from data_warehouse_migration_spark.functions.avro_ocf import (
        _codec_decode,
        _Cursor,
        _decode,
        _parse_schema,
    )

    rows = make_rows(500)
    blob = avro_write(SCHEMA, rows, codec="deflate", rows_per_block=64)
    node = _parse_schema(avro_schema(blob), {})
    got = []
    for span in avro_block_spans(blob):  # each span is a task's slice
        packed = blob[span["data_at"] : span["data_at"] + span["packed_size"]]
        cur = _Cursor(_codec_decode("deflate", packed, None))
        got.extend(_decode(cur, node) for _ in range(span["count"]))
    assert got == rows == avro_rows(blob)


def test_hostile_inputs_raise_valueerror():
    blob = avro_write(SCHEMA, make_rows(50), codec="null")
    for bad in (b"", b"Obj\x02" + blob[4:], blob[:40], blob[:-10]):
        with pytest.raises(ValueError):
            avro_rows(bad)
    # a flipped sync marker must be detected, not skipped
    corrupt = bytearray(blob)
    corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        avro_rows(bytes(corrupt))
    with pytest.raises(ValueError, match="cap"):
        avro_rows(blob, max_output=16)
    with pytest.raises(ValueError, match="codec"):
        avro_write(SCHEMA, [], codec="lzo")


def test_mutation_fuzz_never_escapes_the_exception_contract():
    rows = make_rows(80)
    blob = bytearray(avro_write(SCHEMA, rows, codec="deflate",
                                rows_per_block=16))
    rng = random.Random(0xA7B0)
    for _ in range(250):
        i = rng.randrange(len(blob))
        old = blob[i]
        blob[i] ^= 1 << rng.randrange(8)
        try:
            avro_rows(bytes(blob), max_output=1 << 20)
        except ValueError:
            pass
        blob[i] = old


# --- cross-adjudication against the reference Java implementation ------------


def _jvm(spark):
    return spark.sparkContext._jvm


def _java_codec_factory(jvm, codec: str):
    cf = jvm.org.apache.avro.file.CodecFactory
    return {
        "null": cf.nullCodec, "deflate": lambda: cf.deflateCodec(6),
        "snappy": cf.snappyCodec, "zstandard": lambda: cf.zstandardCodec(3),
        "bzip2": cf.bzip2Codec, "xz": lambda: cf.xzCodec(6),
    }[codec]()


def _java_read_records(jvm, path: str):
    f = jvm.java.io.File(path)
    reader = jvm.org.apache.avro.file.DataFileReader(
        f, jvm.org.apache.avro.generic.GenericDatumReader())
    try:
        schema = reader.getSchema()
        records = []
        while reader.hasNext():
            records.append(reader.next())
        return schema, records
    finally:
        reader.close()


def _java_write_records(jvm, path: str, schema, records, codec: str):
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter())
    writer.setCodec(_java_codec_factory(jvm, codec))
    writer.create(schema, jvm.java.io.File(path))
    try:
        for rec in records:
            writer.append(rec)
    finally:
        writer.close()


@pytest.mark.parametrize("codec", ENGINE_CODECS)
def test_java_validates_engine_authored_files(spark, codec):
    """The reference implementation must read every engine-authored
    file (schema, blocks, codec framing, sync markers), and its
    null-codec REWRITE must decode through the engine to the exact
    original values — any mis-encoding either throws in Java or
    surfaces as a value diff."""
    jvm = _jvm(spark)
    rows = make_rows(200)
    blob = avro_write(SCHEMA, rows, codec=codec, rows_per_block=37)
    src = tempfile.mktemp(suffix=".avro")
    back = tempfile.mktemp(suffix=".avro")
    try:
        with open(src, "wb") as f:
            f.write(blob)
        schema, records = _java_read_records(jvm, src)
        assert len(records) == 200
        assert json.loads(schema.toString())["name"] == "Doc"
        _java_write_records(jvm, back, schema, records, "null")
        with open(back, "rb") as f:
            assert avro_rows(f.read()) == rows, codec
    finally:
        for p in (src, back):
            if os.path.exists(p):
                os.unlink(p)


@pytest.mark.parametrize("codec", ENGINE_CODECS + ["xz"])
def test_engine_reads_java_authored_files(spark, codec):
    """Independent fixtures: Java builds records from its own
    JsonDecoder (never from engine bytes) and writes with each codec
    the reference supports — INCLUDING xz, which the engine decodes
    but deliberately never encodes — and the engine must decode the
    exact values."""
    jvm = _jvm(spark)
    schema_json = json.dumps(SCHEMA)
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dfac = jvm.org.apache.avro.io.DecoderFactory.get()
    json_rows = [
        ('{"id": %d, "title": "row %d", "score": %s, '
         '"tags": ["a", "b"], "attrs": {"x": %d}, "kind": "B", '
         '"digest": "0123456789abcdef", "payload": "pp%d", '
         '"flag": %s, "ratio": 0.5}')
        % (i * 1000, i, "null" if i % 2 else '{"double": 2.25}',
           i, i, "true" if i % 2 else "false")
        for i in range(40)
    ]
    expected = [
        {"id": i * 1000, "title": f"row {i}",
         "score": None if i % 2 else 2.25, "tags": ["a", "b"],
         "attrs": {"x": i}, "kind": "B", "digest": b"0123456789abcdef",
         "payload": f"pp{i}".encode(), "flag": bool(i % 2), "ratio": 0.5}
        for i in range(40)
    ]
    records = [reader.read(None, dfac.jsonDecoder(schema, jr))
               for jr in json_rows]
    path = tempfile.mktemp(suffix=".avro")
    try:
        _java_write_records(jvm, path, schema, records, codec)
        with open(path, "rb") as f:
            blob = f.read()
        assert avro_rows(blob) == expected, codec
        assert avro_schema(blob)["name"] == "Doc"
        assert sum(s["count"] for s in avro_block_spans(blob)) == 40
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_spark_stage_extracts_avro(spark):
    """The scale-posture claim as a pin: per-asset OCF decoding
    inside one Arrow-batched mapInPandas stage, one row out per
    (asset, block) via the split-unit surface."""
    import pandas as pd

    blobs = [
        (k, avro_write(SCHEMA, make_rows(60 + k), codec="deflate",
                       rows_per_block=25))
        for k in range(6)
    ]
    df = spark.createDataFrame(blobs, "asset_id int, blob binary")

    def stage(batches):
        from data_warehouse_migration_spark.functions.avro_ocf import (
            avro_block_spans as spans_fn,
            avro_rows as rows_fn,
        )

        for pdf in batches:
            out = []
            for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
                blob = bytes(blob)
                n = len(rows_fn(blob))
                for j, span in enumerate(spans_fn(blob)):
                    out.append((int(aid), j, span["count"], n))
            yield pd.DataFrame(
                out, columns=["asset_id", "block", "count", "total"])

    got = sorted(
        tuple(r) for r in df.repartition(3, "asset_id").mapInPandas(
            stage, schema="asset_id int, block int, count int, total int"
        ).collect()
    )
    want = []
    for k in range(6):
        total = 60 + k
        counts = [25] * (total // 25) + ([total % 25] if total % 25 else [])
        want.extend((k, j, c, total) for j, c in enumerate(counts))
    assert got == sorted(want)


# --- property fuzz: random values through the writer/reader pair -------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SCALARS = (
    st.none()
    | st.integers(min_value=-(1 << 62), max_value=(1 << 62))
    | st.text(max_size=30)
)


@settings(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.fixed_dictionaries({
            "a": st.integers(min_value=-(1 << 62), max_value=(1 << 62)),
            "b": st.text(max_size=40),
            "c": st.one_of(st.none(), st.text(max_size=10)),
            "d": st.lists(st.integers(min_value=-100, max_value=100),
                          max_size=6),
            "e": st.dictionaries(st.text(max_size=5), st.booleans(),
                                 max_size=4),
            "f": st.binary(max_size=40),
        }),
        max_size=30,
    ),
    codec=st.sampled_from(ENGINE_CODECS),
    per_block=st.integers(min_value=1, max_value=7),
)
def test_property_roundtrip(rows, codec, per_block):
    schema = {
        "type": "record", "name": "P", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": {"type": "array", "items": "int"}},
            {"name": "e", "type": {"type": "map", "values": "boolean"}},
            {"name": "f", "type": "bytes"},
        ]}
    blob = avro_write(schema, rows, codec=codec, rows_per_block=per_block)
    assert avro_rows(blob) == rows
