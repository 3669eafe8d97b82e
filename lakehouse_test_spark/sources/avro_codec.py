"""Avro binary encode/decode for flat record schemas (SURVEY.md §2a
op 20 — the generated per-field encoder in Student.java:560-618).

``spark-avro`` (the JVM package providing to_avro/from_avro) is not
bundled with the pip pyspark distribution, so this implements the
Avro *binary encoding spec* (zigzag varints + length-prefixed UTF-8)
in pure Python as Arrow-batched pandas UDFs. Flat
string/int/long/double/boolean records only — exactly the reference's
type system (SURVEY.md §1.3). If spark-avro is on the classpath, use
``pyspark.sql.avro.functions`` instead; the wire format is identical.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StructType


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_record(values: tuple, field_types: list[str]) -> bytes:
    """Avro binary body for one record (spec order, no header)."""
    out = bytearray()
    for v, t in zip(values, field_types):
        if t == "string":
            raw = str(v).encode("utf-8")
            out += _zigzag_encode(len(raw)) + raw
        elif t in ("int", "long"):
            out += _zigzag_encode(int(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "boolean":
            out.append(1 if v else 0)
        else:  # pragma: no cover
            raise ValueError(f"unsupported avro type {t}")
    return bytes(out)


def decode_record(buf: bytes, field_types: list[str]) -> tuple:
    vals = []
    pos = 0
    for t in field_types:
        if t == "string":
            n, pos = _zigzag_decode(buf, pos)
            vals.append(buf[pos : pos + n].decode("utf-8"))
            pos += n
        elif t in ("int", "long"):
            v, pos = _zigzag_decode(buf, pos)
            vals.append(v)
        elif t == "double":
            vals.append(struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif t == "boolean":
            vals.append(buf[pos] == 1)
            pos += 1
        else:  # pragma: no cover
            raise ValueError(f"unsupported avro type {t}")
    return tuple(vals)


def _schema_field_types(avro_schema: dict) -> tuple[list[str], list[str]]:
    names = [f["name"] for f in avro_schema["fields"]]
    types = [f["type"] for f in avro_schema["fields"]]
    return names, types


def to_avro(struct_col: Column, avro_schema: dict) -> Column:
    """Encode a struct column to Avro binary (twin of spark-avro's
    ``to_avro``). Arrow-batched; ~bytes-level work per row only."""
    _, types = _schema_field_types(avro_schema)

    @pandas_udf(BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        # struct columns arrive as a DataFrame (one column per field)
        return pd.Series(
            [encode_record(tuple(row), types) for row in s.itertuples(index=False)]
        )

    return enc(struct_col)


def from_avro(bin_col: Column, avro_schema: dict, spark_schema: StructType) -> Column:
    """Decode an Avro binary column back to a struct column."""
    names, types = _schema_field_types(avro_schema)

    @pandas_udf(spark_schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = [decode_record(bytes(b), types) for b in s]
        return pd.DataFrame(rows, columns=names)

    return dec(bin_col)


# ---------------------------------------------------------------------------
# Confluent wire framing
#
# KafkaAvroSerializer (the reference's value serializer,
# UrsaKafkaProducerOnCloud.java:39-44) does NOT put bare Avro bodies on
# the wire: each message is a 5-byte envelope — magic byte 0x0 plus the
# registry schema id as a big-endian int32 — followed by the Avro
# binary body. Consumers use the id to fetch the writer schema.
# ---------------------------------------------------------------------------

CONFLUENT_MAGIC = 0x0


def wrap_confluent(body: bytes, schema_id: int) -> bytes:
    """Frame an Avro body in the Confluent wire envelope."""
    if not 0 <= schema_id <= 0x7FFFFFFF:
        raise ValueError(f"schema id out of int32 range: {schema_id}")
    return struct.pack(">bi", CONFLUENT_MAGIC, schema_id) + body


def unwrap_confluent(frame: bytes) -> tuple[int, bytes]:
    """Split a Confluent-framed message into (schema_id, body).
    Raises ValueError on a bad magic byte or truncated envelope."""
    if len(frame) < 5:
        raise ValueError(f"frame too short for Confluent envelope: {len(frame)} bytes")
    magic, schema_id = struct.unpack_from(">bi", frame, 0)
    if magic != CONFLUENT_MAGIC:
        raise ValueError(f"bad Confluent magic byte: {magic:#x}")
    return schema_id, frame[5:]


def to_avro_confluent(struct_col: Column, avro_schema: dict, schema_id: int) -> Column:
    """Encode + frame: Avro body with the 5-byte registry envelope
    prepended JVM-side (constant header folded into the plan — the
    Python UDF does body bytes only, exactly like bare ``to_avro``)."""
    header = wrap_confluent(b"", schema_id)
    return F.concat(F.lit(header), to_avro(struct_col, avro_schema))


def confluent_schema_id(frame_col: Column) -> Column:
    """Registry schema id from a framed message (JVM-side: hex of
    bytes 2-5 → int). NULL when the magic byte is not 0x0."""
    sid = F.conv(F.hex(F.substring(frame_col, 2, 4)), 16, 10).cast("int")
    magic_ok = F.substring(frame_col, 1, 1) == F.lit(bytes([CONFLUENT_MAGIC]))
    return F.when(magic_ok, sid)


def from_avro_confluent(
    frame_col: Column, avro_schema: dict, spark_schema: StructType
) -> Column:
    """Unframe + decode a Confluent-framed column. The envelope strip
    is JVM-side (substring); only body decoding hits Python."""
    body = F.substring(frame_col, 6, 2_147_483_647)
    return from_avro(body, avro_schema, spark_schema)


def avro_roundtrip(df: DataFrame, avro_schema: dict) -> DataFrame:
    """df → Avro bytes → df (the produce→consume wire path, op 20)."""
    names, _ = _schema_field_types(avro_schema)
    spark_schema = StructType([df.schema[n] for n in names])
    encoded = df.select(to_avro(F.struct(*names), avro_schema).alias("value"))
    return encoded.select(from_avro(F.col("value"), avro_schema, spark_schema).alias("r")).select(
        "r.*"
    )
