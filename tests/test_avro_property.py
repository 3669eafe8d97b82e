"""Property-based tests for the pure-Python Avro binary codec
(hypothesis): encode∘decode == identity for arbitrary flat records —
the wire-format invariant behind reference op 20 (no Spark needed).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_test_spark.sources.avro_codec import decode_record, encode_record

INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


@given(
    name=st.text(max_size=200),
    age=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    payload=st.text(max_size=500),
    address=st.text(max_size=200),
    number=st.integers(min_value=INT64_MIN, max_value=INT64_MAX),
)
@settings(max_examples=300, deadline=None)
def test_student_record_roundtrip(name, age, payload, address, number):
    types = ["string", "int", "string", "string", "long"]
    rec = (name, age, payload, address, number)
    assert decode_record(encode_record(rec, types), types) == rec


@given(
    s=st.text(max_size=300),
    i=st.integers(min_value=INT64_MIN, max_value=INT64_MAX),
    d=st.floats(allow_nan=False),
    b=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_mixed_types_roundtrip(s, i, d, b):
    types = ["string", "long", "double", "boolean"]
    rec = (s, i, d, b)
    assert decode_record(encode_record(rec, types), types) == rec


@given(i=st.integers(min_value=INT64_MIN, max_value=INT64_MAX))
@settings(max_examples=500, deadline=None)
def test_zigzag_varint_is_spec_compliant(i):
    """Small magnitudes must encode small (zigzag property): |n| < 2^6
    fits one byte, and encoding length grows with magnitude."""
    types = ["long"]
    enc = encode_record((i,), types)
    assert decode_record(enc, types) == (i,)
    if -64 <= i <= 63:
        assert len(enc) == 1


@given(
    body=st.binary(max_size=200),
    sid=st.integers(min_value=0, max_value=0x7FFFFFFF),
)
@settings(max_examples=300, deadline=None)
def test_confluent_envelope_roundtrip(body, sid):
    """wrap → unwrap is identity for any body and any int32 schema id,
    and the envelope is exactly 5 bytes of magic+big-endian id."""
    from lakehouse_test_spark.sources.avro_codec import (
        unwrap_confluent,
        wrap_confluent,
    )

    frame = wrap_confluent(body, sid)
    assert frame[:1] == b"\x00"
    assert int.from_bytes(frame[1:5], "big") == sid
    got_sid, got_body = unwrap_confluent(frame)
    assert (got_sid, got_body) == (sid, body)


@given(
    st.lists(
        st.tuples(
            st.text(max_size=30),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.floats(allow_nan=False, allow_infinity=False),
            st.booleans(),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_encode_batch_matches_encode_record(rows):
    """The vectorized batch encoder must be bit-identical to the
    per-record spec encoder for every row."""
    import pandas as pd

    from lakehouse_test_spark.sources.avro_codec import encode_batch

    types = ["string", "long", "double", "boolean"]
    df = pd.DataFrame(rows, columns=["s", "i", "d", "b"])
    got = encode_batch(df, types)
    want = [encode_record(r, types) for r in rows]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.text(max_size=30),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.floats(allow_nan=False, allow_infinity=False),
            st.booleans(),
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_encode_batch_arrow_matches_encode_record(rows, slice_at):
    """The Arrow-native batch encoder must be bit-identical to the
    per-record spec encoder, including on sliced record batches."""
    import pandas as pd
    import pyarrow as pa

    from lakehouse_test_spark.sources.avro_codec import encode_batch_arrow

    types = ["string", "long", "double", "boolean"]
    df = pd.DataFrame(rows, columns=["s", "i", "d", "b"])
    batch = pa.RecordBatch.from_pandas(df)
    assert encode_batch_arrow(batch, types).to_pylist() == [
        encode_record(r, types) for r in rows
    ]
    start = min(slice_at, len(rows) - 1)
    sl = batch.slice(start)
    assert encode_batch_arrow(sl, types).to_pylist() == [
        encode_record(r, types) for r in rows[start:]
    ]
