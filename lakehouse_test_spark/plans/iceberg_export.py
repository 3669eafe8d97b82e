"""Iceberg-v2 interop for :class:`LakehouseTable`: render the native
commit history as Apache Iceberg format-version-2 table metadata (and
replay it back) — the sibling of :mod:`plans.delta_export` for the
second table format BASELINE.md names.

The sandbox ships no pyiceberg/iceberg-spark package, so like the
Delta exporter this follows the public spec directly
(iceberg.apache.org/spec/, format version 2):

- ``metadata/v1.metadata.json`` + ``version-hint.text`` (the
  HadoopCatalog layout): format-version 2, table-uuid, schemas with
  Iceberg field-ids, unpartitioned partition-spec, one snapshot per
  native commit with sequence numbers and operation summaries;
- one **manifest list** per snapshot (``snap-*.avro``) listing its
  manifests with added/existing counts and sequence numbers;
- **manifest files** (``*-m*.avro``) holding manifest entries whose
  ``data_file`` struct carries path/format/record_count/size;
  appends carry prior manifests forward (EXISTING status), restates
  start a fresh manifest set (operation ``overwrite`` / ``replace``
  for dataChange=false compactions, exactly Iceberg's REPLACE);
- native deletion-vector commits become **position-delete files**
  (Iceberg v2 ``content=1``: parquet of ``file_path, pos``) in their
  own delete manifests — the spec's row-level delete encoding, which
  is precisely what the native DVs are.

Manifests and manifest lists are real Avro object-container files
written by the minimal spec-subset writer below (deflate-less, null
codec) with the spec's ``field-id`` attributes in the embedded
schemas; ``read_ocf`` round-trips them and the tests replay
manifest-list → manifests → file scan back into DataFrames that must
equal the native snapshot at every version.

Scale: like the Delta export this is O(files) driver-side metadata
work with zero data I/O (delete manifests re-encode the DV parquet,
which is O(deleted rows)); a reader plans from one manifest list per
snapshot instead of replaying a commit log, which is exactly why
Iceberg scales planning to 100k-commit tables.
"""

from __future__ import annotations

import json
import struct
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from lakehouse_test_spark.plans.lakehouse import LakehouseTable
from lakehouse_test_spark.sources.avro_codec import _zigzag_decode, _zigzag_encode

# ---------------------------------------------------------------------------
# minimal Avro datum + object-container-file codec (spec subset:
# records, null-unions, int/long/string/boolean/double/bytes, empty
# structs) — enough for Iceberg manifest schemas, validated by
# roundtrip tests.
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def _avro_encode(datum, schema, out: bytearray) -> None:
    if isinstance(schema, list):  # union: branch index, then value
        if datum is None and "null" in schema:
            out += _zigzag_encode(schema.index("null"))
            return
        branch = next(
            i for i, s in enumerate(schema) if s != "null"
        )  # single non-null branch (all we emit)
        out += _zigzag_encode(branch)
        _avro_encode(datum, schema[branch], out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _avro_encode(None if datum is None else datum.get(f["name"]), f["type"], out)
            return
        raise ValueError(f"unsupported avro complex type {t}")
    if schema in ("int", "long"):
        out += _zigzag_encode(int(datum))
    elif schema == "string":
        raw = str(datum).encode("utf-8")
        out += _zigzag_encode(len(raw)) + raw
    elif schema == "bytes":
        out += _zigzag_encode(len(datum)) + bytes(datum)
    elif schema == "boolean":
        out.append(1 if datum else 0)
    elif schema == "double":
        out += struct.pack("<d", float(datum))
    elif schema == "null":
        pass
    else:
        raise ValueError(f"unsupported avro type {schema}")


def _avro_decode(buf: bytes, pos: int, schema):
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        return _avro_decode(buf, pos, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _avro_decode(buf, pos, f["type"])
            return rec, pos
        raise ValueError(f"unsupported avro complex type {t}")
    if schema in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if schema == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "null":
        return None, pos
    raise ValueError(f"unsupported avro type {schema}")


def write_ocf(path: Path, schema: dict, records: list[dict], meta: dict | None = None) -> None:
    """Write an Avro object container file (null codec, one block)."""
    sync = uuid.uuid5(uuid.NAMESPACE_URL, str(path)).bytes  # deterministic
    header = bytearray(_MAGIC)
    md = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    md.update(meta or {})
    header += _zigzag_encode(len(md))
    for k, v in md.items():
        kb = k.encode()
        vb = v.encode()
        header += _zigzag_encode(len(kb)) + kb + _zigzag_encode(len(vb)) + vb
    header += _zigzag_encode(0)  # map terminator
    header += sync
    body = bytearray()
    for r in records:
        _avro_encode(r, schema, body)
    out = bytes(header)
    if records:
        out += _zigzag_encode(len(records)) + _zigzag_encode(len(body)) + bytes(body) + sync
    path.write_bytes(out)


def read_ocf(path: Path) -> tuple[dict, dict, list[dict]]:
    """Read an Avro OCF written by :func:`write_ocf` (or any null-codec
    OCF whose schema stays in the supported subset). Returns
    (schema, file-metadata, records)."""
    buf = path.read_bytes()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    pos = 4
    md: dict[str, str] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = _zigzag_decode(buf, pos)
            k = buf[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(buf, pos)
            md[k] = buf[pos : pos + vl].decode()
            pos += vl
    if md.get("avro.codec", "null") != "null":
        raise ValueError(f"{path}: unsupported codec {md['avro.codec']}")
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(md["avro.schema"])
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        pos += 16
        bpos = 0
        for _ in range(count):
            rec, bpos = _avro_decode(block, bpos, schema)
            records.append(rec)
    return schema, md, records


# ---------------------------------------------------------------------------
# Iceberg schemas (with spec field-ids) for manifest lists + manifests
# ---------------------------------------------------------------------------


def _f(name, typ, fid, optional=False):
    t = ["null", typ] if optional else typ
    return {"name": name, "type": t, "field-id": fid}


MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _f("manifest_path", "string", 500),
        _f("manifest_length", "long", 501),
        _f("partition_spec_id", "int", 502),
        _f("content", "int", 517),
        _f("sequence_number", "long", 515),
        _f("min_sequence_number", "long", 516),
        _f("added_snapshot_id", "long", 503),
        _f("added_files_count", "int", 504),
        _f("existing_files_count", "int", 505),
        _f("deleted_files_count", "int", 506),
        _f("added_rows_count", "long", 512),
        _f("existing_rows_count", "long", 513),
        _f("deleted_rows_count", "long", 514),
    ],
}

DATA_FILE_SCHEMA = {
    "type": "record",
    "name": "r2",
    "fields": [
        _f("content", "int", 134),
        _f("file_path", "string", 100),
        _f("file_format", "string", 101),
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": []},
            "field-id": 102,
        },
        _f("record_count", "long", 103),
        _f("file_size_in_bytes", "long", 104),
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        _f("status", "int", 0),
        _f("snapshot_id", "long", 1, optional=True),
        _f("sequence_number", "long", 3, optional=True),
        _f("file_sequence_number", "long", 4, optional=True),
        {"name": "data_file", "type": DATA_FILE_SCHEMA, "field-id": 2},
    ],
}

# manifest-entry status / manifest content codes (spec)
ST_EXISTING, ST_ADDED, ST_DELETED = 0, 1, 2
CONTENT_DATA, CONTENT_DELETES = 0, 1

_SPARK_TO_ICEBERG = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def _iceberg_schema(spark_schema) -> dict:
    fields = []
    for i, f in enumerate(spark_schema.fields, start=1):
        t = f.dataType.typeName()
        if t == "decimal":
            ice = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        elif t in _SPARK_TO_ICEBERG:
            ice = _SPARK_TO_ICEBERG[t]
        else:
            raise ValueError(f"no Iceberg mapping for Spark type {t} ({f.name})")
        fields.append(
            {"id": i, "name": f.name, "required": False, "type": ice}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _snapshot_id(version: int) -> int:
    return 1000 + version  # deterministic, monotone


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def export_iceberg_metadata(spark: SparkSession, table: LakehouseTable) -> Path:
    """Write Iceberg v2 table metadata under ``<table>/metadata`` from
    the native commit history. Idempotent; returns the metadata dir.

    Per native commit: appends add a manifest and carry prior ones
    forward; restates (merge/delete/compact) start a fresh manifest
    set (``overwrite``, or ``replace`` when dataChange=false); DV
    commits write position-delete parquet + a delete manifest
    (content=1). One snapshot per commit, so Iceberg time travel by
    snapshot matches native time travel by version.
    """
    meta_dir = table.path / "metadata"
    if meta_dir.exists():
        import shutil

        shutil.rmtree(meta_dir)
    meta_dir.mkdir(parents=True)

    now_ms = int(time.time() * 1000)
    tbl_uuid = str(uuid.uuid5(uuid.NAMESPACE_URL, str(table.path)))
    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    # carried forward across commits: (manifest record) per live manifest
    live_data_manifests: list[dict] = []
    live_delete_manifests: list[dict] = []
    parent_id: int | None = None

    def _abs(rel: str) -> str:
        return str((table.path / rel).resolve())

    def _write_manifest(
        name: str, entries: list[dict], content: int, seq: int, snap_id: int
    ) -> dict:
        p = meta_dir / name
        write_ocf(
            p,
            MANIFEST_ENTRY_SCHEMA,
            entries,
            meta={
                "format-version": "2",
                "content": "data" if content == CONTENT_DATA else "deletes",
                "partition-spec-id": "0",
            },
        )
        added = [e for e in entries if e["status"] == ST_ADDED]
        existing = [e for e in entries if e["status"] == ST_EXISTING]
        return {
            "manifest_path": str(p),
            "manifest_length": p.stat().st_size,
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(added),
            "existing_files_count": len(existing),
            "deleted_files_count": 0,
            "added_rows_count": sum(e["data_file"]["record_count"] for e in added),
            "existing_rows_count": sum(e["data_file"]["record_count"] for e in existing),
            "deleted_rows_count": 0,
        }

    def _entry(rel: str, commit, snap_id: int, seq: int, content: int) -> dict:
        import pyarrow.parquet as pq

        p = table.path / rel
        return {
            "status": ST_ADDED,
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": str(p.resolve()),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": pq.ParquetFile(str(p)).metadata.num_rows,
                "file_size_in_bytes": p.stat().st_size,
            },
        }

    history = table.history()
    last_seq = 0
    live_entries: dict[str, dict] = {}
    for commit in history:
        snap_id = _snapshot_id(commit.version)
        seq = commit.version + 1
        last_seq = seq
        if commit.restate:
            live_data_manifests = []
            live_delete_manifests = []
            live_entries = {}
            operation = "replace" if not commit.data_change else "overwrite"
        elif commit.removed_files:
            # partial rewrite (compact_files): Iceberg's RewriteManifests
            # shape — one fresh manifest re-lists the SURVIVING prior
            # entries, replaced files simply stop being referenced
            operation = "replace"
            for f in commit.removed_files:
                live_entries.pop(f, None)
            surviving = [live_entries[f] for f in sorted(live_entries)]
            live_data_manifests = (
                [
                    _write_manifest(
                        f"{uuid.uuid4().hex}-m0.avro",
                        surviving,
                        CONTENT_DATA,
                        seq,
                        snap_id,
                    )
                ]
                if surviving
                else []
            )
        elif commit.dv_files:
            operation = "delete"
        else:
            operation = "append"
        if commit.files:
            entries = [
                _entry(f, commit, snap_id, seq, CONTENT_DATA) for f in commit.files
            ]
            for f, e in zip(commit.files, entries):
                live_entries[f] = e
            m = _write_manifest(
                f"{uuid.uuid4().hex}-m1.avro", entries, CONTENT_DATA, seq, snap_id
            )
            live_data_manifests = live_data_manifests + [m]
        if commit.dv_files:
            # Iceberg v2 position deletes: parquet of (file_path, pos)
            # sorted by file then position, referenced by a content=1
            # manifest. The native DV parquet is already exactly this
            # modulo column names and path normalization.
            import pyarrow.parquet as pq

            from urllib.parse import urlparse

            del_entries = []
            for i, dvf in enumerate(commit.dv_files):
                t = pq.read_table(str(table.path / dvf))
                if t.num_rows == 0:
                    continue
                paths = [
                    str(Path(urlparse(p).path if p.startswith("file:") else p).resolve())
                    for p in t.column("_dv_file").to_pylist()
                ]
                import pyarrow as pa

                dt = pa.table(
                    {
                        "file_path": pa.array(paths, type=pa.string()),
                        "pos": t.column("_dv_pos").cast(pa.int64()),
                    }
                ).sort_by([("file_path", "ascending"), ("pos", "ascending")])
                dp = meta_dir / f"delete-{snap_id}-{i}.parquet"
                pq.write_table(dt, str(dp))
                del_entries.append(
                    {
                        "status": ST_ADDED,
                        "snapshot_id": snap_id,
                        "sequence_number": seq,
                        "file_sequence_number": seq,
                        "data_file": {
                            "content": CONTENT_DELETES,
                            "file_path": str(dp.resolve()),
                            "file_format": "PARQUET",
                            "partition": {},
                            "record_count": dt.num_rows,
                            "file_size_in_bytes": dp.stat().st_size,
                        },
                    }
                )
            m = _write_manifest(
                f"{uuid.uuid4().hex}-m1.avro", del_entries, CONTENT_DELETES, seq, snap_id
            )
            live_delete_manifests = live_delete_manifests + [m]
        list_name = f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro"
        write_ocf(
            meta_dir / list_name,
            MANIFEST_FILE_SCHEMA,
            live_data_manifests + live_delete_manifests,
            meta={"format-version": "2"},
        )
        snap = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms + commit.version,
            "manifest-list": str((meta_dir / list_name).resolve()),
            "schema-id": 0,
            "summary": {"operation": operation},
        }
        if parent_id is not None:
            snap["parent-snapshot-id"] = parent_id
        parent_id = snap_id
        snapshots.append(snap)
        snapshot_log.append(
            {"timestamp-ms": snap["timestamp-ms"], "snapshot-id": snap_id}
        )

    metadata = {
        "format-version": 2,
        "table-uuid": tbl_uuid,
        "location": str(table.path.resolve()),
        "last-sequence-number": last_seq,
        "last-updated-ms": now_ms,
        "last-column-id": len(table.snapshot().schema.fields),
        "current-schema-id": 0,
        "schemas": [_iceberg_schema(table.snapshot().schema)],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": parent_id,
        "refs": {"main": {"snapshot-id": parent_id, "type": "branch"}},
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    (meta_dir / "v1.metadata.json").write_text(json.dumps(metadata, indent=2))
    (meta_dir / "version-hint.text").write_text("1")
    return meta_dir


# ---------------------------------------------------------------------------
# read (replay) side — what an Iceberg reader does from the metadata
# ---------------------------------------------------------------------------


def _load_metadata(table_path: str) -> dict:
    meta_dir = Path(table_path) / "metadata"
    hint = (meta_dir / "version-hint.text").read_text().strip()
    return json.loads((meta_dir / f"v{hint}.metadata.json").read_text())


def iceberg_plan_files(
    table_path: str, snapshot_id: int | None = None
) -> tuple[list[str], list[str]]:
    """Plan a scan the Iceberg way: metadata → snapshot → manifest
    list → manifests → (data files, position-delete files)."""
    md = _load_metadata(table_path)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    _, _, manifests = read_ocf(Path(snap["manifest-list"]))
    data_files: list[str] = []
    delete_files: list[str] = []
    for m in manifests:
        _, _, entries = read_ocf(Path(m["manifest_path"]))
        for e in entries:
            if e["status"] == ST_DELETED:
                continue
            df = e["data_file"]
            if df["content"] == CONTENT_DELETES:
                delete_files.append(df["file_path"])
            else:
                data_files.append(df["file_path"])
    return data_files, delete_files


def read_iceberg(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Open an exported table the way an Iceberg reader would: plan
    files from the chosen snapshot's manifests, scan the data files,
    and anti-join position deletes on (file_path, pos)."""
    from pyspark.sql import functions as F

    data_files, delete_files = iceberg_plan_files(table_path, snapshot_id)
    if not data_files:
        raise ValueError(f"no data files at snapshot {snapshot_id}")
    df = spark.read.option("mergeSchema", "true").parquet(*data_files)
    if not delete_files:
        return df
    dels = spark.read.parquet(*delete_files)
    return (
        df.withColumn(
            "_ipath", F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "")
        )
        .withColumn("_ipos", F.col("_metadata.row_index"))
        .join(
            dels.withColumnRenamed("file_path", "_ipath").withColumnRenamed(
                "pos", "_ipos"
            ),
            ["_ipath", "_ipos"],
            "left_anti",
        )
        .drop("_ipath", "_ipos")
    )


# ---------------------------------------------------------------------------
# gate query
# ---------------------------------------------------------------------------

from lakehouse_test_spark.registry import query  # noqa: E402
from lakehouse_test_spark.session import load_table  # noqa: E402


@query(
    "lakehouse_iceberg_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events
    WHERE event_type <> 'click' AND event_id % 7 <> 0
    GROUP BY event_type
    """,
    tags=("lakehouse", "iceberg", "events"),
)
def lakehouse_iceberg_roundtrip(spark: SparkSession, sf_dir: str):
    """Full Iceberg interop loop: ingest events in two commits, DELETE
    one event type (full restate → overwrite snapshot), DV-delete a
    slice (→ position-delete files), export Iceberg v2 metadata, then
    aggregate the table as read back THROUGH the metadata (manifest
    list → manifests → scan + position-delete anti-join) — proving an
    external Iceberg reader would see exactly the committed state.

    Oracle-checkable: the roundtrip must equal the straight batch
    aggregate minus the deleted type and the DV'd slice.
    """
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse_test_spark.fpsafe import dround, dsum

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = tempfile.mkdtemp(prefix="lakehouse_iceberg_rt_")
    t = LakehouseTable(spark, path)
    half = e.where(F.col("event_id") % 2 == 0)
    t.append(half, stats_cols=["event_id"])
    t.append(e.where(F.col("event_id") % 2 == 1), stats_cols=["event_id"])
    t.delete_where("event_type = 'click'", stats_cols=["event_id"])
    t.delete_where_dv("event_id % 7 = 0")
    export_iceberg_metadata(spark, t)
    via_iceberg = read_iceberg(spark, str(t.path))
    return (
        via_iceberg.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(dsum(F.col("value")), 2).alias("total_value"),
        )
        .localCheckpoint()  # materialize before the temp table drops
    )
