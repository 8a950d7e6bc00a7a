"""Pure-Python Avro object-container-file codec.

The reference reads/writes Avro natively (AvroStorage.java:32) with
null-padding schema evolution (reference CHANGELOG:6). This
environment has no spark-avro jar, so the format is implemented
directly — spec: https://avro.apache.org/docs/1.11.1/specification/
(magic ``Obj\\x01``, varint/zigzag primitives, metadata map, sync
markers, ``null``/``deflate`` codecs) — and surfaced to Spark through
the Python DataSource in :mod:`cubert_spark.sources` (Arrow-batched by
the DataSource machinery; per-file partitions).

Supported schema subset (the relational subset Cubert scripts use):
records of primitives (boolean/int/long/float/double/bytes/string),
``[null, T]`` unions, and arrays of those. Reader-schema resolution
null-pads fields missing from the writer schema (by name), matching
the reference's evolution behavior.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
_EPOCH = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class AvroError(ValueError):
    pass


# ------------------------------------------------------------- encoding

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag_encode(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    n = read_long(buf)
    return buf.read(n)


# ------------------------------------------------------- schema handling

def normalize_schema(schema):
    """JSON text or dict -> canonical dict form with ``fields`` list."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return schema


def _field_type(t):
    """Return (base_type, null_branch). ``t`` may be str, dict, or a
    2-way union with null; ``null_branch`` is the union index of the
    null branch (None for non-nullable types) — branch order is
    whatever the schema declares, NOT assumed null-first."""
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or len(t) != 2:
            raise AvroError(f"only 2-way unions with null supported, got {t}")
        return non_null[0], t.index("null")
    return t, None


def _write_value(buf, t, v) -> None:
    base, null_branch = _field_type(t)
    if null_branch is not None:
        if v is None:
            write_long(buf, null_branch)
            return
        write_long(buf, 1 - null_branch)
    elif v is None:
        raise AvroError(f"null value for non-nullable {t}")
    if isinstance(base, dict) and base.get("logicalType") == "date":
        write_long(buf, (v - _EPOCH).days if isinstance(v, _dt.date) else int(v))
    elif isinstance(base, dict) and base.get("logicalType") in (
        "timestamp-micros", "local-timestamp-micros"
    ):
        if isinstance(v, _dt.datetime):
            if base["logicalType"] == "timestamp-micros":
                # instant semantics: naive datetimes from pyspark are
                # in process-local time — anchor to UTC before
                # encoding so spec-compliant readers see the instant
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            elif v.tzinfo is not None:
                v = v.replace(tzinfo=None)
            td = v - _EPOCH_DT
            # integer arithmetic: float total_seconds() has ~2us ULP
            # error beyond a few hundred years from epoch
            v = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        write_long(buf, int(v))
    elif isinstance(base, dict) and base.get("type") == "array":
        items = base["items"]
        if v:
            write_long(buf, len(v))
            for item in v:
                _write_value(buf, items, item)
        write_long(buf, 0)
    elif base == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif base in ("int", "long"):
        write_long(buf, int(v))
    elif base == "float":
        buf.write(struct.pack("<f", float(v)))
    elif base == "double":
        buf.write(struct.pack("<d", float(v)))
    elif base == "bytes":
        _write_bytes(buf, bytes(v))
    elif base == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    else:
        raise AvroError(f"unsupported avro type {base!r}")


def _read_value(buf, t):
    base, null_branch = _field_type(t)
    if null_branch is not None:
        branch = read_long(buf)
        if branch == null_branch:
            return None
    if isinstance(base, dict) and base.get("logicalType") == "date":
        return _EPOCH + _dt.timedelta(days=read_long(buf))
    if isinstance(base, dict) and base.get("logicalType") in (
        "timestamp-micros", "local-timestamp-micros"
    ):
        out = _EPOCH_DT + _dt.timedelta(microseconds=read_long(buf))
        if base["logicalType"] == "timestamp-micros":
            # inverse of the write-side anchoring: UTC instant ->
            # process-local naive datetime (what pyspark expects)
            out = (
                out.replace(tzinfo=_dt.timezone.utc)
                .astimezone()
                .replace(tzinfo=None)
            )
        return out
    if isinstance(base, dict) and base.get("type") == "array":
        items = base["items"]
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(_read_value(buf, items))
    if base == "boolean":
        return buf.read(1) == b"\x01"
    if base in ("int", "long"):
        return read_long(buf)
    if base == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if base == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if base == "bytes":
        return _read_bytes(buf)
    if base == "string":
        return _read_bytes(buf).decode("utf-8")
    raise AvroError(f"unsupported avro type {base!r}")


def _skip_value(buf, t) -> None:
    _read_value(buf, t)


# ----------------------------------------------------------- file writer

def write_file(path, schema, rows, codec: str = "deflate", sync_interval: int = 4000):
    """Write an Avro object container file. ``rows`` yields dicts or
    sequences in field order."""
    schema = normalize_schema(schema)
    fields = schema["fields"]
    names = [f["name"] for f in fields]
    sync = os.urandom(16)
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = io.BytesIO()
        write_long(meta, 2)
        _write_bytes(meta, b"avro.schema")
        _write_bytes(meta, json.dumps(schema).encode())
        _write_bytes(meta, b"avro.codec")
        _write_bytes(meta, codec.encode())
        write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)

        block = io.BytesIO()
        count = 0

        def flush():
            nonlocal block, count
            if not count:
                return
            raw = block.getvalue()
            if codec == "deflate":
                comp = zlib.compressobj(wbits=-15)
                raw = comp.compress(raw) + comp.flush()
            head = io.BytesIO()
            write_long(head, count)
            write_long(head, len(raw))
            f.write(head.getvalue())
            f.write(raw)
            f.write(sync)
            block, count = io.BytesIO(), 0

        for row in rows:
            vals = [row[n] for n in names] if isinstance(row, dict) else list(row)
            for (fld, v) in zip(fields, vals):
                _write_value(block, fld["type"], v)
            count += 1
            if count >= sync_interval:
                flush()
        flush()


# ----------------------------------------------------------- file reader

def read_header(f):
    if f.read(4) != MAGIC:
        raise AvroError("not an Avro object container file")
    meta = {}
    while True:
        n = read_long(f)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(f)
        for _ in range(n):
            k = _read_bytes(f).decode()
            meta[k] = _read_bytes(f)
    sync = f.read(16)
    schema = normalize_schema(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync


def _seek_past_sync(f, start: int, sync: bytes) -> bool:
    """Position ``f`` just past the first sync marker whose END is
    strictly after byte offset ``start``; False if none (no blocks in
    this range). The scan begins 15 bytes before ``start`` so a marker
    straddling the split edge is found and assigned to exactly one
    side. Chunked with a 15-byte overlap across reads — the
    Hadoop-style split protocol (sync markers are 16 random bytes;
    payload collisions are the format's accepted design risk)."""
    scan_from = max(start - (len(sync) - 1), 0)
    f.seek(scan_from)
    chunk_size = 1 << 20
    carry = b""
    base = scan_from  # absolute offset of buf[len(carry)] - len(carry)
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            return False
        buf = carry + chunk
        buf_abs = base - len(carry)  # absolute offset of buf[0]
        idx = 0
        while True:
            idx = buf.find(sync, idx)
            if idx == -1:
                break
            end_pos = buf_abs + idx + len(sync)
            if end_pos > start:
                f.seek(end_pos)
                return True
            idx += 1
        carry = buf[-(len(sync) - 1):]
        base += len(chunk)


def read_file(path, reader_schema=None, start: int = 0, end: int | None = None):
    """Yield rows (tuples in reader-schema field order).

    ``reader_schema`` resolution: fields are matched by NAME against
    the writer schema; a reader field absent from the file is
    null-padded (must be nullable or carry a default) — the
    reference's schema-evolution contract (CHANGELOG:6). Writer fields
    the reader drops are skipped.

    ``start``/``end`` select a byte range: this call owns every block
    whose delimiting sync marker ends within ``(start, end]`` (the
    first split, ``start=0``, also owns the blocks directly after the
    header). Ranges that tile the file yield each row exactly once —
    the split protocol that lets one large container file scan as many
    partitions.
    """
    with open(path, "rb") as f:
        writer_schema, codec, sync = read_header(f)
        w_fields = writer_schema["fields"]
        if reader_schema is None:
            plan = [("read", fld["type"], i) for i, fld in enumerate(w_fields)]
            pad = [None] * len(w_fields)
        else:
            reader_schema = normalize_schema(reader_schema)
            r_fields = reader_schema["fields"]
            by_name = {fld["name"]: i for i, fld in enumerate(r_fields)}
            pad = [None] * len(r_fields)
            plan = []
            for fld in w_fields:
                if fld["name"] in by_name:
                    plan.append(("read", fld["type"], by_name[fld["name"]]))
                else:
                    plan.append(("skip", fld["type"], -1))
            present = {fld["name"] for fld in w_fields}
            for fld in r_fields:
                if fld["name"] not in present:
                    _, null_branch = _field_type(fld["type"])
                    if "default" in fld:
                        # spec: missing reader fields take their
                        # declared default, not a blanket null
                        pad[by_name[fld["name"]]] = fld["default"]
                    elif null_branch is None:
                        raise AvroError(
                            f"reader field {fld['name']!r} missing from file "
                            "and not nullable/defaulted"
                        )
        header_end = f.tell()
        if start >= header_end:
            # mid-file split: skip forward to the first sync ending
            # strictly after `start` (the block at exactly `start`
            # belongs to the preceding range)
            if not _seek_past_sync(f, start, sync):
                return
        while True:
            block_start = f.tell()
            if end is not None and block_start > end:
                return
            try:
                count = read_long(f)
            except EOFError:
                return
            size = read_long(f)
            raw = f.read(size)
            if codec == "deflate":
                raw = zlib.decompress(raw, wbits=-15)
            elif codec != "null":
                raise AvroError(f"unsupported codec {codec!r}")
            buf = io.BytesIO(raw)
            for _ in range(count):
                out = list(pad)
                for action, t, idx in plan:
                    if action == "read":
                        out[idx] = _read_value(buf, t)
                    else:
                        _skip_value(buf, t)
                yield tuple(out)
            if f.read(16) != sync:
                raise AvroError("sync marker mismatch (corrupt file)")


# ------------------------------------------------- Spark schema mapping

_TO_AVRO = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "binary": "bytes",
    "string": "string", "short": "int", "byte": "int",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}
_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "long", "float": "float",
    "double": "double", "bytes": "binary", "string": "string",
}


def spark_to_avro_schema(schema, name: str = "record") -> dict:
    """pyspark StructType -> avro record schema dict."""
    fields = []
    for f in schema.fields:
        t = f.dataType.typeName()
        if t == "array":
            elem = f.dataType.elementType.typeName()
            if elem not in _TO_AVRO:
                raise AvroError(f"unsupported array element type {elem}")
            items = _TO_AVRO[elem]
            if f.dataType.containsNull:
                items = ["null", items]
            base = {"type": "array", "items": items}
        elif t in _TO_AVRO:
            base = _TO_AVRO[t]
        else:
            raise AvroError(f"unsupported Spark type {t} for avro")
        fields.append(
            {"name": f.name, "type": ["null", base] if f.nullable else base}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_to_spark_ddl(schema) -> str:
    """avro record schema -> Spark DDL string."""
    schema = normalize_schema(schema)
    cols = []
    for f in schema["fields"]:
        base, _ = _field_type(f["type"])
        if isinstance(base, dict) and base.get("logicalType") == "date":
            cols.append(f"{f['name']} date")
        elif isinstance(base, dict) and base.get("logicalType") == "timestamp-micros":
            cols.append(f"{f['name']} timestamp")
        elif isinstance(base, dict) and base.get("logicalType") == "local-timestamp-micros":
            cols.append(f"{f['name']} timestamp_ntz")
        elif isinstance(base, dict) and base.get("type") == "array":
            item_base, _ = _field_type(base["items"])
            if not isinstance(item_base, str) or item_base not in _TO_SPARK:
                raise AvroError(f"unsupported array items {base['items']}")
            cols.append(f"{f['name']} array<{_TO_SPARK[item_base]}>")
        elif base in _TO_SPARK:
            cols.append(f"{f['name']} {_TO_SPARK[base]}")
        else:
            raise AvroError(f"unsupported avro type {base!r}")
    return ", ".join(cols)
