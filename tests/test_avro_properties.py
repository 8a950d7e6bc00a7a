"""Property-based tests for the pure-Python Avro codec: any schema in
the supported subset, any row set, any codec, any split tiling must
round-trip exactly."""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cubert_spark import avroio

_PRIM = {
    "long": st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    "int": st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1),
    "string": st.text(max_size=40),
    "bytes": st.binary(max_size=40),
    "boolean": st.booleans(),
    "double": st.floats(allow_nan=False, width=64),
}


@st.composite
def _schema_and_rows(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields, row_strats = [], []
    for i in range(n_fields):
        t = draw(st.sampled_from(sorted(_PRIM)))
        nullable = draw(st.booleans())
        null_first = draw(st.booleans())
        ftype = t
        strat = _PRIM[t]
        if nullable:
            ftype = ["null", t] if null_first else [t, "null"]
            strat = st.one_of(st.none(), strat)
        fields.append({"name": f"f{i}", "type": ftype})
        row_strats.append(strat)
    rows = draw(st.lists(st.tuples(*row_strats), max_size=60))
    schema = {"type": "record", "name": "r", "fields": fields}
    return schema, rows


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=_schema_and_rows(), codec=st.sampled_from(["null", "deflate"]),
       sync_interval=st.integers(min_value=1, max_value=17))
def test_roundtrip_any_schema(tmp_path_factory, data, codec, sync_interval):
    schema, rows = data
    p = str(tmp_path_factory.mktemp("avro_prop") / "f.avro")
    avroio.write_file(p, schema, rows, codec=codec,
                      sync_interval=sync_interval)
    assert list(avroio.read_file(p)) == rows


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(n_rows=st.integers(min_value=0, max_value=400),
       sync_interval=st.integers(min_value=1, max_value=50),
       n_splits=st.integers(min_value=1, max_value=9))
def test_any_tiling_yields_each_row_once(tmp_path_factory, n_rows,
                                         sync_interval, n_splits):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
    ]}
    rows = [(i, None if i % 7 == 0 else f"s{i}") for i in range(n_rows)]
    p = str(tmp_path_factory.mktemp("avro_tile") / "f.avro")
    avroio.write_file(p, schema, rows, sync_interval=sync_interval)
    size = os.path.getsize(p)
    bounds = [round(size * i / n_splits) for i in range(n_splits + 1)]
    got = []
    for a, b in zip(bounds, bounds[1:]):
        got.extend(avroio.read_file(p, start=a, end=b))
    assert got == rows


@settings(max_examples=30, deadline=None)
@given(days=st.integers(min_value=-100_000, max_value=100_000),
       micros=st.integers(min_value=0, max_value=86_399_999_999))
def test_date_and_ntz_timestamp_roundtrip(tmp_path_factory, days, micros):
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "t", "type": {
            "type": "long", "logicalType": "local-timestamp-micros"}},
    ]}
    d = dt.date(1970, 1, 1) + dt.timedelta(days=days)
    t = dt.datetime(1970, 1, 1) + dt.timedelta(days=days, microseconds=micros)
    p = str(tmp_path_factory.mktemp("avro_ts") / "f.avro")
    avroio.write_file(p, schema, [(d, t)])
    assert list(avroio.read_file(p)) == [(d, t)]


@st.composite
def _evolution_case(draw):
    """Random writer schema + a reader schema that drops, keeps,
    reorders, and adds (nullable or defaulted) fields."""
    n = draw(st.integers(min_value=1, max_value=6))
    types = [draw(st.sampled_from(sorted(_PRIM))) for _ in range(n)]
    w_fields = [
        {"name": f"f{i}", "type": ["null", t]} for i, t in enumerate(types)
    ]
    rows = draw(st.lists(
        st.tuples(*[st.one_of(st.none(), _PRIM[t]) for t in types]),
        max_size=25,
    ))
    keep = draw(st.lists(
        st.integers(min_value=0, max_value=n - 1), unique=True, min_size=0,
        max_size=n,
    ))
    extra_default = draw(st.booleans())
    r_fields = [dict(w_fields[i]) for i in keep]
    if extra_default:
        r_fields.append({"name": "extra_d", "type": "long", "default": 7})
    r_fields.append({"name": "extra_n", "type": ["null", "string"]})
    return w_fields, rows, keep, r_fields, extra_default


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(case=_evolution_case())
def test_any_reader_schema_resolution(tmp_path_factory, case):
    w_fields, rows, keep, r_fields, extra_default = case
    writer = {"type": "record", "name": "r", "fields": w_fields}
    reader = {"type": "record", "name": "r", "fields": r_fields}
    p = str(tmp_path_factory.mktemp("avro_evo") / "f.avro")
    avroio.write_file(p, writer, rows)
    got = list(avroio.read_file(p, reader_schema=reader))
    want = []
    for row in rows:
        out = [row[i] for i in keep]
        if extra_default:
            out.append(7)
        out.append(None)
        want.append(tuple(out))
    assert got == want
