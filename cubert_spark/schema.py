"""Cubert schema-string <-> Spark StructType bridge.

The reference declares schemas as strings ``"TYPE name, TYPE name"``
parsed by BlockSchema (reference: src/block/BlockSchema.java:58-78) over
the type enum in src/block/DataType.java:26-56 (BYTE BOOLEAN INT LONG
FLOAT DOUBLE STRING MAP TUPLE BAG ARRAY RECORD ENUM BYTES). Nested
types use parentheses: ``BAG (TUPLE (INT x, STRING y)) items``.

Type mapping per SURVEY.md §1.2. Numeric widening follows Cubert's JLS
rules (src/block/DataType.java:124-194) — Spark's own coercion matches
for the integral/floating lattice we support.
"""

from __future__ import annotations

from pyspark.sql import types as T

_SIMPLE_TYPES: dict[str, T.DataType] = {
    "BYTE": T.ByteType(),
    "BOOLEAN": T.BooleanType(),
    "INT": T.IntegerType(),
    "LONG": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "STRING": T.StringType(),
    "ENUM": T.StringType(),  # ENUM aliased to STRING (DataType.java:47)
    "BYTES": T.BinaryType(),
    # Dates in Cubert are int yyyyMMdd (src/utils/DateTimeUtilities.java);
    # we additionally admit real temporal types as engine extensions.
    "DATE": T.DateType(),
    "TIMESTAMP": T.TimestampNTZType(),
}

_SPARK_TO_CUBERT: dict[type, str] = {
    T.ByteType: "BYTE",
    T.BooleanType: "BOOLEAN",
    T.IntegerType: "INT",
    T.ShortType: "INT",
    T.LongType: "LONG",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.StringType: "STRING",
    T.BinaryType: "BYTES",
}


class SchemaParseError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    out: list[str] = []
    cur = ""
    for ch in s:
        if ch in "(),":
            if cur.strip():
                out.append(cur.strip())
            cur = ""
            out.append(ch)
        else:
            cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def pop(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SchemaParseError("unexpected end of schema string")
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.pop()
        if got != tok:
            raise SchemaParseError(f"expected {tok!r}, got {got!r}")

    def parse_fields(self) -> list[T.StructField]:
        fields = [self.parse_field()]
        while self.peek() == ",":
            self.pop()
            fields.append(self.parse_field())
        return fields

    def parse_field(self) -> T.StructField:
        dtype = self.parse_type()
        name = self.pop()
        if name in "(),":
            raise SchemaParseError(f"expected column name, got {name!r}")
        return T.StructField(name, dtype, nullable=True)

    def parse_type(self) -> T.DataType:
        word = self.pop().upper()
        parts = word.split()
        if len(parts) == 2:
            # "INT x" tokenizes as one token; push the name back.
            self.toks.insert(self.i, parts[1])
            word = parts[0]
        if word in ("TUPLE", "RECORD"):
            self.expect("(")
            fields = self.parse_fields()
            self.expect(")")
            return T.StructType(fields)
        if word in ("BAG", "ARRAY"):
            # BAG (TUPLE (...)) / ARRAY (INT)
            self.expect("(")
            elem = self.parse_type()
            self.expect(")")
            return T.ArrayType(elem, containsNull=True)
        if word == "MAP":
            # MAP (STRING) -> map<string, string-ish value>; Cubert maps
            # are string-keyed (SURVEY.md §1.2).
            if self.peek() == "(":
                self.pop()
                val = self.parse_type()
                self.expect(")")
                return T.MapType(T.StringType(), val, valueContainsNull=True)
            return T.MapType(T.StringType(), T.StringType(), valueContainsNull=True)
        if word in _SIMPLE_TYPES:
            return _SIMPLE_TYPES[word]
        raise SchemaParseError(f"unknown type {word!r}")


def parse_schema(schema: str) -> T.StructType:
    """Parse a Cubert schema string into a StructType.

    >>> parse_schema("STRING word, INT count").fieldNames()
    ['word', 'count']
    """
    tokens = _tokenize(schema)
    # Re-split whitespace-joined tokens ("STRING word" -> two tokens).
    flat: list[str] = []
    for tok in tokens:
        if tok in "(),":
            flat.append(tok)
        else:
            flat.extend(tok.split())
    parser = _Parser(flat)
    fields = parser.parse_fields()
    if parser.peek() is not None:
        raise SchemaParseError(f"trailing tokens: {parser.toks[parser.i:]}")
    return T.StructType(fields)


def to_cubert_string(schema: T.StructType) -> str:
    """Render a StructType back into the Cubert schema-string grammar."""

    def render(dt: T.DataType) -> str:
        if isinstance(dt, T.StructType):
            inner = ", ".join(f"{render(f.dataType)} {f.name}" for f in dt.fields)
            return f"TUPLE ({inner})"
        if isinstance(dt, T.ArrayType):
            return f"ARRAY ({render(dt.elementType)})"
        if isinstance(dt, T.MapType):
            return f"MAP ({render(dt.valueType)})"
        for cls, name in _SPARK_TO_CUBERT.items():
            if isinstance(dt, cls):
                return name
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return "TIMESTAMP"
        if isinstance(dt, T.DateType):
            return "DATE"
        raise SchemaParseError(f"no Cubert name for {dt}")

    return ", ".join(f"{render(f.dataType)} {f.name}" for f in schema.fields)
