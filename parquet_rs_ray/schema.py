"""Parquet "message type" schema DDL ↔ Arrow schema.

≙ the reference's schema layer: `parse_message_type`
(`/root/reference/src/schema/parser.rs:54-100`), the schema printer
(`/root/reference/src/schema/printer.rs`), and projection validity
`Type::check_contains` (`/root/reference/src/schema/types.rs:106-139`).
Built from the public Parquet format spec (message-type grammar,
physical types `src/basic.rs:38-47`, converted types
`src/basic.rs:56-146`) — we map straight to `pyarrow` types instead of
a bespoke type tree (SURVEY §1.3).

Grammar accepted (the standard message-type DDL):

    message <name> {
      required|optional|repeated <phys>[(len)] <name> [(<logical>[(args)])] ;
      required|optional|repeated group <name> [(LIST|MAP)] { ... }
    }
"""

from __future__ import annotations

import re

import pyarrow as pa


class SchemaParseError(ValueError):
    pass


_TOKEN_RE = re.compile(r"[(){};,]|[^\s(){};,]+")

_PHYSICAL = {"boolean", "int32", "int64", "int96", "float", "double",
             "byte_array", "fixed_len_byte_array"}

# converted/logical type → arrow type factory (given physical + args)
_LOGICAL_SIMPLE = {
    "UTF8": pa.string(),
    "ENUM": pa.string(),
    "JSON": pa.string(),
    "BSON": pa.binary(),
    "DATE": pa.date32(),
    "TIME_MILLIS": pa.time32("ms"),
    "TIME_MICROS": pa.time64("us"),
    "TIMESTAMP_MILLIS": pa.timestamp("ms"),
    "TIMESTAMP_MICROS": pa.timestamp("us"),
    "INT_8": pa.int8(),
    "INT_16": pa.int16(),
    "INT_32": pa.int32(),
    "INT_64": pa.int64(),
    "UINT_8": pa.uint8(),
    "UINT_16": pa.uint16(),
    "UINT_32": pa.uint32(),
    "UINT_64": pa.uint64(),
    "INTERVAL": pa.binary(12),
}

_PHYS_ARROW = {
    "boolean": pa.bool_(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "int96": pa.timestamp("ns"),   # legacy impala timestamps
    "float": pa.float32(),
    "double": pa.float64(),
    "byte_array": pa.binary(),
}


class _Tokens:
    def __init__(self, text: str):
        self.toks = _TOKEN_RE.findall(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SchemaParseError("unexpected end of schema string")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise SchemaParseError(f"expected {tok!r}, got {got!r}")


def parse_message_type(text: str) -> pa.Schema:
    """Parse a Parquet message-type DDL string into a `pa.Schema`.

    required → non-nullable field, optional → nullable, repeated leaf →
    list<T>; `group (LIST)` / `group (MAP)` follow the standard nested
    conventions; plain groups become structs."""
    t = _Tokens(text)
    kw = t.next()
    if kw != "message":
        raise SchemaParseError(f"schema must start with 'message', got {kw!r}")
    name = t.next()
    t.expect("{")
    fields = _parse_group_fields(t)
    meta = {b"message_name": name.encode()}
    return pa.schema(fields, metadata=meta)


def _parse_group_fields(t: _Tokens) -> list[pa.Field]:
    fields = []
    while True:
        tok = t.peek()
        if tok is None:
            raise SchemaParseError("unterminated group (missing '}')")
        if tok == "}":
            t.next()
            return fields
        fields.append(_parse_field(t))


def _parse_field(t: _Tokens) -> pa.Field:
    rep = t.next().lower()
    if rep not in ("required", "optional", "repeated"):
        raise SchemaParseError(f"expected repetition, got {rep!r}")
    kind = t.next().lower()
    if kind == "group":
        return _parse_group(t, rep)
    return _parse_primitive(t, rep, kind)


def _parse_group(t: _Tokens, rep: str) -> pa.Field:
    name = t.next()
    annotation = None
    if t.peek() == "(":
        t.next()
        annotation = t.next().upper()
        t.expect(")")
    t.expect("{")
    children = _parse_group_fields(t)
    if annotation == "LIST":
        # standard 3-level: group (LIST) { repeated group list { <element> } };
        # the repeated inner group parses as list<struct<element>>
        if len(children) != 1 or not pa.types.is_list(children[0].type):
            raise SchemaParseError(f"malformed LIST group {name!r}")
        inner = children[0].type
        if pa.types.is_struct(inner.value_type) \
                and inner.value_type.num_fields == 1:
            elem = inner.value_type.field(0).type
        else:
            elem = inner.value_type  # legacy 2-level `repeated T element;`
        typ = pa.list_(elem)
    elif annotation in ("MAP", "MAP_KEY_VALUE"):
        if len(children) != 1 or not pa.types.is_list(children[0].type) \
                or not pa.types.is_struct(children[0].type.value_type):
            raise SchemaParseError(f"malformed MAP group {name!r}")
        st = children[0].type.value_type
        typ = pa.map_(st.field(0).type, st.field(1).type)
    else:
        typ = pa.struct(children)
        if rep == "repeated":
            typ = pa.list_(typ)
    return pa.field(name, typ, nullable=(rep == "optional"))


def _parse_primitive(t: _Tokens, rep: str, phys: str) -> pa.Field:
    if phys not in _PHYSICAL:
        raise SchemaParseError(f"unknown physical type {phys!r}")
    type_length = 0
    if phys == "fixed_len_byte_array":
        t.expect("(")
        type_length = int(t.next())
        t.expect(")")
    name = t.next()
    logical = None
    args: list[int] = []
    if t.peek() == "(":
        t.next()
        logical = t.next().upper()
        if t.peek() == "(":
            t.next()
            while t.peek() != ")":
                tok = t.next()
                if tok != ",":
                    args.append(int(tok))
            t.expect(")")
        t.expect(")")
    t.expect(";")
    typ = _resolve_type(phys, type_length, logical, args)
    if rep == "repeated":
        typ = pa.list_(typ)
    return pa.field(name, typ, nullable=(rep == "optional"))


def _resolve_type(phys: str, type_length: int, logical: str | None,
                  args: list[int]) -> pa.DataType:
    if logical is None:
        if phys == "fixed_len_byte_array":
            return pa.binary(type_length)
        return _PHYS_ARROW[phys]
    if logical == "DECIMAL":
        precision = args[0] if args else 38
        scale = args[1] if len(args) > 1 else 0
        return pa.decimal128(precision, scale)
    if logical in _LOGICAL_SIMPLE:
        # validate legal physical/logical combos like the reference's
        # PrimitiveTypeBuilder (`src/schema/types.rs:238-387`)
        if logical in ("TIMESTAMP_MILLIS", "TIMESTAMP_MICROS", "TIME_MICROS",
                       "INT_64", "UINT_64") and phys != "int64":
            raise SchemaParseError(f"{logical} must annotate int64, not {phys}")
        if logical in ("DATE", "TIME_MILLIS", "INT_8", "INT_16", "INT_32",
                       "UINT_8", "UINT_16", "UINT_32") and phys != "int32":
            raise SchemaParseError(f"{logical} must annotate int32, not {phys}")
        if logical in ("UTF8", "ENUM", "JSON") and phys != "byte_array":
            raise SchemaParseError(f"{logical} must annotate byte_array")
        return _LOGICAL_SIMPLE[logical]
    raise SchemaParseError(f"unknown logical type {logical!r}")


# ------------------------------------------------------------- printer

def _phys_of(typ: pa.DataType) -> tuple[str, str | None]:
    """arrow type → (physical DDL, logical annotation or None)."""
    if pa.types.is_boolean(typ):
        return "boolean", None
    if typ == pa.int32():
        return "int32", None
    if typ == pa.int64():
        return "int64", None
    if pa.types.is_float32(typ):
        return "float", None
    if pa.types.is_float64(typ):
        return "double", None
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return "byte_array", "UTF8"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return "byte_array", None
    if pa.types.is_fixed_size_binary(typ):
        return f"fixed_len_byte_array({typ.byte_width})", None
    if pa.types.is_date32(typ):
        return "int32", "DATE"
    if pa.types.is_time32(typ):
        # time32('s') has no ConvertedType: annotating it TIME_MILLIS
        # would silently misstate values 1000x — print physical only
        return "int32", ("TIME_MILLIS" if typ.unit == "ms" else None)
    if pa.types.is_time64(typ):
        return "int64", ("TIME_MICROS" if typ.unit == "us" else None)
    if pa.types.is_timestamp(typ):
        # same: 's'/'ns' units have no ConvertedType — physical only,
        # never a wrong-unit annotation
        unit = {"ms": "TIMESTAMP_MILLIS",
                "us": "TIMESTAMP_MICROS"}.get(typ.unit)
        return "int64", unit
    if pa.types.is_decimal(typ):
        return (f"fixed_len_byte_array({typ.byte_width})",
                f"DECIMAL({typ.precision},{typ.scale})")
    for small, logical in ((pa.int8(), "INT_8"), (pa.int16(), "INT_16"),
                           (pa.uint8(), "UINT_8"), (pa.uint16(), "UINT_16"),
                           (pa.uint32(), "UINT_32")):
        if typ == small:
            return "int32", logical
    if typ == pa.uint64():
        return "int64", "UINT_64"
    raise TypeError(f"cannot print arrow type {typ} as message-type DDL")


def _print_field(field: pa.Field, indent: int, out: list[str]) -> None:
    pad = "  " * indent
    rep = "optional" if field.nullable else "required"
    typ = field.type
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        out.append(f"{pad}{rep} group {field.name} (LIST) {{")
        out.append(f"{pad}  repeated group list {{")
        _print_field(pa.field("element", typ.value_type, nullable=True),
                     indent + 2, out)
        out.append(f"{pad}  }}")
        out.append(f"{pad}}}")
        return
    if pa.types.is_struct(typ):
        out.append(f"{pad}{rep} group {field.name} {{")
        for i in range(typ.num_fields):
            _print_field(typ.field(i), indent + 1, out)
        out.append(f"{pad}}}")
        return
    if pa.types.is_map(typ):
        out.append(f"{pad}{rep} group {field.name} (MAP) {{")
        out.append(f"{pad}  repeated group key_value {{")
        _print_field(pa.field("key", typ.key_type, nullable=False),
                     indent + 2, out)
        _print_field(pa.field("value", typ.item_type, nullable=True),
                     indent + 2, out)
        out.append(f"{pad}  }}")
        out.append(f"{pad}}}")
        return
    phys, logical = _phys_of(typ)
    ann = f" ({logical})" if logical else ""
    out.append(f"{pad}{rep} {phys} {field.name}{ann};")


def print_schema(schema: pa.Schema, name: str = "schema") -> str:
    """Arrow schema → message-type DDL (≙ printer.rs pretty printer)."""
    if schema.metadata and b"message_name" in schema.metadata:
        name = schema.metadata[b"message_name"].decode()
    out = [f"message {name} {{"]
    for field in schema:
        _print_field(field, 1, out)
    out.append("}")
    return "\n".join(out)


# ---------------------------------------------------------- projection

def check_contains(outer: pa.Schema | pa.DataType,
                   inner: pa.Schema | pa.DataType) -> bool:
    """Projection validity: every field of `inner` exists in `outer` with
    a compatible type (≙ `Type::check_contains`, types.rs:106-139)."""
    if isinstance(outer, pa.Schema):
        outer = pa.struct(list(outer))
    if isinstance(inner, pa.Schema):
        inner = pa.struct(list(inner))
    if pa.types.is_struct(outer) and pa.types.is_struct(inner):
        names = {outer.field(i).name: outer.field(i)
                 for i in range(outer.num_fields)}
        return all(
            inner.field(i).name in names
            and check_contains(names[inner.field(i).name].type,
                               inner.field(i).type)
            for i in range(inner.num_fields))
    if pa.types.is_list(outer) and pa.types.is_list(inner):
        return check_contains(outer.value_type, inner.value_type)
    return outer.equals(inner)


def project(schema: pa.Schema, columns: list[str]) -> pa.Schema:
    """Leaf projection by top-level column names with validity check."""
    missing = [c for c in columns if schema.get_field_index(c) < 0]
    if missing:
        raise SchemaParseError(f"projection columns not in schema: {missing}")
    return pa.schema([schema.field(c) for c in columns],
                     metadata=schema.metadata)
