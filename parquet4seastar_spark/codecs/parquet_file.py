"""Real Apache Parquet container interop: PAR1 writer/reader.

The engine's primary storage is the pages+lineage DataFrame (SURVEY.md
§2.3), but this module closes the container gap: a minimal single-row-group
.parquet writer/reader speaking the standard wire format --

- writer: PAR1 magic, V1 data pages with Thrift PageHeaders, optional PLAIN
  dictionary page per chunk, Thrift FileMetaData footer + u32 length + PAR1
  (file_writer.hh:84-107 magic at :100, flush_row_group :122-155, footer
  :157-175).  Output is readable by any parquet reader (pyarrow-verified in
  tests).
- reader: footer parse (file_reader.cc:28-64, rejects encrypted 'PARE'),
  schema tree walk with Dremel level computation (reader_schema.cc:34-93),
  incremental Thrift PageHeader scan per chunk (column_chunk_reader.cc:27-50),
  decode through the same codec kernels as the pages table.  Reads the
  reference's own golden fixtures (tests/test_data/alltypes/,
  cql_reader_alltypes_test.cc:32-94).

Field ids follow the public parquet.thrift (vendored by the reference as
doc/parquet/parquet.thrift).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .pages import EncodedChunk, Page, decode_chunk
from .thrift_compact import (
    CT_BINARY,
    CT_I32,
    CT_STRUCT,
    CompactReader,
    CompactWriter,
)

MAGIC = b"PAR1"

# parquet.thrift Type enum
PHYSICAL = ["BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"]
PHYS_ID = {name: i for i, name in enumerate(PHYSICAL)}

# parquet.thrift Encoding enum
ENCODINGS = {
    "PLAIN": 0,
    "PLAIN_DICTIONARY": 2,
    "RLE": 3,
    "BIT_PACKED": 4,
    "DELTA_BINARY_PACKED": 5,
    "DELTA_LENGTH_BYTE_ARRAY": 6,
    "DELTA_BYTE_ARRAY": 7,
    "RLE_DICTIONARY": 8,
    "BYTE_STREAM_SPLIT": 9,
}
ENC_NAME = {v: k for k, v in ENCODINGS.items()}

# ConvertedType enum (subset we annotate)
CONVERTED = {"string": 0, "date": 6, "timestamp_us": 10, "decimal": 5}

_STANDARD_ENCODINGS = {
    "PLAIN", "RLE_DICTIONARY", "DELTA_BINARY_PACKED", "DELTA_LENGTH_BYTE_ARRAY",
    "DELTA_BYTE_ARRAY", "RLE", "BYTE_STREAM_SPLIT",
}


# ---------------------------------------------------------------------------
# writer


@dataclass
class MapColumn:
    """Container spec for reference-parity goldens: map<k,v> written as the
    STANDARD MAP group (key REQUIRED) from key/value list chunks encoded
    with the single-rep standard geometry (encode_chunk on the key/value
    list arrays).  General nested export goes through DremelColumn."""

    key: EncodedChunk
    value: EncodedChunk


@dataclass
class StructListColumn:
    """Container spec for reference-parity goldens: list<struct<...>> from
    per-field single-rep list chunks sharing offsets.  General nested
    export goes through DremelColumn."""

    struct_name: str
    fields: dict[str, EncodedChunk]


@dataclass
class DremelColumn:
    """Container spec: ANY nested column from the recursive walker's leaf
    chunks ({'#g<i>' or '<col>#g<i>': EncodedChunk with logical
    'g:<path>|<leaf logical>'} — codecs/pages.encode_dremel_column output).

    The emitted schema mirrors the walker's level geometry exactly (every
    group and leaf OPTIONAL; reference: writer_schema.cc:30-134 recursion),
    so the leaf pages' (rep, def) streams are valid under the declared
    schema for any independent reader.  Maps are written as LIST of a
    REQUIRED struct<key, value> (the standard MAP group demands a REQUIRED
    key, but walker keys carry their own optional level; the entry-struct
    itself carries none, matching the REQUIRED group)."""

    leaves: dict[str, EncodedChunk]

    def tree(self):
        from .dremel import build_tree

        ordered = sorted(
            self.leaves.items(), key=lambda kv: int(kv[0].rsplit("#g", 1)[1])
        )
        return build_tree(
            [(c.logical[2:].rsplit("|", 1)[0], c) for _, c in ordered]
        )


def _emit_element(w: CompactWriter, ename, *, ptype=None, type_length=0, repetition=None,
                  num_children=None, converted=None, precision=None, scale=None):
    w.elem_struct_begin()
    if ptype is not None:
        w.field_i32(1, PHYS_ID[ptype])
    if type_length:
        w.field_i32(2, type_length)
    if repetition is not None:
        w.field_i32(3, repetition)  # 0 REQUIRED, 1 OPTIONAL, 2 REPEATED
    w.field_string(4, ename)
    if num_children is not None:
        w.field_i32(5, num_children)
    if converted is not None:
        w.field_i32(6, converted)
    if scale is not None:
        w.field_i32(7, scale)
    if precision is not None:
        w.field_i32(8, precision)
    w.end_struct()


def _leaf_annotations(chunk: EncodedChunk):
    logical = chunk.logical
    if logical.startswith("g:"):  # dremel leaf: 'g:<path>|<leaf logical>'
        logical = logical.rsplit("|", 1)[1]
    elem_logical = logical[5:-1] if logical.startswith("list<") else logical
    if elem_logical.startswith("decimal("):
        p, s = elem_logical[8:-1].split(",")
        return CONVERTED["decimal"], int(p), int(s)
    return CONVERTED.get(elem_logical), None, None


def _emit_leaf(w: CompactWriter, ename: str, chunk: EncodedChunk, repetition: int):
    conv, prec, scale = _leaf_annotations(chunk)
    _emit_element(
        w, ename, ptype=chunk.ptype, type_length=chunk.type_length,
        repetition=repetition, converted=conv, precision=prec, scale=scale,
    )


def _emit_dremel_node(w: CompactWriter, name: str, node) -> int:
    """Recursive SchemaElement emission for a walker tree (every node
    OPTIONAL, matching the dremel level geometry exactly)."""
    kind = node[0]
    if kind == "leaf":
        _emit_leaf(w, name, node[1], repetition=1)
        return 1
    if kind == "struct":
        _emit_element(w, name, repetition=1, num_children=len(node[1]))
        return 1 + sum(_emit_dremel_node(w, fn, ch) for fn, ch in node[1])
    if kind == "list":
        _emit_element(w, name, repetition=1, num_children=1, converted=3)
        _emit_element(w, "list", repetition=2, num_children=1)
        return 2 + _emit_dremel_node(w, "element", node[1])
    if kind == "map":
        # LIST of REQUIRED struct<key, value> (see DremelColumn docstring):
        # def budget = outer optional (+1) + repeated (+1), then key/value
        # carry their own optional levels -- exactly the walker geometry
        _emit_element(w, name, repetition=1, num_children=1, converted=3)
        _emit_element(w, "list", repetition=2, num_children=1)
        _emit_element(w, "element", repetition=0, num_children=2)
        n = _emit_dremel_node(w, "key", node[1])
        return 3 + n + _emit_dremel_node(w, "value", node[2])
    raise ValueError(kind)


def _dremel_leaf_paths(name: str, node, prefix: tuple[str, ...]) -> list:
    """(path_in_schema, chunk) leaves in emission order."""
    kind = node[0]
    if kind == "leaf":
        return [(prefix + (name,), node[1])]
    if kind == "struct":
        return [
            lf for fn, ch in node[1] for lf in _dremel_leaf_paths(fn, ch, prefix + (name,))
        ]
    if kind == "list":
        return _dremel_leaf_paths("element", node[1], prefix + (name, "list"))
    if kind == "map":
        p = prefix + (name, "list", "element")
        return _dremel_leaf_paths("key", node[1], p) + _dremel_leaf_paths("value", node[2], p)
    raise ValueError(kind)


def _schema_elements(w: CompactWriter, name: str, spec) -> int:
    """Write the SchemaElement(s) for one column spec; returns element count."""
    if isinstance(spec, DremelColumn):
        return _emit_dremel_node(w, name, spec.tree())
    if isinstance(spec, MapColumn):
        # standard MAP group (writer_schema.cc map path)
        _emit_element(w, name, repetition=1 if spec.key.nullable else 0, num_children=1, converted=1)
        _emit_element(w, "key_value", repetition=2, num_children=2)
        _emit_leaf(w, "key", spec.key, repetition=0)
        _emit_leaf(w, "value", spec.value, repetition=1 if spec.value.elem_nullable else 0)
        return 4
    if isinstance(spec, StructListColumn):
        any_chunk = next(iter(spec.fields.values()))
        _emit_element(w, name, repetition=1 if any_chunk.nullable else 0, num_children=1, converted=3)
        _emit_element(w, "list", repetition=2, num_children=1)
        _emit_element(w, spec.struct_name, repetition=1, num_children=len(spec.fields))
        for fname, c in spec.fields.items():
            d_e = 1 if c.nullable else 0
            if "." in fname or c.max_def > d_e + 3:
                raise ValueError(
                    f"StructListColumn field {fname!r}: nested struct fields "
                    "need DremelColumn for container export"
                )
            # OPTIONAL iff the chunk carries the 4th def level
            _emit_leaf(w, fname, c, repetition=1 if c.max_def == d_e + 3 else 0)
        return 3 + len(spec.fields)
    chunk = spec
    if chunk.max_rep == 0:
        _emit_leaf(w, name, chunk, repetition=1 if (chunk.max_def or 0) > 0 else 0)
        return 1
    # standard 3-level LIST (writer_schema.cc:30-134)
    _emit_element(w, name, repetition=1 if chunk.nullable else 0, num_children=1, converted=3)
    _emit_element(w, "list", repetition=2, num_children=1)
    _emit_leaf(w, "element", chunk, repetition=1 if chunk.elem_nullable else 0)
    return 3


def _column_leaves(name: str, spec) -> list[tuple[tuple[str, ...], EncodedChunk]]:
    """Linearize a column spec into (path_in_schema, chunk) leaves."""
    if isinstance(spec, DremelColumn):
        return _dremel_leaf_paths(name, spec.tree(), ())
    if isinstance(spec, MapColumn):
        return [
            ((name, "key_value", "key"), spec.key),
            ((name, "key_value", "value"), spec.value),
        ]
    if isinstance(spec, StructListColumn):
        return [((name, "list", spec.struct_name, f), c) for f, c in spec.fields.items()]
    if spec.max_rep:
        return [((name, "list", "element"), spec)]
    return [((name,), spec)]


def _page_header(page: Page, max_rep: int) -> bytes:
    w = CompactWriter()
    if page.kind == "dict":
        w.field_i32(1, 2)  # PageType DICTIONARY_PAGE
        w.field_i32(2, page.uncompressed_size)
        w.field_i32(3, page.compressed_size)
        w.begin_field_struct(7)  # dictionary_page_header
        w.field_i32(1, page.num_values)
        w.field_i32(2, ENCODINGS["PLAIN"])
        w.field_bool(3, False)  # is_sorted
        w.end_struct()
    else:
        w.field_i32(1, 0)  # PageType DATA_PAGE
        w.field_i32(2, page.uncompressed_size)
        w.field_i32(3, page.compressed_size)
        w.begin_field_struct(5)  # data_page_header
        w.field_i32(1, page.num_values)
        w.field_i32(2, ENCODINGS[page.encoding])
        w.field_i32(3, ENCODINGS["RLE"])  # definition_level_encoding
        w.field_i32(4, ENCODINGS["RLE"])  # repetition_level_encoding
        w.end_struct()
    return w.finish()


def write_parquet_file(
    path: str,
    chunks: "dict[str, EncodedChunk] | list[dict[str, EncodedChunk]]",
    num_rows: int | list[int],
) -> None:
    """Write pre-encoded chunks as a standard .parquet file.

    ``chunks``/``num_rows`` may be a single row group (dict/int) or a list
    of row groups (file_writer flush_row_group per entry,
    file_writer.hh:122-155).  Column specs are EncodedChunk (flat or list),
    MapColumn (map<k,v> group) or StructListColumn (list<struct<...>>).
    Compression: uncompressed / snappy / gzip per chunk; encodings must be
    standard (FSST is ours alone -- re-encode with policy
    'auto_fast'/'reference' for interop output).
    """
    groups = chunks if isinstance(chunks, list) else [chunks]
    group_rows = num_rows if isinstance(num_rows, list) else [num_rows]
    if len(groups) != len(group_rows) or not groups:
        raise ValueError("chunks and num_rows must list the same row groups")
    schema_cols = list(groups[0].keys())
    codec_ids = {"uncompressed": 0, "snappy": 1, "gzip": 2}
    # linearize each group's column specs into schema leaves
    group_leaves: list[list[tuple[tuple[str, ...], EncodedChunk]]] = []
    for g, nrows in zip(groups, group_rows):
        if list(g.keys()) != schema_cols:
            raise ValueError("all row groups must share one column set/order")
        leaves = [lf for name, spec in g.items() for lf in _column_leaves(name, spec)]
        group_leaves.append(leaves)
        for (lpath0, c0), (lpath, c) in zip(group_leaves[0], leaves):
            # the SchemaElements come from group 0: every group must share
            # its level geometry, or later groups' level streams would be
            # misread (e.g. REQUIRED schema vs a def-prefixed page).  Pass
            # nullable=True (and elem_nullable=True where applicable) to
            # encode_chunk for a column null-free in some slices only.
            same = (
                lpath == lpath0
                and c.ptype == c0.ptype
                and c.logical == c0.logical
                and c.max_def == c0.max_def
                and c.max_rep == c0.max_rep
                and c.elem_nullable == c0.elem_nullable
                and c.type_length == c0.type_length
            )
            if not same:
                raise ValueError(
                    f"{lpath}: row-group schema geometry differs from group 0 "
                    f"(nullable/levels/type must match across groups)"
                )
            if c.logical.startswith("g:") and not isinstance(
                groups[0][lpath[0]], DremelColumn
            ):
                # a raw dremel leaf passed as a flat column spec would write
                # a level-mismatched (corrupt) file: its def/rep streams
                # only make sense under the recursive schema DremelColumn
                # emits
                raise ValueError(
                    f"{lpath}: dremel leaf chunk must be wrapped in "
                    "DremelColumn for container export"
                )
            if not c.logical.startswith("g:"):
                # legacy standard-geometry specs: the def/rep budgets must
                # match what the emitted schema implies, or readers decode
                # levels at the wrong bit width / positions (review finding:
                # merged-def chunks wrote files pyarrow read back with WRONG
                # values, silently).  DremelColumn leaves skip these checks:
                # their schema is generated from the same tree as their
                # streams, consistent by construction.
                if c.max_rep > 1:
                    raise ValueError(
                        f"{lpath}: max_rep={c.max_rep} not writable as a "
                        "standard single-repetition LIST schema; encode the "
                        "column with encode_dremel_column and pass a "
                        "DremelColumn spec instead"
                    )
                d_el = 1 if c.nullable else 0
                if c.max_rep == 0 and c.max_def > d_el:
                    raise ValueError(
                        f"{lpath}: flat chunk with max_def={c.max_def} carries "
                        "merged struct def levels; wrap the column's dremel "
                        "leaves in DremelColumn for container export"
                    )
                if c.max_rep == 1:
                    # StructListColumn leaves (name/list/struct/field) add
                    # the always-OPTIONAL struct group (+1) and may add an
                    # OPTIONAL field (+1, emitted as such)
                    is_sl_leaf = len(lpath) == 4 and lpath[1] == "list"
                    if is_sl_leaf:
                        allowed = {d_el + 2, d_el + 3}
                    else:
                        allowed = {d_el + 1 + (1 if c.elem_nullable else 0)}
                    if c.max_def not in allowed:
                        raise ValueError(
                            f"{lpath}: list chunk max_def={c.max_def} does not "
                            f"match the emitted schema's def budget "
                            f"{sorted(allowed)}"
                        )
            if c.compression not in codec_ids:
                raise ValueError(f"{lpath}: unsupported compression {c.compression}")
            bad = set(c.encodings) - _STANDARD_ENCODINGS
            if bad:
                raise ValueError(f"{lpath}: non-standard encodings {bad} (FSST is not parquet)")
            if c.ptype == "BOOLEAN" and "RLE_DICTIONARY" in c.encodings:
                # legal per the format but unimplemented in major readers
                # (pyarrow: "Dictionary encoding not implemented for boolean")
                raise ValueError(
                    f"{lpath}: dictionary-encoded BOOLEAN is not readable by "
                    "standard readers; re-encode with policy 'plain'/'auto'"
                )
            if c.num_rows != nrows:
                raise ValueError(f"{lpath}: row count {c.num_rows} != {nrows}")

    out = bytearray(MAGIC)
    # per group: [(path, chunk, dict_off, data_off, total_bytes, uncomp_bytes)]
    group_meta: list[list[tuple[tuple[str, ...], EncodedChunk, int, int, int, int]]] = []
    for leaves in group_leaves:
        col_meta = []
        for lpath, c in leaves:
            dict_off = 0
            data_off = 0
            start = len(out)
            uncomp = 0
            for page in c.pages:
                off = len(out)
                if page.kind == "dict":
                    dict_off = off
                elif data_off == 0:
                    data_off = off
                header = _page_header(page, c.max_rep)
                out += header
                out += page.data
                uncomp += len(header) + page.uncompressed_size
            col_meta.append((lpath, c, dict_off, data_off, len(out) - start, uncomp))
        group_meta.append(col_meta)

    footer = CompactWriter()
    footer.field_i32(1, 1)  # version (parquet 2.0 semantics, file_writer.hh)
    first_group = groups[0]
    n_elems = 1 + sum(
        _schema_elements(CompactWriter(), n, s) for n, s in first_group.items()
    )
    footer.begin_field_list(2, CT_STRUCT, n_elems)
    footer.elem_struct_begin()  # root
    footer.field_string(4, "schema")
    footer.field_i32(5, len(first_group))
    footer.end_struct()
    for n, s in first_group.items():
        _schema_elements(footer, n, s)
    footer.field_i64(3, sum(group_rows))
    footer.begin_field_list(4, CT_STRUCT, len(group_meta))  # row_groups
    for col_meta, nrows in zip(group_meta, group_rows):
        footer.elem_struct_begin()
        footer.begin_field_list(1, CT_STRUCT, len(col_meta))  # columns
        for path_parts, c, dict_off, data_off, total, uncomp in col_meta:
            footer.elem_struct_begin()  # ColumnChunk
            footer.field_i64(2, data_off)  # file_offset
            footer.begin_field_struct(3)  # ColumnMetaData
            footer.field_i32(1, PHYS_ID[c.ptype])
            encs = sorted({ENCODINGS[p.encoding] for p in c.pages} | {ENCODINGS["RLE"]})
            footer.begin_field_list(2, CT_I32, len(encs))
            for e in encs:
                footer.elem_i32(e)
            footer.begin_field_list(3, CT_BINARY, len(path_parts))
            for p_ in path_parts:
                footer.elem_binary(p_.encode())
            footer.field_i32(4, codec_ids[c.compression])
            # num_values in parquet = number of LEVEL entries in the chunk
            footer.field_i64(5, sum(p.num_values for p in c.pages if p.kind == "data"))
            # total_uncompressed_size = headers + uncompressed page bodies;
            # total_compressed_size = on-disk bytes (headers + compressed)
            footer.field_i64(6, uncomp)
            footer.field_i64(7, total)
            footer.field_i64(9, data_off)
            if dict_off:
                footer.field_i64(11, dict_off)
            footer.end_struct()
            footer.end_struct()
        # RowGroup.total_byte_size = uncompressed column data (parquet.thrift)
        footer.field_i64(2, sum(u for *_, u in col_meta))
        footer.field_i64(3, nrows)
        footer.end_struct()  # RowGroup
    footer.field_string(6, "parquet4seastar_spark")
    meta_bytes = footer.finish()
    out += meta_bytes
    out += struct.pack("<I", len(meta_bytes))
    out += MAGIC
    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------------------
# reader


@dataclass
class LeafColumn:
    path: tuple[str, ...]
    ptype: str
    type_length: int
    max_def: int
    max_rep: int
    outer_optional: bool  # repetition of the first-level field
    elem_optional: bool  # leaf's own OPTIONAL flag (lists)
    converted: int | None
    precision: int | None
    scale: int | None
    logical_raw: dict | None = None  # parquet.thrift LogicalType union (field 10)
    chunk_meta: dict = field(default_factory=dict)


class ParquetFileReader:
    """Minimal standard-parquet reader: footer, schema walk, page scan,
    decode via the engine's codec kernels."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        if self.buf[:4] != MAGIC or self.buf[-4:] != MAGIC:
            if self.buf[-4:] == b"PARE":
                raise ValueError("encrypted parquet (PARE) not supported")
            raise ValueError("not a parquet file (bad magic)")
        (meta_len,) = struct.unpack_from("<I", self.buf, len(self.buf) - 8)
        meta_start = len(self.buf) - 8 - meta_len
        self.meta = CompactReader(self.buf, meta_start).read_struct()
        self.num_rows = self.meta[3]
        self.leaves = self._walk_schema(self.meta[2])
        row_groups = self.meta[4]
        # columns appear in leaf order per the spec; match by position (some
        # writers -- including the reference's fixture generator -- emit
        # inaccurate path_in_schema labels)
        self._groups: list[list[dict]] = []
        self._group_rows: list[int] = []
        for rg in row_groups:
            cols = rg[1]
            if len(cols) != len(self.leaves):
                raise ValueError(f"{len(cols)} column chunks != {len(self.leaves)} schema leaves")
            self._groups.append([c[3] for c in cols])
            self._group_rows.append(int(rg[3]))
        for i, leaf in enumerate(self.leaves):
            leaf.chunk_meta = self._groups[0][i]

    @staticmethod
    def _walk_schema(elements: list[dict]) -> list[LeafColumn]:
        """Flat SchemaElement list -> leaves with Dremel levels
        (reader_schema.cc:34-93: REPEATED => ++def,++rep; OPTIONAL => ++def)."""
        leaves: list[LeafColumn] = []
        pos = [1]  # skip root

        def walk(def_lvl: int, rep_lvl: int, path: tuple, depth: int, outer_opt: bool):
            el = elements[pos[0]]
            pos[0] += 1
            rep = el.get(3, 0)
            name = el[4].decode()
            d, r = def_lvl, rep_lvl
            if rep == 1:
                d += 1
            elif rep == 2:
                d += 1
                r += 1
            if depth == 0:
                outer_opt = rep == 1
            n_children = el.get(5)
            if n_children:
                for _ in range(n_children):
                    walk(d, r, path + (name,), depth + 1, outer_opt)
            else:
                leaves.append(
                    LeafColumn(
                        path=path + (name,),
                        ptype=PHYSICAL[el[1]],
                        type_length=el.get(2, 0),
                        max_def=d,
                        max_rep=r,
                        outer_optional=outer_opt,
                        elem_optional=rep == 1,
                        converted=el.get(6),
                        precision=el.get(8),
                        scale=el.get(7),
                        logical_raw=el.get(10),
                    )
                )

        root_children = elements[0].get(5, 0)
        for _ in range(root_children):
            walk(0, 0, (), 0, False)
        return leaves

    def column(self, name_or_path) -> LeafColumn:
        if isinstance(name_or_path, str):
            matches = [l for l in self.leaves if l.path[0] == name_or_path]
            if len(matches) != 1:
                raise KeyError(f"column {name_or_path}: {len(matches)} leaves")
            return matches[0]
        return next(l for l in self.leaves if l.path == tuple(name_or_path))

    def _logical(self, leaf: LeafColumn) -> str:
        if leaf.converted == 5 and leaf.precision is not None:
            base = f"decimal({leaf.precision},{leaf.scale})"
        elif leaf.ptype == "BYTE_ARRAY":
            base = "string" if leaf.converted in (0, 4, 19) else "binary"
        elif leaf.ptype == "INT96":
            base = "flba"  # read INT96 as opaque 12-byte values
        elif leaf.ptype == "FIXED_LEN_BYTE_ARRAY":
            base = "flba"
        elif leaf.converted == 6:
            base = "date"
        elif leaf.converted == 10:
            base = "timestamp_us"
        else:
            base = {"BOOLEAN": "bool", "INT32": "int32", "INT64": "int64",
                    "FLOAT": "float", "DOUBLE": "double"}[leaf.ptype]
        return f"list<{base}>" if leaf.max_rep else base

    def read_column(self, name_or_path):
        """Decode one leaf column to an arrow array (flat or list<...>),
        concatenated across all row groups."""
        leaf = self.column(name_or_path)
        idx = self.leaves.index(leaf)
        parts = [self._read_group_column(leaf, g[idx]) for g in self._groups]
        return parts[0] if len(parts) == 1 else pa.concat_arrays(parts)

    def _read_group_column(self, leaf: LeafColumn, cm: dict):
        if leaf.max_rep > 1:
            raise ValueError(
                f"{leaf.path}: nested repetition depth {leaf.max_rep} is not a "
                "single list<...> leaf; use read_column_tree for full nested "
                "assembly"
            )
        chunk = self._scan_chunk_pages(leaf, cm)
        # row count: flat -> level entries; list -> count of rep==0 entries,
        # which decode validates internally; precompute via a cheap pass
        if leaf.max_rep == 0:
            chunk.num_rows = sum(p.num_values for p in chunk.pages if p.kind == "data")
        else:
            chunk.num_rows = self._count_rows(chunk)
        return decode_chunk(chunk)

    def _scan_chunk_pages(self, leaf: LeafColumn, cm: dict) -> EncodedChunk:
        """Incremental Thrift page scan of one leaf chunk -> EncodedChunk
        (pages decompressed; num_rows left at -1 for the caller)."""
        if not cm:
            raise ValueError(f"{leaf.path}: no column chunk in row group")
        codec = {0: "uncompressed", 1: "snappy", 2: "gzip"}.get(cm[4])
        if codec is None:
            raise ValueError(f"{leaf.path}: unsupported compression codec id {cm[4]}")
        ptype = "FIXED_LEN_BYTE_ARRAY" if leaf.ptype == "INT96" else leaf.ptype
        type_length = 12 if leaf.ptype == "INT96" else leaf.type_length
        num_values = cm[5]
        pos = cm.get(11) or cm[9]  # dictionary_page_offset ?? data_page_offset
        pages: list[Page] = []
        seen_values = 0
        # pages decompress HERE (uniformly, incl. V2 re-framing below), so
        # the assembled chunk is always 'uncompressed'
        from .pages import _decompress

        while seen_values < num_values:
            r = CompactReader(self.buf, pos)
            ph = r.read_struct()
            data_start = r.pos
            size = ph[3]
            data = self.buf[data_start : data_start + size]
            pos = data_start + size
            if ph[1] == 2:  # DICTIONARY_PAGE
                dph = ph[7]
                if ENC_NAME[dph[2]] not in ("PLAIN", "PLAIN_DICTIONARY"):
                    raise ValueError("non-PLAIN dictionary page")
                raw = _decompress(data, codec)
                pages.append(Page("dict", "PLAIN", dph[1], dph[1], len(raw), len(raw), raw))
                continue
            if ph[1] == 3:  # DATA_PAGE_V2 (column_chunk_reader.cc:80-111)
                dp2 = ph[8]
                enc = ENC_NAME[dp2[4]]
                if enc == "PLAIN_DICTIONARY":
                    enc = "RLE_DICTIONARY"
                raw = self._reframe_v2_page(data, dp2, leaf, codec)
                pages.append(Page("data", enc, dp2[1], -1, len(raw), len(raw), raw))
                seen_values += dp2[1]
                continue
            if ph[1] != 0:
                raise ValueError(f"unsupported page type {ph[1]}")
            dp = ph[5]
            enc = ENC_NAME[dp[2]]
            if enc == "PLAIN_DICTIONARY":
                enc = "RLE_DICTIONARY"
            raw = _decompress(data, codec)
            pages.append(Page("data", enc, dp[1], -1, len(raw), len(raw), raw))
            seen_values += dp[1]

        logical = self._logical(leaf)
        chunk = EncodedChunk(
            ptype=ptype,
            logical=logical,
            nullable=(leaf.outer_optional if leaf.max_rep else leaf.max_def > 0),
            num_rows=-1,  # filled below
            num_nulls=1,  # force validity reconstruction from def levels
            cardinality=0,
            encodings=sorted({p.encoding for p in pages if p.kind == "data"}),
            compression="uncompressed",
            type_length=type_length,
            max_def=leaf.max_def,
            max_rep=leaf.max_rep,
            # derive element nullability from the LEVEL BUDGET, not the
            # leaf's own flag: an optional struct wrapping a required field
            # (list<struct>) contributes the extra def level the same way an
            # optional element does
            elem_nullable=(
                leaf.max_def - (1 if leaf.outer_optional else 0) - 1 >= 1
                if leaf.max_rep
                else False
            ),
            pages=pages,
        )
        return chunk

    # ---- general nested read: schema tree -> Dremel assembly -------------

    def _schema_raw_tree(self) -> list[dict]:
        """Nested SchemaElement form: [{'el': dict, 'children': [...]}] for
        each top-level column."""
        elements = self.meta[2]
        pos = [1]

        def walk():
            el = elements[pos[0]]
            pos[0] += 1
            n = el.get(5)
            return {"el": el, "children": [walk() for _ in range(n)] if n else []}

        return [walk() for _ in range(elements[0].get(5, 0))]

    def _el_base_logical(self, el: dict) -> tuple[str, str, int]:
        """(ptype, base logical, type_length) for a leaf SchemaElement."""
        ptype = PHYSICAL[el[1]]
        type_length = el.get(2, 0)
        conv = el.get(6)
        if conv == 5 and el.get(8) is not None:
            return ptype, f"decimal({el[8]},{el.get(7, 0)})", type_length
        if ptype == "INT96":
            return "FIXED_LEN_BYTE_ARRAY", "flba", 12
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            return ptype, "flba", type_length
        if ptype == "BYTE_ARRAY":
            return ptype, "string" if conv in (0, 4, 19) else "binary", 0
        if conv == 6:
            return ptype, "date", 0
        if conv == 10:
            return ptype, "timestamp_us", 0
        return ptype, {"BOOLEAN": "bool", "INT32": "int32", "INT64": "int64",
                       "FLOAT": "float", "DOUBLE": "double"}[ptype], 0

    def _column_token_tree(self, name: str):
        """Top-level column -> (token tree, opts, [(token_path, leaf_index,
        base_logical)] in schema-leaf order).  Covers modern 3-level
        LIST/MAP and struct groups PLUS the legacy pre-LogicalTypes shapes
        at any depth (reader_schema.cc:120-144 backward-compat rules):

        - a bare REPEATED field/group (no LIST wrapper) is the element of
          an implicit REQUIRED list;
        - a LIST group whose repeated child is a primitive, a multi-field
          group, or a single-field group named exactly ``array`` or
          ``<parent>_tuple`` is a 2-level list — the repeated node itself
          is the (required) element.

        Both map onto the same Dremel level geometry the modern shapes use
        (legacy 2-level == 3-level with a REQUIRED element), so assembly
        needs no separate path."""
        from .pages import _elem_pa_type

        raw = next(
            (r for r in self._schema_raw_tree() if r["el"][4].decode() == name), None
        )
        if raw is None:
            raise KeyError(name)
        opts: dict[str, bool] = {}
        leaf_infos: list[tuple[str, int, str]] = []
        leaf_by_path = {tuple(l.path): i for i, l in enumerate(self.leaves)}

        def join(p, tok):
            return f"{p}.{tok}" if p else tok

        def conv_node(node, prefix, spath, rep_consumed=False):
            el = node["el"]
            rep = el.get(3, 0)
            kids = node["children"]
            conv = el.get(6)
            lt = el.get(10) or {}
            if rep == 2 and not rep_consumed:
                # legacy bare repeated field (backward-compat rule 1): the
                # node IS the element of an implicit REQUIRED list.  This
                # also reads legacy MAP_KEY_VALUE repeated groups, as a
                # list<struct<key,value>> (the shape maps export as).
                opts[prefix] = False
                return ("list", conv_node(node, join(prefix, "l"), spath, True))
            opts[prefix] = rep == 1
            if not kids:
                ptype, base, tl = self._el_base_logical(el)
                li = leaf_by_path[spath]
                leaf_infos.append((prefix, li, base))
                return ("leaf", _elem_pa_type(base, tl))
            # ConvertedType LIST=3 / MAP=1 / MAP_KEY_VALUE=2;
            # LogicalType union: MAP = field 2, LIST = field 3
            is_list = conv == 3 or 3 in lt
            is_map = conv in (1, 2) or 2 in lt
            if (is_list or is_map) and len(kids) == 1 and kids[0]["el"].get(3) == 2:
                mid = kids[0]
                mkids = mid["children"]
                mname = mid["el"][4].decode()
                if is_map and len(mkids) == 2:
                    k = conv_node(mkids[0], join(prefix, "k"),
                                  spath + (mname, mkids[0]["el"][4].decode()))
                    v = conv_node(mkids[1], join(prefix, "v"),
                                  spath + (mname, mkids[1]["el"][4].decode()))
                    return ("map", k, v)
                # backward-compat rule 2 name test is EXACT (reader_schema.cc:
                # 131-132): the repeated group must be named "array" or
                # "<parent_list_name>_tuple".  A suffix match would misread a
                # standard 3-level list whose middle group happens to end in
                # "_tuple" under a differently-named parent.
                pname = el[4].decode()
                if len(mkids) == 1 and not (
                    mname == "array" or mname == f"{pname}_tuple"
                ):
                    # standard 3-level LIST: the repeated middle group's
                    # single child is the element
                    child = conv_node(mkids[0], join(prefix, "l"),
                                      spath + (mname, mkids[0]["el"][4].decode()))
                    return ("list", child)
                # legacy 2-level list (backward-compat rule 2): the repeated
                # child (primitive, multi-field group, or array/_tuple-named
                # group) is itself the REQUIRED element
                child = conv_node(mid, join(prefix, "l"), spath + (mname,), True)
                return ("list", child)
            fields = []
            for k in kids:
                fname = k["el"][4].decode()
                fields.append((fname, conv_node(k, join(prefix, f"s{fname}"), spath + (fname,))))
            return ("struct", fields)

        tree = conv_node(raw, "", (name,))
        return tree, opts, leaf_infos

    def read_column_tree(self, name: str) -> pa.Array:
        """Assemble a FULL top-level column of ANY nesting (struct / 3-level
        LIST / MAP, any composition) via the general Dremel assembler with
        the schema's real OPTIONAL flags (reference: record_reader.hh:469-505
        recursive assembly).  Returns one arrow array across all row groups;
        flat and single-list columns work too (same result as read_column)."""
        from .dremel import Leaf, assemble_tree
        from .pages import _decode_dremel_leaf

        tree, opts, leaf_infos = self._column_token_tree(name)
        parts = []
        for g, nrows in zip(self._groups, self._group_rows):
            leaves = {}
            for tok_path, li, base in leaf_infos:
                leaf = self.leaves[li]
                chunk = self._scan_chunk_pages(leaf, g[li])
                def_, rep, vals = _decode_dremel_leaf(chunk, base)
                leaves[tok_path] = Leaf(
                    tok_path, vals, def_, rep, leaf.max_def, leaf.max_rep
                )
            parts.append(assemble_tree(tree, leaves, nrows, opts))
        return parts[0] if len(parts) == 1 else pa.concat_arrays(parts)

    @staticmethod
    def _reframe_v2_page(data: bytes, dp2: dict, leaf: LeafColumn, codec: str) -> bytes:
        """V2 data page -> our V1 layout ([u32+rep][u32+def][values], raw).

        V2 layout (column_chunk_reader.cc:80-111): rep levels (RLE, no
        length prefix) + def levels (RLE, no prefix) + values; LEVELS are
        never compressed, values are iff is_compressed (field 7, default
        true).
        """
        from .pages import _decompress

        rep_len = dp2.get(6, 0)
        def_len = dp2.get(5, 0)
        levels_end = rep_len + def_len
        values = data[levels_end:]
        if dp2.get(7, True) and codec != "uncompressed":
            values = _decompress(values, codec)
        out = bytearray()
        if leaf.max_rep:
            out += struct.pack("<I", rep_len) + data[:rep_len]
        if leaf.max_def:
            out += struct.pack("<I", def_len) + data[rep_len:levels_end]
        out += values
        return bytes(out)

    @staticmethod
    def _count_rows(chunk: EncodedChunk) -> int:
        from .levels import decode_levels_v1
        from .pages import _decompress

        rows = 0
        for page in chunk.pages:
            if page.kind != "data":
                continue
            raw = _decompress(page.data, chunk.compression)
            rep, _ = decode_levels_v1(raw, chunk.max_rep, page.num_values)
            rows += int((rep == 0).sum())
        return rows
