"""Distributed decode: pages DataFrame -> reconstructed column values.

Mirrors the reference read path (SURVEY.md §3.2): pages grouped per chunk,
dictionary page loaded first, values reassembled with nulls from def levels.
Spark shape: groupBy(part_key, chunk_seq) -> applyInArrow over the page
rows of the row_id chunk + the requested column chunks; output is
(row_id, <column values>) rows, joinable back to the source for the
round-trip sha256 verification (BASELINE.json per-row invariant).

Nested columns arrive as '<col>#g<i>' leaf chunks from the ONE recursive
Dremel walker (codecs/dremel.py); each leaf's chunk.logical carries the
node-path spec, so reassembly needs no shape-specific naming conventions
(reference: the single recursive record_reader, record_reader.hh:469-505).

Arrow end-to-end: page payloads arrive as arrow binary, decoded values
leave as arrow arrays -- the decoded strings never materialize as Python
objects.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..codecs.dremel import build_tree, tree_arrow_type
from ..codecs.pages import (
    EncodedChunk,
    Page,
    _elem_pa_type,
    decode_chunk,
    decode_dremel_column,
)

_SPARK_TYPES = {
    "string": "string",
    "binary": "binary",
    "flba": "binary",
    "int32": "int",
    "int64": "long",
    "timestamp_us": "timestamp_ntz",
    "date": "date",
    "float": "float",
    "double": "double",
    "bool": "boolean",
}

_PA_TYPES = {
    "string": pa.string(),
    "binary": pa.binary(),
    "flba": pa.binary(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "timestamp_us": pa.timestamp("us"),
    "date": pa.date32(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
}


def _spark_type(logical: str) -> str:
    if logical.startswith("list<") and logical.endswith(">"):
        return f"array<{_spark_type(logical[5:-1])}>"
    if logical.startswith("decimal("):
        return logical  # 'decimal(p,s)' is valid Spark DDL as-is
    return _SPARK_TYPES[logical]


def _pa_type(logical: str) -> pa.DataType:
    if logical.startswith("list<") and logical.endswith(">"):
        return pa.list_(_pa_type(logical[5:-1]))
    if logical.startswith("decimal("):
        p, s = logical[8:-1].split(",")
        return pa.decimal128(int(p), int(s))
    return _PA_TYPES[logical]


def _spark_type_of_pa(t: pa.DataType):
    from pyspark.sql.pandas.types import from_arrow_type

    return from_arrow_type(t)


_META_FIELDS = (
    "ptype", "logical", "nullable", "num_rows", "num_nulls", "cardinality",
    "encodings", "compression", "type_length", "max_def", "max_rep", "elem_nullable",
)


def _rebuild_chunk(tbl: pa.Table, idxs: list[int]) -> EncodedChunk:
    """Build an EncodedChunk from page rows ``idxs`` of an arrow table.

    Metadata scalars are read per row (tens of rows); page payloads stay
    zero-copy arrow buffers -- they never round-trip through Python bytes.
    """
    cols = {name: tbl.column(name) for name in (
        "page_idx", "page_kind", "encoding", "num_values", "num_non_null",
        "uncompressed_size", "compressed_size", "data", *_META_FIELDS,
    )}
    idxs = sorted(idxs, key=lambda i: cols["page_idx"][i].as_py())
    f = idxs[0]
    chunk = EncodedChunk(
        ptype=cols["ptype"][f].as_py(),
        logical=cols["logical"][f].as_py(),
        nullable=bool(cols["nullable"][f].as_py()),
        num_rows=int(cols["num_rows"][f].as_py()),
        num_nulls=int(cols["num_nulls"][f].as_py()),
        cardinality=int(cols["cardinality"][f].as_py()),
        encodings=(cols["encodings"][f].as_py() or "").split(","),
        compression=cols["compression"][f].as_py(),
        type_length=int(cols["type_length"][f].as_py() or 0),
        max_def=int(cols["max_def"][f].as_py() if cols["max_def"][f].is_valid else -1),
        max_rep=int(cols["max_rep"][f].as_py() or 0),
        elem_nullable=bool(cols["elem_nullable"][f].as_py() or False),
    )
    data = cols["data"]
    for i in idxs:
        chunk.pages.append(
            Page(
                kind=cols["page_kind"][i].as_py(),
                encoding=cols["encoding"][i].as_py(),
                num_values=int(cols["num_values"][i].as_py()),
                num_non_null=int(cols["num_non_null"][i].as_py()),
                uncompressed_size=int(cols["uncompressed_size"][i].as_py()),
                compressed_size=int(cols["compressed_size"][i].as_py()),
                data=data[i].as_buffer(),  # zero-copy view into the arrow batch
            )
        )
    return chunk


def prune_chunks(
    encoded: DataFrame,
    column: str,
    *,
    gt=None,
    ge=None,
    lt=None,
    le=None,
    eq=None,
    isin=None,
) -> DataFrame:
    """Stats-based chunk skipping (beyond the reference: it never writes
    ColumnMetaData statistics).

    Drops every (part_key, chunk_seq) group whose ``column`` chunk min/max
    range provably cannot satisfy the predicate -- the other columns' pages
    for those rows go with it.  Pruning is CONSERVATIVE (stats are
    ulp-widened doubles / truncate-and-incremented byte prefixes): decode
    output must still be filtered exactly; this only avoids decoding chunks
    that cannot match.  At 100 TB this is the difference between decoding
    every page and touching only the value-range-relevant ones.
    """
    ch = encoded.filter((F.col("kind") == "chunk") & (F.col("column") == column))
    probe = (
        eq
        if eq is not None
        else (isin[0] if isin else (gt if gt is not None else (ge if ge is not None else (lt if lt is not None else le))))
    )
    is_bin = isinstance(probe, (str, bytes))
    lo_col = F.col("stat_min_bin") if is_bin else F.col("stat_min_num")
    hi_col = F.col("stat_max_bin") if is_bin else F.col("stat_max_num")

    def _lit(v):
        if isinstance(v, str):
            return F.encode(F.lit(v), "utf-8")
        if isinstance(v, bytes):
            return F.lit(v)
        return F.lit(float(v))

    # a chunk SURVIVES unless its stats prove no row can match; missing
    # stats always survive
    cond = F.lit(True)
    if gt is not None:
        cond = cond & (hi_col.isNull() | (hi_col > _lit(gt)))
    if ge is not None:
        cond = cond & (hi_col.isNull() | (hi_col >= _lit(ge)))
    if lt is not None:
        cond = cond & (lo_col.isNull() | (lo_col < _lit(lt)))
    if le is not None:
        cond = cond & (lo_col.isNull() | (lo_col <= _lit(le)))
    # point-lookup conditions (eq / isin): range test + bloom membership.
    # min/max cannot prune point lookups on unsorted data (every chunk's
    # range contains the literal); the bloom proves ABSENCE, so a chunk
    # additionally survives only if its bloom is missing or reports all k
    # probe bits set.  The fixed bloom size makes the probe positions pure
    # python constants -> a handful of element_at/shift JVM expressions
    # over the tiny chunk rows.
    def _point_cond(v):
        c = (lo_col.isNull() | (lo_col <= _lit(v))) & (
            hi_col.isNull() | (hi_col >= _lit(v))
        )
        if (
            "bloom" in encoded.columns
            and "ptype" in encoded.columns
            and isinstance(v, (str, bytes, int))
            and not isinstance(v, bool)
        ):
            from ..codecs.bloom import probe_positions

            # the bloom only speaks the column's PHYSICAL value domain: a
            # str literal against an int column (or vice versa) hashes in
            # a different domain than the stored bits, so consulting it
            # would wrongly drop chunks that match under Spark's
            # cast-equality — gate on the chunk's ptype and fall back to
            # conservative survival on any mismatch
            applicable = (
                F.col("ptype") == "BYTE_ARRAY"
                if isinstance(v, (str, bytes))
                else F.col("ptype").isin("INT32", "INT64")
            )
            present = F.lit(True)
            for b in probe_positions(v):
                word = F.element_at(F.col("bloom"), b // 64 + 1)
                present = present & (
                    F.shiftrightunsigned(word, b % 64).bitwiseAND(F.lit(1)) == 1
                )
            c = c & (~applicable | F.col("bloom").isNull() | present)
        return c

    if eq is not None:
        cond = cond & _point_cond(eq)
    if isin:
        any_v = _point_cond(isin[0])
        for v in isin[1:]:
            any_v = any_v | _point_cond(v)
        cond = cond & any_v
    # DROP-set anti-join, not a keep-set semi-join: chunks whose stats
    # PROVE no row matches are removed; everything else (missing stats, or
    # a typo'd/absent column -> empty drop set) survives.  Fail-safe by
    # construction with zero eager work -- an absent column simply prunes
    # nothing, and decode_table's schema discovery still raises on a column
    # that truly isn't in the table.  The drop set (pruned chunks only) is
    # the smaller side, so the broadcast stays cheap at scale.
    drop = ch.filter(~cond).select("part_key", "chunk_seq").distinct()
    return encoded.join(F.broadcast(drop), ["part_key", "chunk_seq"], "left_anti")


def decode_table(
    encoded: DataFrame,
    columns: list[str],
    *,
    schema: dict[str, str] | None = None,
    include_part_key: bool = False,
) -> DataFrame:
    """Decode the given columns from a pages DataFrame.

    Returns a DataFrame (row_id, *columns).  Output types follow the chunk
    metadata (logical types).  ``schema`` (leaf name -> logical type, or
    -> (logical, type_length) for FLBA leaves) skips discovery entirely;
    otherwise logical types are read from the tiny ``kind='chunk'`` lineage
    rows (one row per chunk, payload column never touched) -- not from a
    scan of the page rows.

    Schema discovery is EAGER (the output schema must be known at plan
    time), so on a freshly-built encode plan it would run the entire encode
    job once for discovery and AGAIN for the decode pass.  When the pages
    frame is COMPUTED (its plan contains a Python stage, i.e. it chains
    straight off encode_table) and the caller has not already persisted it,
    it is persisted here before the discovery collect.  A storage-backed
    frame (plain file scan — the 100 TB deployment shape) is NOT persisted:
    discovery's kind='chunk' filter pushes down to the scan and touches
    only the tiny chunk rows, and caching the full pages table would block
    exactly that pushdown.  Pass ``schema=`` to skip discovery and keep
    the plan fully lazy.
    """
    # nested columns are stored as '<col>#g<i>' dremel leaf chunks
    name_filter = F.col("column").isin(["row_id", *columns])
    for c in columns:
        name_filter = name_filter | F.col("column").startswith(f"{c}#g")

    if schema is None:
        lvl = encoded.storageLevel
        try:
            plan_str = encoded._jdf.queryExecution().analyzed().toString()
            computed = (
                "MapInArrow" in plan_str
                or "MapInPandas" in plan_str
                or "FlatMapGroupsIn" in plan_str
                or "pythonUDF" in plan_str
            )
        except Exception:  # plan introspection is best-effort: persisting a
            computed = True  # storage-backed frame is wasteful but correct
        if computed and not (lvl.useMemory or lvl.useDisk):
            encoded = encoded.persist()
        schema = {
            r["column"]: (r["logical"], int(r["type_length"] or 0))
            for r in encoded.filter((F.col("kind") == "chunk") & name_filter)
            .select("column", "logical", "type_length")
            .distinct()
            .collect()
        }
    else:
        # values may be 'logical' or ('logical', type_length) -- FLBA leaves
        # need the width to build their target type
        schema = {
            c: (v if isinstance(v, tuple) else (v, 0)) for c, v in schema.items()
        }
    pages = encoded.filter((F.col("kind") == "page") & name_filter)

    # requested column -> None (scalar / plain-list leaf) or the ordered
    # dremel leaf list [(leaf_name, path, leaf_logical, type_length)]
    members: dict = {}
    for c in columns:
        if c in schema:
            members[c] = None
            continue
        leaves = []
        for name, (lg, tl) in schema.items():
            if name.startswith(f"{c}#g") and lg.startswith("g:"):
                path, leaf_logical = lg[2:].rsplit("|", 1)
                leaves.append((int(name.rsplit("#g", 1)[1]), name, path, leaf_logical, tl))
        if not leaves:
            raise ValueError(f"column not present in encoded table: {c}")
        members[c] = [(name, path, lgl, tl) for _, name, path, lgl, tl in sorted(leaves)]
    if "row_id" not in schema:
        raise ValueError("row_id column not present in encoded table")

    def _target_pa(c: str) -> pa.DataType:
        tree = build_tree(
            [(path, _elem_pa_type(lgl, tl)) for _, path, lgl, tl in members[c]]
        )
        return tree_arrow_type(tree)

    # build the output schema as a real StructType (a DDL string would need
    # backtick-escaping of every nested field name; types.from_arrow_type
    # sidesteps parsing entirely)
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.types import _parse_datatype_string

    def _spark_col_type(c: str):
        if members[c] is None:
            return _parse_datatype_string(_spark_type(schema[c][0]))
        return _spark_type_of_pa(_target_pa(c))

    from pyspark.sql.types import StringType

    out_schema = StructType(
        ([StructField("_part_key", StringType())] if include_part_key else [])
        + [StructField("row_id", LongType())]
        + [StructField(c, _spark_col_type(c)) for c in columns]
    )
    cols = columns
    logicals = schema
    targets = {c: _target_pa(c) for c in columns if members[c] is not None}

    def decode_group(tbl: pa.Table) -> pa.Table:
        from parquet4seastar_spark import _alloc

        _alloc.tune_allocator()
        tbl = tbl.combine_chunks()
        by_col: dict[str, list[int]] = {}
        for i, c in enumerate(tbl.column("column").to_pylist()):
            by_col.setdefault(c, []).append(i)
        out_arrays = [decode_chunk(_rebuild_chunk(tbl, by_col["row_id"])).cast(pa.int64())]
        names = ["row_id"]
        if include_part_key:
            pk = tbl.column("part_key")[0].as_py()
            out_arrays.insert(0, pa.array([pk] * len(out_arrays[0]), type=pa.string()))
            names.insert(0, "_part_key")
        for c in cols:
            if members[c] is None:
                arr = decode_chunk(_rebuild_chunk(tbl, by_col[c]))
                target = _pa_type(logicals[c][0])
            else:
                arr = decode_dremel_column(
                    {name: _rebuild_chunk(tbl, by_col[name]) for name, _, _, _ in members[c]}
                )
                target = targets[c]
            if arr.type != target:
                arr = arr.cast(target)
            out_arrays.append(arr)
            names.append(c)
        return pa.table(dict(zip(names, out_arrays)))

    return pages.groupBy("part_key", "chunk_seq").applyInArrow(decode_group, schema=out_schema)
