"""Distributed PAR1 emission: executors write the engine's own parquet.

The write-side completion of the file-format story. ``parquet_writer``
proved the engine can emit a readable PAR1 file; this sink makes that a
first-class *distributed* output: every task writes its own row group's
worth of data as one engine-written parquet file directly into ``out_dir``
(atomic dot-prefixed temp + rename, the ``chunk_sink`` idempotency
contract), and only a manifest row — file, rows, values, bytes, checksum —
crosses to the JVM. The result directory is a plain parquet dataset that
``spark.read.parquet`` / DuckDB / pyarrow scan with zero engine code,
mirroring the reference's ``RowGroupSerializer``/``FileSerializer`` split
(``/root/reference/src/parquet/file_writer.cc:60-236``: per-row-group
column serialization under a shared file writer contract).

Scale shape (the 100-TB plan): the JVM ships only ``(file, row_group)``
descriptors to tasks; each task streams its row group through pyarrow,
encodes with the engine's kernels, and writes to shared storage itself —
the encoded payload never transits the JVM, and file names are
content+source tagged so task retries overwrite with identical bytes
instead of duplicating.

Column mapping is derived from the Arrow schema — flat
int32/int64/float/double/bool/string/binary leaves (nullable supported),
date32 / timestamp[ms|us] (stored as annotated ints),
``list<scalar>`` columns (OPTIONAL slots and nullable elements included),
structs of scalar fields, and ``map<scalar, scalar>`` columns — all via
rep/def levels with strings extracted zero-copy from the Arrow buffers.
Any DEEPER nesting (lists/structs/maps stacked to arbitrary depth) falls
back to the general vectorized rep/def walker
(``arrow_nested.ArrowColumn``); only leaf types neither path supports
fail loudly. ``encodings='auto'`` applies the engine's
codec selector per column per file; ``resume=True`` rebuilds manifest
rows for already-committed files from their footer metadata instead of
re-encoding (checkpoint resume for the parquet output).
"""

from __future__ import annotations

import os

MANIFEST_SCHEMA = ("file string, n_rows bigint, n_values bigint, "
                   "bytes bigint, checksum string, encodings string, "
                   "stats string")

_FLAT_PHYS = {"int32": "int32", "int64": "int64", "float": "float",
              "double": "double", "bool": "boolean"}


def _valid_mask(col, nullable: bool):
    """Validity mask for one node: observed nulls, else an ALL-TRUE mask
    when the Arrow FIELD says nullable. Parquet repetition must follow
    the SCHEMA, not the data — otherwise two partitions of one dataset
    write different file schemas (REQUIRED in the null-free partition,
    OPTIONAL in the rest) and every schema-checked reader of the
    directory fails. Matches Spark's own parquet writer (nullable Spark
    field -> OPTIONAL always)."""
    import numpy as np
    if col.null_count:
        return ~np.asarray(col.is_null())
    return np.ones(len(col), dtype=bool) if nullable else None


def _scalar_parts(col, name: str, nullable: bool = False):
    """Arrow scalar array -> (phys, slot-aligned values, valid, is_utf8).

    The vectorized extraction shared by flat columns, struct fields, list
    elements and map keys/values: strings/binary become a
    ``ba.ByteArrayView`` straight from the Arrow offsets/values buffers
    (``ba.from_arrow`` — no per-row Python, the ``encode_arrow`` hot-path
    shape), numerics a numpy view; nulls are masked via ``valid`` with
    slots filled by a typed zero (the writer drops them by mask).
    ``nullable`` (the Arrow FIELD's flag) forces an OPTIONAL mask even
    when this batch happens to contain no nulls."""
    import pyarrow as pa

    from ..kernels import ba

    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
            or pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        utf8 = not (pa.types.is_binary(typ) or pa.types.is_large_binary(typ))
        valid = _valid_mask(col, nullable)
        if col.null_count:
            col = col.fill_null("" if utf8 else b"")
        return "byte_array", ba.from_arrow(col), valid, utf8
    if str(typ) in _FLAT_PHYS:
        valid = _valid_mask(col, nullable)
        if col.null_count:
            col = col.fill_null(False if str(typ) == "bool" else 0)
        return (_FLAT_PHYS[str(typ)], col.to_numpy(zero_copy_only=False),
                valid, False)
    raise ValueError(f"column {name}: arrow type {typ} out of "
                     "parquet_sink scope")


def _leaf_parts(col, name: str, annotations: dict, decimals: dict,
                allow_flba: bool = True, nullable: bool = False):
    """``_scalar_parts`` plus temporal/decimal handling for ANY leaf
    position (flat columns, struct fields at any depth, list/map
    elements): date32/timestamp store as annotated ints keyed by the
    dotted leaf name ``name`` (NTZ-aware, same rules as flat columns);
    decimal128 becomes minimal-width BE FLBA when the leaf shape allows
    it (``allow_flba=False`` under REPEATED leaves — the writer fails
    loudly on list<FLBA>, so the error surfaces at spec parse)."""
    import numpy as np
    import pyarrow as pa

    typ = col.type
    if pa.types.is_decimal128(typ):
        if not allow_flba:
            raise ValueError(f"column {name}: decimal under a repeated "
                             "leaf is out of writer scope (list<FLBA>)")
        from ..logical import decimal_flba_from_arrow
        valid = _valid_mask(col, nullable)
        mat, precision, scale = decimal_flba_from_arrow(col)
        decimals[name] = (precision, scale)
        return f"flba:{mat.shape[1]}", mat, valid, False
    if pa.types.is_date32(typ) or pa.types.is_timestamp(typ):
        if pa.types.is_date32(typ):
            phys, ann = "int32", "date"
            col = col.cast(pa.int32())
        else:
            unit = typ.unit
            if unit not in ("ms", "us"):
                raise ValueError(f"column {name}: timestamp[{unit}] "
                                 "out of scope (ms/us only)")
            phys = "int64"
            # tz-aware arrow timestamps are UTC instants; tz-NAIVE ones
            # must stay NTZ (see specs_from_arrow docstring)
            ann = f"timestamp_{unit}" if typ.tz is not None \
                else f"timestamp_ntz_{unit}"
            col = col.cast(pa.timestamp(unit)).cast(pa.int64())
        annotations[name] = ann
        valid = _valid_mask(col, nullable)
        if col.null_count:
            col = col.fill_null(0)
        return phys, col.to_numpy(zero_copy_only=False), valid, False
    return _scalar_parts(col, name, nullable=nullable)


def _repeated_parts(col, name: str, nullable: bool = False):
    """Arrow list/map array -> (lengths, valid, element range) with the
    null-slot contract enforced: a null slot must have a zero extent (the
    Arrow layout every Spark/pyarrow producer emits)."""
    import numpy as np

    offsets = np.asarray(col.offsets)
    lengths = np.diff(offsets).astype(np.int64)
    valid = _valid_mask(col, nullable)
    if col.null_count and lengths[~valid].any():
        raise ValueError(f"column {name}: null list slot with a "
                         "non-empty extent is out of sink scope")
    return lengths, valid, int(offsets[0]), int(offsets[-1])


# default dictionary choice per phys (overridden by encodings='auto')
_DICT_DEFAULT = ("int32", "int64", "byte_array")


def specs_from_arrow(tbl):
    """Arrow table -> (specs, utf8 keys, temporal annotations, decimals).

    The bridge between ``mapInArrow`` batches and ``parquet_writer``:
    list columns become ``ListColumn`` (offsets -> lengths, flattened
    values; OPTIONAL slots and nullable elements carried as masks),
    ``list<list<scalar>>`` becomes ``NestedListColumn``,
    ``list<struct<scalars>>`` becomes ``ListStructColumn``, structs
    become ``StructColumn`` (struct-in-struct recursively; list fields
    as nested ``ListColumn`` specs with elements under null ancestors
    dropped), maps become ``MapColumn``, nullable flat columns carry
    their validity mask, strings get the UTF8 annotation (dotted keys —
    ``s.f``, ``m.key`` — for nested leaves), date32/timestamp leaves AT
    ANY POSITION store as annotated int32/int64 (DATE / TIMESTAMP
    converted types, NTZ-aware), decimal128 leaves store as big-endian
    FLBA at the minimal width for their precision (the reference's
    DecimalSize coercion, ``arrow/writer.cc:572-604``) with
    ``decimals[key] = (p, s)`` — decimals only outside repeated leaves
    on the fast paths (no list<FLBA>). Shapes the specialized paths
    don't cover (3-deep lists, nesting inside list<struct> elements,
    nested map values, ...) fall back to ``arrow_nested.ArrowColumn``,
    the general vectorized walker; genuinely unsupported leaf types
    (ns/s timestamps, arbitrary extension types) still fail loudly."""
    import numpy as np
    import pyarrow as pa

    from . import parquet_writer as pw

    specs, utf8, annotations, decimals = [], set(), {}, {}

    def _spec(col, name, nullable):
        """Specialized fast-path spec for one column (``nullable`` = the
        Arrow FIELD's flag; child nullability comes from the child
        fields, so partitions with and without observed nulls emit the
        SAME parquet schema). Raises ValueError on shapes these paths
        don't express — the caller falls back to the general rep/def
        walker (``arrow_nested.ArrowColumn``)."""
        typ = col.type
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            lengths, valid, lo, hi = _repeated_parts(col, name, nullable)
            child = col.values.slice(lo, hi - lo)
            ctyp = child.type
            e_null = typ.value_field.nullable
            if pa.types.is_list(ctyp) or pa.types.is_large_list(ctyp):
                # list<list<scalar>> -> NestedListColumn (max_rep = 2);
                # a third list level is out of writer scope
                ilengths, ivalid, ilo, ihi = _repeated_parts(
                    child, f"{name}.element", e_null)
                elems = child.values.slice(ilo, ihi - ilo)
                ephys, evals, evalid, eutf8 = _leaf_parts(
                    elems, name, annotations, decimals,
                    allow_flba=False,
                    nullable=ctyp.value_field.nullable)
                if eutf8:
                    utf8.add(name)
                return pw.NestedListColumn(
                    name, ephys, evals, lengths, ilengths,
                    use_dictionary=ephys in _DICT_DEFAULT,
                    valid=valid, inner_valid=ivalid,
                    element_valid=evalid)
            elif pa.types.is_struct(ctyp):
                # list<struct<scalars>> -> ListStructColumn: one REPEATED
                # leaf per field, values/masks per element slot
                evalid = _valid_mask(child, e_null)
                fields = []
                for i in range(ctyp.num_fields):
                    fld = ctyp.field(i)
                    fphys, fvals, fvalid, futf8 = _leaf_parts(
                        child.field(i), f"{name}.{fld.name}",
                        annotations, decimals, allow_flba=False,
                        nullable=fld.nullable)
                    if futf8:
                        utf8.add(f"{name}.{fld.name}")
                    fields.append((fld.name, fphys, fvals, fvalid,
                                   fphys in _DICT_DEFAULT))
                return pw.ListStructColumn(
                    name, fields, lengths, valid=valid,
                    element_valid=evalid)
            else:
                ephys, evals, evalid, eutf8 = _leaf_parts(
                    child, name, annotations, decimals,
                    allow_flba=False, nullable=e_null)
                if eutf8:
                    utf8.add(name)
                return pw.ListColumn(
                    name, ephys, evals, lengths,
                    use_dictionary=ephys in _DICT_DEFAULT,
                    valid=valid, element_valid=evalid)
        elif pa.types.is_struct(typ):
            def _struct_spec(scol, dotted, s_null):
                svalid = _valid_mask(scol, s_null)
                fields = []
                styp = scol.type
                for i in range(styp.num_fields):
                    fld = styp.field(i)
                    fcol = scol.field(i)
                    fdotted = f"{dotted}.{fld.name}"
                    if pa.types.is_struct(fld.type):
                        # struct-in-struct: recursive group node; field
                        # arrays stay top-level-row aligned in Arrow
                        fields.append((fld.name,
                                       _struct_spec(fcol, fdotted,
                                                    fld.nullable)))
                        continue
                    if pa.types.is_list(fld.type) or \
                            pa.types.is_large_list(fld.type):
                        # list<scalar> inside a struct: lengths stay
                        # row-aligned; elements under a null struct row
                        # are dropped (the writer requires length 0
                        # below a null ancestor)
                        flengths, flvalid, flo, fhi = _repeated_parts(
                            fcol, fdotted, fld.nullable)
                        fchild = fcol.values.slice(flo, fhi - flo)
                        if svalid is not None and \
                                flengths[~svalid].any():
                            keep = np.repeat(svalid, flengths)
                            fchild = fchild.filter(
                                pa.array(keep, pa.bool_()))
                            flengths = np.where(svalid, flengths, 0)
                        fphys, fvals, fevalid, futf8 = _leaf_parts(
                            fchild, fdotted, annotations, decimals,
                            allow_flba=False,
                            nullable=fld.type.value_field.nullable)
                        if futf8:
                            utf8.add(fdotted)
                        fields.append((fld.name, pw.ListColumn(
                            fld.name, fphys, fvals, flengths,
                            use_dictionary=fphys in _DICT_DEFAULT,
                            valid=flvalid, element_valid=fevalid)))
                        continue
                    fphys, fvals, fvalid, futf8 = _leaf_parts(
                        fcol, fdotted, annotations, decimals,
                        nullable=fld.nullable)
                    if futf8:
                        utf8.add(fdotted)
                    fields.append((fld.name, fphys, fvals, fvalid,
                                   fphys in _DICT_DEFAULT))
                return pw.StructColumn(dotted.rsplit(".", 1)[-1], fields,
                                       valid=svalid)
            return _struct_spec(col, name, nullable)
        elif pa.types.is_map(typ):
            lengths, valid, lo, hi = _repeated_parts(col, name, nullable)
            keys = col.keys.slice(lo, hi - lo)
            items = col.items.slice(lo, hi - lo)
            if keys.null_count:
                raise ValueError(f"column {name}: parquet map keys cannot "
                                 "be null")
            kphys, kvals, _kvalid, kutf8 = _scalar_parts(keys,
                                                         f"{name}.key")
            vphys, vvals, vvalid, vutf8 = _leaf_parts(
                items, f"{name}.value", annotations, decimals,
                allow_flba=False, nullable=typ.item_field.nullable)
            if kutf8:
                utf8.add(f"{name}.key")
            if vutf8:
                utf8.add(f"{name}.value")
            return pw.MapColumn(
                name, kphys, kvals, vphys, vvals, lengths,
                valid=valid, value_valid=vvalid,
                key_use_dictionary=kphys in _DICT_DEFAULT,
                value_use_dictionary=vphys in _DICT_DEFAULT)
        else:
            phys, vals, valid, is_utf8 = _leaf_parts(
                col, name, annotations, decimals, nullable=nullable)
            if is_utf8:
                utf8.add(name)
            return (name, phys, vals, valid, phys == "byte_array")

    for name in tbl.column_names:
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            # single unsliced chunk: skip combine_chunks' copy
            if col.num_chunks == 1 and col.chunk(0).offset == 0:
                col = col.chunk(0)
            else:
                col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):   # older pyarrow: 1-chunk CA
            col = col.chunk(0) if col.num_chunks \
                else pa.array([], type=col.type)
        nullable = tbl.schema.field(name).nullable
        snap = (set(utf8), dict(annotations), dict(decimals))
        try:
            specs.append(_spec(col, name, nullable))
        except ValueError:
            # shape (or layout contract) outside the specialized fast
            # paths — deeper nesting, nested list<struct> elements,
            # nested map values, null list slots with extents: hand the
            # whole column to the general rep/def walker, which harvests
            # its own annotation keys (write_file merges them). Roll
            # back any half-recorded keys from the failed attempt first;
            # a column NO path supports re-raises from the walker.
            from .arrow_nested import ArrowColumn
            utf8.clear()
            utf8.update(snap[0])
            annotations.clear()
            annotations.update(snap[1])
            decimals.clear()
            decimals.update(snap[2])
            specs.append(ArrowColumn(name, col, nullable=nullable))
    return specs, utf8, annotations, decimals


def auto_encodings(specs) -> tuple:
    """Run the engine's codec auto-selector over extracted specs and map
    its per-chunk choice onto the parquet writer's encoding surface:
    RLE / RLE_DICTIONARY -> dictionary pages, DELTA_BINARY_PACKED ->
    delta pages, DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY -> the
    matching byte-array delta pages; the one choice parquet can't
    express (FSST) -> PLAIN (the dict fallback still guards accidental
    dictionary blowups). Returns (new_specs, delta_columns, ba_delta)
    where ``ba_delta`` maps dotted leaf name -> 'delta_length' |
    'delta_byte_array' — the same decision the chunk format makes, one
    per column per file, so each output file is independently optimal
    like each chunk is."""
    import numpy as np

    from .. import chunk as chunkmod, selector
    from . import parquet_writer as pw
    from ..kernels import ba

    def _dense(phys, vals, valid):
        if valid is None:
            return vals
        idx = np.flatnonzero(np.asarray(valid, dtype=bool))
        if phys == "byte_array":
            return ba.take(ba.as_view(vals), idx)
        return np.asarray(vals)[idx]

    def _choose(dotted_name, phys, vals, valid):
        """(use_dict, delta) for one leaf; None when the selector has no
        say (floats/bools keep their default encodings)."""
        if phys in ("int32", "int64"):
            codec = selector.select_int_codec(
                np.asarray(_dense(phys, vals, valid)), phys)
            if codec == chunkmod.DELTA_BINARY_PACKED:
                delta_cols.add(dotted_name)
            return codec in (chunkmod.RLE, chunkmod.RLE_DICTIONARY)
        if phys == "byte_array":
            codec = selector.select_bytes_codec(_dense(phys, vals, valid),
                                                parquet_expressible=True)
            if codec == chunkmod.DELTA_LENGTH_BYTE_ARRAY:
                ba_delta[dotted_name] = "delta_length"
            elif codec == chunkmod.DELTA_BYTE_ARRAY:
                ba_delta[dotted_name] = "delta_byte_array"
            return codec == chunkmod.RLE_DICTIONARY
        return None

    out, delta_cols, ba_delta = [], set(), {}
    for s in specs:
        if hasattr(s, "pcs_leaves"):
            # general-walker column: run the selector over each leaf's
            # dense (null-free) value stream and flip the leaf's own
            # dictionary flag in place — the walker owns its leaves
            for leaf in s.pcs_leaves():
                pick = _choose(leaf.name, leaf.phys, leaf.dense, None)
                if pick is not None:
                    leaf.use_dictionary = bool(pick)
            out.append(s)
        elif isinstance(s, pw.ListColumn):
            pick = _choose(s.name, s.phys, s.values, s.element_valid)
            out.append(pw.ListColumn(
                s.name, s.phys, s.values, s.lengths,
                use_dictionary=bool(pick), valid=s.valid,
                element_valid=s.element_valid))
        elif isinstance(s, pw.NestedListColumn):
            pick = _choose(s.name, s.phys, s.values, s.element_valid)
            out.append(pw.NestedListColumn(
                s.name, s.phys, s.values, s.outer_lengths,
                s.inner_lengths, use_dictionary=bool(pick),
                valid=s.valid, inner_valid=s.inner_valid,
                element_valid=s.element_valid))
        elif isinstance(s, pw.StructColumn):
            def _choose_struct(sc, dotted):
                fields = []
                for f in sc.fields:
                    if pw._is_nested_struct_field(f):
                        fields.append((f[0], _choose_struct(
                            f[1], f"{dotted}.{f[0]}")))
                        continue
                    if pw._is_list_field(f):
                        lc = f[1]
                        pick = _choose(f"{dotted}.{f[0]}", lc.phys,
                                       lc.values, lc.element_valid)
                        fields.append((f[0], pw.ListColumn(
                            lc.name, lc.phys, lc.values, lc.lengths,
                            use_dictionary=bool(pick), valid=lc.valid,
                            element_valid=lc.element_valid)))
                        continue
                    fname, phys, vals = f[0], f[1], f[2]
                    fvalid = f[3] if len(f) > 3 else None
                    pick = _choose(f"{dotted}.{fname}", phys, vals, fvalid)
                    fields.append((fname, phys, vals, fvalid, bool(pick)))
                return pw.StructColumn(sc.name, fields, valid=sc.valid)
            out.append(_choose_struct(s, s.name))
        elif isinstance(s, pw.ListStructColumn):
            fields = []
            for f in s.fields:
                fname, phys, vals = f[0], f[1], f[2]
                fvalid = f[3] if len(f) > 3 else None
                pick = _choose(f"{s.name}.{fname}", phys, vals, fvalid)
                fields.append((fname, phys, vals, fvalid, bool(pick)))
            out.append(pw.ListStructColumn(
                s.name, fields, s.lengths, valid=s.valid,
                element_valid=s.element_valid))
        elif isinstance(s, pw.MapColumn):
            kpick = _choose(f"{s.name}.key", s.key_phys, s.keys, None)
            vpick = _choose(f"{s.name}.value", s.value_phys, s.values,
                            s.value_valid)
            out.append(pw.MapColumn(
                s.name, s.key_phys, s.keys, s.value_phys, s.values,
                s.lengths, valid=s.valid, value_valid=s.value_valid,
                key_use_dictionary=bool(kpick),
                value_use_dictionary=bool(vpick)))
        else:
            name, phys, vals = s[0], s[1], s[2]
            valid = s[3] if len(s) > 3 else None
            pick = _choose(name, phys, vals, valid)
            if pick is None:
                out.append((name, phys, vals, valid))
            else:
                out.append((name, phys, vals, valid, pick))
    return out, frozenset(delta_cols), ba_delta


def _encodings_tag(specs, delta_cols, ba_delta=None) -> str:
    """Human/manifest-readable per-column encoding summary."""
    from . import parquet_writer as pw
    leaves = []

    def _struct_leaves(prefix, sc):
        for f in sc.fields:
            if pw._is_nested_struct_field(f):
                _struct_leaves(f"{prefix}.{f[0]}", f[1])
            elif pw._is_list_field(f):
                leaves.append((f"{prefix}.{f[0]}", f[1].use_dictionary))
            else:
                leaves.append((f"{prefix}.{f[0]}",
                               bool(f[4]) if len(f) > 4 else False))

    for s in specs:
        if hasattr(s, "pcs_leaves"):
            leaves += [(leaf.name, leaf.use_dictionary)
                       for leaf in s.pcs_leaves()]
        elif isinstance(s, (pw.ListColumn, pw.NestedListColumn)):
            leaves.append((s.name, s.use_dictionary))
        elif isinstance(s, pw.ListStructColumn):
            leaves += [(f"{s.name}.{f[0]}",
                        bool(f[4]) if len(f) > 4 else False)
                       for f in s.fields]
        elif isinstance(s, pw.StructColumn):
            _struct_leaves(s.name, s)
        elif isinstance(s, pw.MapColumn):
            leaves += [(f"{s.name}.key", s.key_use_dictionary),
                       (f"{s.name}.value", s.value_use_dictionary)]
        else:
            leaves.append((s[0], bool(s[4]) if len(s) > 4 else False))
    parts = []
    ba_delta = ba_delta or {}
    for name, use_dict in leaves:
        enc = ("delta" if name in delta_cols
               else "dlba" if ba_delta.get(name) == "delta_length"
               else "dba" if ba_delta.get(name) == "delta_byte_array"
               else "dict" if use_dict else "plain")
        parts.append(f"{name}={enc}")
    return ",".join(parts)


def hive_segment(col: str, value) -> str:
    """One ``col=value`` path segment for a partition directory. Values
    are percent-encoded (``urllib.parse.quote`` with no safe chars) so
    separators, spaces, '=' and unicode survive the path round-trip —
    the same escaping Hive/Spark apply to partition directory names.
    Partition values must be non-null str/int/bool — the layout contract
    is that the SEGMENT states the column's value for every row in the
    file, which a lossy str() of floats or binary would break."""
    from urllib.parse import quote
    if value is None or isinstance(value, float) \
            or not isinstance(value, (str, int, bool)):
        raise ValueError(
            f"partition column {col!r}: value {value!r} out of scope "
            "(non-null str/int/bool only — floats and binary don't "
            "round-trip through a path segment)")
    return f"{col}={quote(str(value), safe='')}"


def partition_values(root: str, path: str) -> dict:
    """Parse ``col=value`` directory segments out of a data-file path
    relative to the dataset root — the read-side inverse of
    ``hive_segment`` (values percent-decoded, returned as strings)."""
    from urllib.parse import unquote
    vals: dict = {}
    rel = os.path.relpath(path, root)
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            vals[k] = unquote(v)
    return vals


def _partition_groups(tbl, partition_by):
    """Split one Arrow table by its distinct partition-column combos:
    yields (subdir-relative-path, sub-table). Vectorized: one group_by
    for the distinct combos (bounded by the partition cardinality a task
    sees — the caller repartitions by the partition columns so this is
    normally 1), then one filter per combo. Null partition values fail
    loudly — a null can't state itself in a path segment."""
    import pyarrow.compute as pc

    for c in partition_by:
        if c not in tbl.column_names:
            raise ValueError(f"partition column {c!r} not in "
                             f"{tbl.column_names}")
        if tbl.column(c).null_count:
            raise ValueError(f"partition column {c!r} has null values")
    combos = tbl.select(list(partition_by)) \
        .group_by(list(partition_by)).aggregate([])
    for i in range(combos.num_rows):
        vals = [combos.column(c)[i].as_py() for c in partition_by]
        mask = None
        for c, v in zip(partition_by, vals):
            m = pc.equal(tbl.column(c), v)
            mask = m if mask is None else pc.and_(mask, m)
        subdir = os.path.join(*[hive_segment(c, v)
                                for c, v in zip(partition_by, vals)])
        yield subdir, tbl.filter(mask)


def _attempt_tag() -> str:
    """Unique-per-task-attempt suffix for temp names: two attempts of the
    same task (speculation, zombie executors on shared storage) must NEVER
    share a temp file — interleaved writes would commit a corrupt file
    whose checksum still 'matches' (it hashes the corrupt bytes)."""
    from pyspark import TaskContext
    ctx = TaskContext.get()
    if ctx is None:
        import os as _os
        return f"drv{_os.getpid()}"
    return f"a{ctx.taskAttemptId()}"


def _manifest_batch(row):
    """One manifest tuple -> a single-row Arrow batch (MANIFEST_SCHEMA)."""
    import pyarrow as pa
    return pa.RecordBatch.from_arrays(
        [pa.array([row[0]], pa.string()),
         pa.array([row[1]], pa.int64()),
         pa.array([row[2]], pa.int64()),
         pa.array([row[3]], pa.int64()),
         pa.array([row[4]], pa.string()),
         pa.array([row[5]], pa.string()),
         pa.array([row[6] if len(row) > 6 else None], pa.string())],
        names=["file", "n_rows", "n_values", "bytes", "checksum",
               "encodings", "stats"])


def file_stats_json(meta) -> "str | None":
    """File-level per-column stats for the manifest/snapshot — the
    engine's analog of an Iceberg manifest entry's column bounds. For
    every FLAT leaf (max_rep 0) whose chunk Statistics are complete
    across all row groups: ``{col: {"min": v, "max": v, "nulls": n,
    "n": num_values}}`` with values JSON-typed (ints/floats/bools as-is,
    byte_array bounds as utf-8 text — UTF-8 byte order equals code-point
    order, so string comparison downstream matches the writer's
    lexicographic byte order). Columns with missing/NaN/FLBA/INT96 or
    non-utf8 bounds are omitted (pruning then falls through to the
    footer layer); all-null columns keep their null counts without
    bounds. Returns None when nothing is representable."""
    import json
    import math

    from . import parquet_format as pf

    cols = {}
    for lf in meta.leaves:
        if lf.max_rep:
            continue
        mn = mx = None
        nulls = nvals = 0
        ok = True
        for rg in meta.row_groups:
            chunk = next((c for c in rg if c.path == lf.name), None)
            if chunk is None or chunk.stats is None \
                    or chunk.stats[2] is None:
                ok = False
                break
            cmn, cmx, cn = chunk.stats
            nvals += chunk.num_values
            nulls += cn
            if chunk.num_values == cn:
                continue                       # all-null chunk: no bounds
            tmn, tmx = pf.stat_typed(cmn, lf), pf.stat_typed(cmx, lf)
            if tmn is None or tmx is None or tmn != tmn or tmx != tmx:
                ok = False
                break
            mn = tmn if mn is None else min(mn, tmn)
            mx = tmx if mx is None else max(mx, tmx)
        if not ok:
            continue
        ent: dict = {"nulls": int(nulls), "n": int(nvals)}
        if mn is not None:
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue                   # binary bounds: omit
            elif isinstance(mn, bool):
                pass
            elif isinstance(mx, float) or hasattr(mn, "dtype") \
                    and mn.dtype.kind == "f":
                mn, mx = float(mn), float(mx)
                if not (math.isfinite(mn) and math.isfinite(mx)):
                    continue
            else:
                mn, mx = int(mn), int(mx)
            ent["min"], ent["max"] = mn, mx
        cols[lf.name] = ent
    return json.dumps(cols, separators=(",", ":")) if cols else None


def _write_one_file(tbl, tmp: str, dest: str, row_group_rows, page_rows,
                    compression, delta_columns, encodings,
                    data_page_version, bloom_filter_columns=frozenset(),
                    field_ids: "dict | None" = None):
    """Write one Arrow table as one engine PAR1 file (dot-prefixed temp +
    atomic rename) and return its manifest tuple."""
    import hashlib

    import numpy as np

    from . import parquet_writer as pw
    specs, utf8, annotations, decimals = specs_from_arrow(tbl)
    d_cols = frozenset(delta_columns)
    ba_delta: dict = {}
    if encodings == "auto":
        specs, d_cols, ba_delta = auto_encodings(specs)

    def _struct_values(sc) -> int:
        n = 0
        for f in sc.fields:
            if pw._is_nested_struct_field(f):
                n += _struct_values(f[1])
            elif pw._is_list_field(f):
                n += int(np.asarray(f[1].lengths).sum())
            else:
                n += tbl.num_rows
        return n

    def _spec_values(s) -> int:
        if hasattr(s, "pcs_n_values"):
            return s.pcs_n_values()
        if isinstance(s, pw.ListColumn):
            return int(np.asarray(s.lengths).sum())
        if isinstance(s, pw.NestedListColumn):
            return int(np.asarray(s.inner_lengths).sum())
        if isinstance(s, pw.ListStructColumn):
            return int(np.asarray(s.lengths).sum()) * len(s.fields)
        if isinstance(s, pw.MapColumn):
            return 2 * int(np.asarray(s.lengths).sum())
        if isinstance(s, pw.StructColumn):
            return _struct_values(s)
        return tbl.num_rows

    n_values = sum(_spec_values(s) for s in specs)
    enc_tag = _encodings_tag(specs, d_cols, ba_delta)
    # manifest fields ride in the footer's key_value_metadata so a
    # resumed job can rebuild its manifest row WITHOUT re-encoding;
    # pcs.params records the writer knobs so resume can detect a rerun
    # with DIFFERENT parameters and re-encode instead of trusting stale
    # files
    params = _params_tag(row_group_rows, page_rows, compression,
                         delta_columns, encodings, data_page_version,
                         bloom_filter_columns)
    pw.write_file(tmp, specs, tbl.num_rows,
                  row_group_rows=row_group_rows, page_rows=page_rows,
                  compression=compression, utf8_columns=utf8,
                  delta_columns=d_cols,
                  delta_length_columns={n for n, k in ba_delta.items()
                                        if k == "delta_length"},
                  delta_byte_array_columns={n for n, k in ba_delta.items()
                                            if k == "delta_byte_array"},
                  data_page_version=data_page_version,
                  annotations=annotations, decimal_columns=decimals,
                  bloom_filter_columns=frozenset(bloom_filter_columns),
                  field_ids=field_ids,
                  key_value_metadata={"pcs.n_values": str(n_values),
                                      "pcs.encodings": enc_tag,
                                      "pcs.params": params})
    with open(tmp, "rb") as fh:
        data = fh.read()
    sha = hashlib.sha256(data).hexdigest()
    # file-level column bounds for the manifest/snapshot (Iceberg-style
    # manifest pruning): one footer parse of the bytes already in hand
    from . import parquet_format as pf
    stats = file_stats_json(pf.read_footer(memoryview(data)))
    # literal-sentinel substitution, NOT str.format: an out_dir containing
    # '{'/'}' must pass through untouched (str.format on the whole path
    # raised KeyError / mangled destinations with no placeholder at all)
    dest = dest.replace("{sha}", sha[:16])
    os.replace(tmp, dest)  # atomic; retries overwrite
    return (dest, tbl.num_rows, n_values, len(data), sha, enc_tag, stats)


def _params_tag(row_group_rows, page_rows, compression, delta_columns,
                encodings, data_page_version,
                bloom_filter_columns=frozenset()) -> str:
    tag = (f"rg={row_group_rows};pg={page_rows};c={compression};"
           f"d={','.join(sorted(delta_columns))};e={encodings};"
           f"v={data_page_version}")
    if bloom_filter_columns:
        # appended only when set: files written before blooms existed
        # keep their tag and stay resumable
        tag += f";bf={','.join(sorted(bloom_filter_columns))}"
    return tag


def _manifest_from_existing(dest: str, expected_params: "str | None" = None):
    """Manifest tuple for an already-committed engine file (resume path):
    n_rows from the footer, n_values/encodings from the embedded
    key_value_metadata, checksum re-hashed from the bytes on disk.
    Returns None when the file is absent, truncated, or not ours —
    the caller then re-encodes."""
    import hashlib

    from . import parquet_format as pf
    try:
        with open(dest, "rb") as fh:
            data = fh.read()
        if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
            return None
        meta = pf.read_footer(memoryview(data))
        kv = meta.key_value_metadata
        if "pcs.n_values" not in kv:
            return None
        if expected_params is not None and \
                kv.get("pcs.params") != expected_params:
            return None   # written with different knobs: re-encode
        return (dest, meta.num_rows, int(kv["pcs.n_values"]), len(data),
                hashlib.sha256(data).hexdigest(), kv["pcs.encodings"],
                file_stats_json(meta))
    except Exception:
        return None


def emit_parquet_dataset(df, out_dir: str,
                         name_prefix: str = "",
                         row_group_rows: "int | None" = None,
                         page_rows: "int | None" = 2048,
                         compression: "str | None" = "zstd",
                         delta_columns: "frozenset | set" = frozenset(),
                         encodings: str = "default",
                         data_page_version: int = 1,
                         bloom_filter_columns: "frozenset | set"
                         = frozenset(),
                         partition_by: "list | tuple | None" = None,
                         field_ids: "dict | None" = None):
    """DataFrame-in variant of ``write_parquet_dataset``: each task writes
    its partition's rows as ONE engine-format parquet file named by its
    CONTENT hash (``{prefix}part-{sha16}.parquet``) — a retried task that
    reproduces the same partition content overwrites the same file with
    identical bytes. Content-hash naming alone does NOT make retries
    idempotent: callers must make partition content deterministic —
    hash-partition AND sort within partitions (shuffle fetch order is
    nondeterministic; the streaming sink does both) — or a retried task
    can emit the same rows in a different order under a different name,
    duplicating data. Returns the manifest DataFrame (lazy: files are
    written when the manifest is consumed).

    ``partition_by``: ICEBERG-style partitioned layout — each task splits
    its rows by the distinct values of these columns and writes one file
    per combo under ``col=value/`` directories (values percent-encoded;
    non-null str/int/bool only). Unlike Hive, the partition columns STAY
    in the data files, so every file remains self-describing and any
    plain parquet reader sees the full schema; the directory segments
    are a pruning index, not the storage of record —
    ``record_assembly.read_parquet_dataset`` drops whole files on
    partition predicates before any footer I/O. At scale, repartition by
    the partition columns first (``df.repartition(*partition_by)``) or
    each task fans out one file per combo it happens to hold
    (tasks x values small files)."""
    from ..shipping import ensure_shipped
    ensure_shipped(df.sparkSession)
    os.makedirs(out_dir, exist_ok=True)
    part_cols = list(partition_by) if partition_by else None

    def task(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        batch_list = [b for b in batches if b.num_rows]
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        pid = TaskContext.get().partitionId()
        groups = [("", tbl)] if part_cols is None \
            else _partition_groups(tbl, part_cols)
        for gi, (subdir, sub) in enumerate(groups):
            d = os.path.join(out_dir, subdir) if subdir else out_dir
            if subdir:
                os.makedirs(d, exist_ok=True)
            # temp lives in the FINAL directory: os.replace must never
            # cross a filesystem boundary
            tmp = os.path.join(
                d, f".emit-{name_prefix}{pid}-{gi}-"
                   f"{_attempt_tag()}.inprogress")
            dest = os.path.join(d, name_prefix + "part-{sha}.parquet")
            row = _write_one_file(sub, tmp, dest, row_group_rows,
                                  page_rows, compression, delta_columns,
                                  encodings, data_page_version,
                                  frozenset(bloom_filter_columns),
                                  field_ids)
            yield _manifest_batch(row)

    return df.mapInArrow(task, MANIFEST_SCHEMA)


def write_parquet_dataset(spark, src_path: str, out_dir: str,
                          row_group_rows: "int | None" = None,
                          page_rows: "int | None" = 2048,
                          compression: "str | None" = "zstd",
                          delta_columns: "frozenset | set" = frozenset(),
                          encodings: str = "default",
                          data_page_version: int = 1,
                          resume: bool = False,
                          slices_per_core: int = 4,
                          bloom_filter_columns: "frozenset | set"
                          = frozenset()):
    """Encode ``src_path`` (parquet file/dir) into a directory of
    ENGINE-written PAR1 files, one per source row group, written by the
    executors themselves. Returns the manifest DataFrame
    (``MANIFEST_SCHEMA``); the output dir is a normal parquet dataset.

    Atomicity/idempotency: tasks write ``.name.inprogress`` (dot-prefixed,
    so a concurrent ``spark.read.parquet(out_dir)`` ignores partial
    files) then ``os.replace`` — a retried task overwrites with identical
    bytes. The manifest checksum is the sha256 of the final file.

    ``encodings='auto'`` runs the engine's codec auto-selector per column
    per file (mapped onto parquet's encoding surface via
    ``auto_encodings``) instead of the defaults (dict for strings/lists,
    plus explicit ``delta_columns``); the manifest's ``encodings`` column
    records each file's choices.

    ``resume=True`` is the checkpoint-resume mode (the manifest
    anti-join's analog for the parquet output): a split whose destination
    file already exists with valid PAR1 magic and the engine's embedded
    footer metadata is SKIPPED — its manifest row is rebuilt from the
    footer (``pcs.n_values`` / ``pcs.encodings`` key_value_metadata) and
    a re-hash of the bytes on disk, no re-encode. Names are source-tagged
    per (file, row_group), so resume trusts that the SOURCE split is
    unchanged; truncated or foreign files re-encode."""
    from ..shipping import ensure_shipped
    from .parquet_direct import list_row_groups
    ensure_shipped(spark)

    os.makedirs(out_dir, exist_ok=True)
    splits = list_row_groups(src_path)
    cores = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(len(splits), cores * slices_per_core))
    splits_df = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, n_parts),
        "file string, rg int")
    delta_cols = frozenset(delta_columns)
    bloom_cols = frozenset(bloom_filter_columns)

    def task(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for f, rg in zip(batch.column("file").to_pylist(),
                             batch.column("rg").to_pylist()):
                # name carries the SOURCE tag (file, rg): a retried split
                # overwrites its own file, two distinct splits never share
                tag = hashlib.sha256(f"{f}#{rg}".encode()).hexdigest()[:16]
                dest = os.path.join(out_dir, f"part-{tag}.parquet")
                if resume:
                    # BEFORE reading the source: a resumed split costs one
                    # footer parse + hash, zero source I/O, zero encode;
                    # a file written under different writer knobs fails
                    # the pcs.params check and re-encodes
                    row = _manifest_from_existing(
                        dest, _params_tag(row_group_rows, page_rows,
                                          compression, delta_cols,
                                          encodings, data_page_version,
                                          bloom_cols))
                    if row is not None:
                        yield _manifest_batch(row)
                        continue
                tbl = pq.ParquetFile(f).read_row_group(rg, use_threads=False)
                row = _write_one_file(
                    tbl,
                    os.path.join(
                        out_dir,
                        f".part-{tag}-{_attempt_tag()}.inprogress"),
                    dest,
                    row_group_rows, page_rows, compression, delta_cols,
                    encodings, data_page_version, bloom_cols)
                yield _manifest_batch(row)

    return splits_df.mapInArrow(task, schema=MANIFEST_SCHEMA)
