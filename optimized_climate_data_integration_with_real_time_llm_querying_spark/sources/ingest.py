"""Ingest bridges: CSV, SQLite, Excel, NetCDF -> DataFrame/Parquet.

The reference's ETL is pandas notebooks writing SQLite (SURVEY.md
§2.1 S2-S5). Here ingest is explicit-schema Spark where a native
reader exists (CSV), and a bridge at the edge where one doesn't
(SQLite via stdlib sqlite3, Excel via openpyxl or a stdlib zip+XML
fallback, NetCDF via xarray) — data becomes Parquet immediately and
everything downstream is columnar.

Scale note: the bridge readers are single-process by design — they
exist for small operational sources (the reference's SQLite files are
<2 MB). Big data arrives as CSV/Parquet and uses the distributed
readers; a 100 TB NetCDF archive would get a DataSource V2 or a
conversion fleet, not this bridge (SURVEY.md §7.3 'custom Catalyst —
optional only').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# One timestamp format shared by the CSV reader and writer so
# timestamps round-trip at full microsecond precision (Spark's CSV
# default prints milliseconds only, silently truncating µs).
_CSV_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """S2: CSV with a declared schema — never inferSchema in
    production (extra pass + type drift)."""
    return spark.read.csv(
        path,
        header=header,
        schema=schema,
        mode="FAILFAST",
        timestampFormat=_CSV_TS_FMT,
        multiLine=False,
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink, the writer half of S2. Splittable one-record-per-line
    output (multiLine stays False on the read side — embedded
    newlines belong in JSONL/parquet, not CSV, because a multi-line
    CSV file cannot be split across executors); quoting handles
    embedded delimiters/quotes, doubles print in Java shortest-repr
    form (parse-back is bit-exact), and timestamps use the shared
    microsecond format. Free-text columns with newlines are the
    JSONL sink's job; this sink serves the tabular interchange the
    reference ingests with pandas (Disaster dollar/
    disaster_dollar_preprocessing.ipynb: pd.read_csv on the
    disaster-dollar dataset before loading SQLite).
    """
    df.write.mode("overwrite").option("header", header).option(
        "timestampFormat", _CSV_TS_FMT
    ).csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """ORC source — the second columnar interchange format (Hive
    ecosystems ship ORC where everything else ships parquet). Native
    Spark reader: column pruning, predicate pushdown into ORC
    row-group indexes, and vectorized decoding all apply exactly as
    for parquet, so a 100 TB ORC lake scans with the same plan
    shape. Declared schema optional: unlike CSV/JSON, ORC files
    carry their types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native writer, default compression)."""
    df.write.mode("overwrite").orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-Lines source — the interchange format LLM training
    corpora actually ship in (one JSON object per line; splittable,
    so a 100 TB archive parallelizes per-line like CSV).

    Same discipline as the CSV source: pass a declared ``schema`` in
    production (``schema=None`` infers, which costs an extra full
    scan and drifts types — acceptable only for exploration), and
    default ``FAILFAST`` so a malformed line fails the read loudly
    instead of silently nulling a column. ``mode="PERMISSIVE"``
    with a ``_corrupt_record`` field in the schema is the quarantine
    pattern when dirty lines are expected."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("mode", mode).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-Lines sink (one object per line, Spark's json format);
    strings round-trip through standard JSON escaping."""
    df.write.mode("overwrite").json(path)


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    batch_size: int = 50_000,
) -> DataFrame:
    """S1: read a SQLite table (the reference's storage engine) via
    the stdlib driver, batched through Arrow into a DataFrame.

    Identifier is quoted + validated against sqlite_master — the same
    list-tables guard the reference's servers apply before
    interpolating a table name (era5server.py:43-45).
    """
    import sqlite3

    import pandas as pd

    con = sqlite3.connect(db_path)
    try:
        tables = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        if table not in tables:
            raise ValueError(f"table {table!r} not in {db_path}: {sorted(tables)}")
        frames = []
        q = f'SELECT * FROM "{table}"'
        for chunk in pd.read_sql_query(q, con, chunksize=batch_size):
            frames.append(chunk)
        pdf = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.read_sql_query(q, con)
        )
    finally:
        con.close()
    return spark.createDataFrame(pdf)


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    batch_size: int = 50_000,
) -> int:
    """SQLite sink, the writer half of S1. SQLite is the reference's
    operational store (server.py:22, era5server.py, emissions_mcp.py
    all open one DB file) — a single-file, single-writer engine, so
    this sink is inherently driver-side; it exists to hand results
    back to the reference's own tooling, not to be a 100 TB sink
    (that is parquet's job). The frame streams through
    ``toLocalIterator`` in ``batch_size`` chunks so the driver never
    holds the whole result, and the identifier is validated like the
    reader's (letters/digits/underscore only) before interpolation.

    Returns the number of rows written.
    """
    import datetime
    import re
    import sqlite3

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(f"invalid SQLite table identifier: {table!r}")
    cols = df.columns

    def _sql_type(dt) -> str:
        name = dt.simpleString()
        if name in ("tinyint", "smallint", "int", "bigint", "boolean"):
            return "INTEGER"
        if name in ("float", "double") or name.startswith("decimal"):
            return "REAL"
        return "TEXT"

    ddl = ", ".join(
        f'"{c}" {_sql_type(f.dataType)}' for c, f in zip(cols, df.schema.fields)
    )
    placeholders = ", ".join("?" for _ in cols)
    con = sqlite3.connect(db_path)
    n = 0
    try:
        con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(f'CREATE TABLE "{table}" ({ddl})')

        def _cell(v):
            if isinstance(v, (datetime.datetime, datetime.date)):
                return v.isoformat()
            return v

        batch: list[tuple] = []
        insert = f'INSERT INTO "{table}" VALUES ({placeholders})'
        for row in df.toLocalIterator():
            batch.append(tuple(_cell(v) for v in row))
            if len(batch) >= batch_size:
                con.executemany(insert, batch)
                n += len(batch)
                batch.clear()
        if batch:
            con.executemany(insert, batch)
            n += len(batch)
        con.commit()
    finally:
        con.close()
    return n


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'BF224' -> 57 (column letters only, 0-based)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _xlsx_rows(path: str, sheet: str | int = 0) -> list[list]:
    """Minimal stdlib xlsx reader: zipfile + xml.etree over the Open
    Packaging parts (workbook.xml -> rels -> sheetN.xml +
    sharedStrings.xml). Covers the cell types the EDGAR/NOAA workbooks
    use — shared strings, inline/plain strings, booleans, numbers —
    and returns dense rows (missing cells -> None)."""
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter(
                f"{_XLSX_NS}si"
            ):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {rel.get("Id"): rel.get("Target") for rel in rels}
        sheets: list[tuple[str, str]] = []
        for sh in wb.iter(f"{_XLSX_NS}sheet"):
            target = rid_target[sh.get(f"{_XLSX_RNS}id")]
            target = target if target.startswith("xl/") else "xl/" + target.lstrip("/")
            sheets.append((sh.get("name"), target))
        if isinstance(sheet, int):
            target = sheets[sheet][1]
        else:
            by_name = dict(sheets)
            if sheet not in by_name:
                raise ValueError(f"sheet {sheet!r} not in {[n for n, _ in sheets]}")
            target = by_name[sheet]

        rows: list[dict[int, object]] = []
        width = 0
        for row in ET.fromstring(z.read(target)).iter(f"{_XLSX_NS}row"):
            cells: dict[int, object] = {}
            # The r= cell reference is OPTIONAL in OOXML: writers may
            # emit bare <c> elements meaning "next column". Track a
            # running index so such cells aren't dropped at key -1.
            next_i = 0
            for c in row.findall(f"{_XLSX_NS}c"):
                ref = c.get("r")
                i = _col_index(ref) if ref else next_i
                next_i = i + 1
                t = c.get("t", "n")
                v = c.find(f"{_XLSX_NS}v")
                if t == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = (
                        "".join(tt.text or "" for tt in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None
                        else None
                    )
                elif v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = bool(int(v.text))
                elif t == "str":
                    val = v.text
                else:
                    val = float(v.text)
                if val is not None:
                    cells[i] = val
                    width = max(width, i + 1)
            rows.append(cells)
        return [[r.get(i) for i in range(width)] for r in rows]


def read_excel(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """S3: Excel bridge (NOAA/EDGAR xlsx; the reference's four
    emissions notebooks all start with ``pd.read_excel`` on these
    workbooks — C02_Emissions_-2.ipynb:cell0). Uses pandas+openpyxl
    when available; otherwise a stdlib zip+XML reader (xlsx IS a zip
    of XML parts), so ingest works even in minimal environments.

    First row is the header (pd.read_excel default); numeric headers
    render as their integer form ('1970', not '1970.0'). Column types
    are inferred per column: all-numeric -> double, else string —
    matching how the reference's to_sql round-trips them."""
    import pandas as pd

    try:
        import openpyxl  # noqa: F401

        return spark.createDataFrame(pd.read_excel(path, sheet_name=sheet))
    except ImportError:
        pass

    raw = _xlsx_rows(path, sheet)
    if not raw:
        raise ValueError(f"no rows in {path!r} sheet {sheet!r}")

    def _header(v) -> str:
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return "<blank>" if v is None else str(v)

    header = [_header(v) for v in raw[0]]
    body = raw[1:]
    cols: dict[str, list] = {}
    for j, name in enumerate(header):
        vals = [r[j] if j < len(r) else None for r in body]
        non_null = [v for v in vals if v is not None]
        if non_null and all(isinstance(v, float) for v in non_null):
            cols[name] = [float(v) if v is not None else None for v in vals]
        elif non_null and all(isinstance(v, bool) for v in non_null):
            cols[name] = vals
        else:
            cols[name] = [None if v is None else str(v) for v in vals]
    return spark.createDataFrame(pd.DataFrame(cols))


def write_excel(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> int:
    """Excel sink, the writer half of S3 — a minimal stdlib xlsx
    writer (zipfile + hand-built OOXML parts, the mirror of
    :func:`_xlsx_rows`). Strings go as inline strings (no
    sharedStrings table), numbers as plain ``<v>`` cells in Python
    shortest-repr (floats parse back bit-exact), booleans as t="b",
    nulls as omitted cells. Like the SQLite sink this is a
    hand-back-to-reference-tooling path for dim-sized results — the
    reference's world is workbooks (its emissions notebooks all start
    at pd.read_excel) — streamed through ``toLocalIterator`` so the
    driver never holds the whole frame. Returns rows written.
    """
    import re
    import zipfile
    from xml.sax.saxutils import escape

    if not re.fullmatch(r"[^\[\]*/\\?:]{1,31}", sheet_name):
        raise ValueError(f"invalid sheet name: {sheet_name!r}")

    import decimal

    def _cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, decimal.Decimal):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        s = escape(str(v))
        return (
            f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{s}</t></is></c>'
        )

    def _ref(row: int, col: int) -> str:
        letters = ""
        c = col
        while True:
            letters = chr(ord("A") + c % 26) + letters
            c = c // 26 - 1
            if c < 0:
                break
        return f"{letters}{row}"

    cols = df.columns
    n = 0
    body_rows: list[str] = []
    header = "".join(_cell(_ref(1, j), c) for j, c in enumerate(cols))
    body_rows.append(f'<row r="1">{header}</row>')
    for row in df.toLocalIterator():
        n += 1
        cells = "".join(_cell(_ref(n + 1, j), row[j]) for j in range(len(cols)))
        body_rows.append(f'<row r="{n + 1}">{cells}</row>')

    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body_rows)
        + "</sheetData></worksheet>"
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" '
        'r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/'
        '2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml"
        '.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="'
        "application/vnd.openxmlformats-officedocument.spreadsheetml"
        '.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return n


def netcdf_table_to_df(spark: SparkSession, pdf) -> DataFrame:
    """S4's conversion contract, separated from the xarray seam so it
    is testable without the lib: takes the frame
    ``xr.open_dataset(path).to_dataframe().reset_index()`` produces
    (one row per (time, latitude, longitude) grid point, one column
    per variable — ERA5_preprocessing.ipynb:cell2-4) and normalizes it
    for Spark: coordinate names lower-cased, float32 variables widened
    to double (Spark has no float32 parquet statistics worth keeping
    at this width), exact grid coordinates preserved.

    Scale path: this pandas bridge is for operational single-file
    ingest only. A 100 TB NetCDF archive would be converted by a
    distributed fleet (one task per file via ``spark.read.format
    ("binaryFile")`` + a mapInPandas decode using this same contract)
    or a DataSource V2 reader — the *output schema* is identical, so
    downstream plans don't care which path produced it.
    """
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    for c in pdf.columns:
        if str(pdf[c].dtype) == "float32":
            pdf[c] = pdf[c].astype("float64")
    return spark.createDataFrame(pdf)


def decode_netcdf_auto(buf: bytes):
    """bytes -> xarray-shaped pandas frame, dispatching on the magic:
    classic CDF-1/2 through :mod:`.netcdf_classic`, netCDF-4/HDF5
    through :mod:`.hdf5_min` (both pure-stdlib). Raises ValueError on
    non-NetCDF bytes and NotImplementedError (naming the feature) on
    HDF5 constructs outside the netCDF-4 subset."""
    if buf[:4] in (b"CDF\x01", b"CDF\x02"):
        from .netcdf_classic import decode_netcdf_bytes

        return decode_netcdf_bytes(buf)
    if buf[:4] == b"\x89HDF":
        from .hdf5_min import decode_netcdf4_bytes

        return decode_netcdf4_bytes(buf)
    raise ValueError(f"not a NetCDF file (magic {buf[:4]!r})")


def read_netcdf(spark: SparkSession, path: str) -> DataFrame:
    """S4: NetCDF bridge (ERA5 .nc). BOTH format families now parse
    pure-stdlib: classic CDF-1/2 via :mod:`.netcdf_classic`, and the
    netCDF-4 subset of HDF5 (superblock v0, v1 headers, old-style
    groups, contiguous + chunked/deflate layouts, DIMENSION_LIST)
    via :mod:`.hdf5_min`. HDF5 files using features OUTSIDE that
    subset fall back to the xarray seam, which stays the loud escape
    hatch when xarray is absent (same explicit seam as read_excel's
    openpyxl path). The reference's equivalent is
    xarray.open_dataset(...).to_dataframe() (ERA5_preprocessing
    notebook cell2-4); the conversion contract is
    :func:`netcdf_table_to_df` whichever decoder produced the frame."""
    with open(path, "rb") as fh:
        buf = fh.read()
    try:
        return netcdf_table_to_df(spark, decode_netcdf_auto(buf))
    except NotImplementedError as stdlib_err:
        try:
            import xarray as xr
        except ImportError as e:
            raise NotImplementedError(
                f"stdlib NetCDF decode failed ({stdlib_err}) and the "
                "xarray fallback is unavailable in this environment; "
                "pre-convert to Parquet or classic/netCDF-4-subset "
                "format, or install xarray"
            ) from e
        return netcdf_table_to_df(
            spark, xr.open_dataset(path).to_dataframe().reset_index()
        )


def read_netcdf_distributed(spark: SparkSession, path_glob: str) -> DataFrame:
    """S4 at archive scale: decode a DIRECTORY of classic NetCDF
    files with one Arrow task per file — ``binaryFile`` rows
    (path, content-bytes) into ``mapInPandas`` running the same
    stdlib decoder as :func:`read_netcdf`, plus a ``source_file``
    provenance column. This is the distributed shape the single-file
    bridge's docstring promises for a 100 TB archive: no driver-side
    I/O, no Python per-row work (one decode call per FILE), schema
    fixed up-front from the first file's header so Spark plans the
    downstream without touching data.

    Both format families decode in-task (classic via
    netcdf_classic, netCDF-4 via hdf5_min — a mixed archive works as
    long as the variables match); HDF5 features outside the netCDF-4
    subset fail loudly with the file path, since the xarray fallback
    has no place inside an executor task.
    """
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    files = spark.read.format("binaryFile").load(path_glob)
    first = files.select("path", "content").limit(1).collect()
    if not first:
        raise ValueError(f"no files match {path_glob!r}")
    proto_path = first[0].path
    proto = decode_netcdf_auto(bytes(first[0].content))
    proto.columns = [c.lower() for c in proto.columns]

    def _spark_type(t) -> str:
        s = str(t)
        if s.startswith("float"):
            return "double"
        if s.startswith(("int", "uint")):
            return "bigint"
        return "string"

    proto_types = {c: _spark_type(t) for c, t in proto.dtypes.items()}
    proto_cols = list(proto.columns)
    fields = ", ".join(f"`{c}` {proto_types[c]}" for c in proto_cols)
    schema = f"source_file string, {fields}"

    def _conform(out, pathstr):
        """Validate one decoded file against the archive prototype and
        cast to the planned Spark types — so a heterogeneous archive
        (different variables, or an NC_CHAR var where the prototype had
        floats) fails with the offending file path, not an opaque
        executor-side Arrow conversion error."""
        out.columns = [c.lower() for c in out.columns]
        if set(out.columns) != set(proto_cols):
            raise ValueError(
                f"{pathstr}: columns {sorted(out.columns)} do not match the "
                f"archive prototype {sorted(proto_cols)} (from {proto_path}); "
                "read heterogeneous archives in per-schema groups"
            )
        out = out[proto_cols]
        for c in proto_cols:
            got = _spark_type(out[c].dtype)
            # int -> double widening is lossless and legitimate (one
            # file CF-packed to float, another raw int); everything
            # else is a real schema conflict.
            if got != proto_types[c] and not (
                got == "bigint" and proto_types[c] == "double"
            ):
                raise ValueError(
                    f"{pathstr}: column {c!r} decodes as {got}, but the "
                    f"archive prototype ({proto_path}) has {proto_types[c]}"
                )
            if proto_types[c] == "double":
                out[c] = out[c].astype("float64")
            elif proto_types[c] == "bigint":
                out[c] = out[c].astype("int64")
            else:
                out[c] = out[c].map(lambda x: None if x is None else str(x))
        return out

    def decode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                pathstr = row["path"]
                try:
                    out = decode_netcdf_auto(bytes(row["content"]))
                except Exception as e:
                    raise ValueError(f"failed to decode {pathstr}: {e}") from e
                out = _conform(out, pathstr)
                out.insert(0, "source_file", pathstr)
                yield out

    return files.select("path", "content").mapInPandas(decode, schema)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S5: the sink — normalized Parquet, optionally hive-partitioned
    (e.g. by country/gas/year) so downstream filters partition-prune."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sorted_layout(
    df: DataFrame,
    path: str,
    layout_cols: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Scan-pruning layout sink: range-partition the frame on
    ``layout_cols`` and sort within each partition on the same keys
    before writing Parquet.

    Why this matters at 100 TB: Parquet stores per-row-group and
    per-file min/max statistics for every column. A frame written in
    arrival (or hash) order has every file's [min, max] span the
    whole key domain, so a point/range predicate on the key must read
    every file; after range-partition + sort, the files tile the
    domain into disjoint key ranges and a selective filter touches
    O(selectivity) files — both Spark's parquet reader and external
    engines (DuckDB, Trino) do this skipping from the same footers.
    This is the single biggest scan-cost lever after hive
    partitioning, and it composes with it: hive-partition on the
    coarse column (date), range-sort the fine one (user/key) inside.

    ``n_files`` controls output file count (defaults to
    spark.sql.shuffle.partitions); range boundaries come from
    Spark's reservoir sampling of the keys, so skew in ``layout_cols``
    yields balanced files anyway — the property hash layouts lose.
    The effectiveness test (tests/test_ingest.py) asserts file-level
    min/max disjointness from the written footers, not just that the
    write succeeded.
    """
    cols = [F.col(c) for c in layout_cols]
    laid = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    w = laid.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def zorder_value(c1, c2, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative integer columns (c1 gets the odd positions). Sorting
    by this key clusters rows that are close in BOTH dimensions, so a
    range-sorted layout on it gives file-level min/max pruning on
    EITHER column — the multi-dimensional generalization of
    :func:`write_sorted_layout`'s single-key tiling. Callers quantize
    unbounded/skewed columns into [0, 2^bits) first (rank, bucketize,
    or min-max scale); the key itself is pure codegen'd bit
    arithmetic, reproducible in any engine with shifts.
    """
    c1 = F.col(c1) if isinstance(c1, str) else c1
    c2 = F.col(c2) if isinstance(c2, str) else c2
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Two-dimensional scan-pruning layout: range-partition + sort on
    the Morton key of (col1, col2), so selective filters on EITHER
    column skip most files from Parquet footers alone. A single-key
    sorted layout prunes perfectly on its key and not at all on the
    other column; Z-order trades a little of the first for a lot of
    the second (~sqrt(n_files) touched for a point range on one
    dimension). The layout key is dropped before writing."""
    laid = df.withColumn("_z", zorder_value(col1, col2, bits))
    laid = (
        laid.repartitionByRange(n_files, F.col("_z"))
        if n_files is not None
        else laid.repartitionByRange(F.col("_z"))
    ).sortWithinPartitions("_z")
    laid.drop("_z").write.mode("overwrite").parquet(path)


def publish_curated(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    manifest_name: str = "_manifest.json",
) -> dict:
    """The pipeline's last mile: publish a curated dataset as Parquet
    plus a machine-readable manifest — row count, per-file sizes,
    schema, and a deterministic content fingerprint (xor of per-row
    xxhash64 over all columns: order- and partitioning-invariant, so
    re-publishing the same rows from any cluster layout yields the
    same fingerprint). Consumers (trainers, auditors) can verify a
    delivery without re-reading the data; the fingerprint recomputes
    with one map-side pass + a scalar aggregate at any scale.

    Returns the manifest dict (also written to ``path/_manifest.json``).
    """
    import json
    import os

    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)

    written = df.sparkSession.read.parquet(path)
    fp_rows = written.select(
        F.xxhash64(*[F.col(c).cast("string") for c in sorted(written.columns)]).alias(
            "h"
        )
    )
    agg = fp_rows.agg(
        F.count(F.lit(1)).alias("n"),
        # BIT_XOR is order/partitioning-invariant; sum would be too
        # but xor also cancels accidental double-writes of a full
        # duplicate batch into a visible fingerprint change.
        F.expr("bit_xor(h)").alias("fp"),
    ).first()
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files.append(
                    {
                        "file": os.path.relpath(p, path),
                        "bytes": os.path.getsize(p),
                    }
                )
    manifest = {
        "rows": int(agg["n"]),
        "content_fingerprint": int(agg["fp"]) if agg["fp"] is not None else 0,
        "schema": written.schema.jsonValue(),
        "files": sorted(files, key=lambda f: f["file"]),
        "partition_by": partition_by or [],
    }
    with open(os.path.join(path, manifest_name), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


def verify_published(spark, path: str, manifest_name: str = "_manifest.json") -> bool:
    """Re-derive the manifest's row count and content fingerprint from
    the published files and compare — the consumer-side delivery
    check. Raises AssertionError with the mismatching field."""
    import json
    import os

    with open(os.path.join(path, manifest_name)) as fh:
        manifest = json.load(fh)
    df = spark.read.parquet(path)
    agg = (
        df.select(
            F.xxhash64(
                *[F.col(c).cast("string") for c in sorted(df.columns)]
            ).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("fp"))
        .first()
    )
    assert int(agg["n"]) == manifest["rows"], (
        f"row count drifted: {agg['n']} != {manifest['rows']}"
    )
    got_fp = int(agg["fp"]) if agg["fp"] is not None else 0
    assert got_fp == manifest["content_fingerprint"], "content fingerprint drifted"
    return True


def box_pruning_stats(
    path: str, preds: list[tuple[str, int, int]]
) -> tuple[int, int]:
    """(files a box-predicate must touch, total files) for a written
    Parquet directory, decided purely from footer min/max statistics —
    the same decision Spark's reader (and DuckDB, Trino) makes. A file
    must be read iff EVERY predicate's [lo, hi] intersects the file's
    [min, max] on that column; files failing any predicate are
    skipped. Used by the pruned-read query to assert its layout
    actually skips files, not just that the write succeeded."""
    import duckdb

    con = duckdb.connect()
    per_file: dict[str, bool] = {}
    for col, lo, hi in preds:
        rows = con.execute(
            f"""
            SELECT file_name,
                   MIN(CAST(stats_min_value AS BIGINT)) AS mn,
                   MAX(CAST(stats_max_value AS BIGINT)) AS mx
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'
            GROUP BY file_name
            """
        ).fetchall()
        for fname, mn, mx in rows:
            hit = mx >= lo and mn <= hi
            per_file[fname] = per_file.get(fname, True) and hit
    con.close()
    total = len(per_file)
    touched = sum(1 for hit in per_file.values() if hit)
    return touched, total


def compact_small_files(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    preserve_order_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory so output
    files are ~``target_bytes`` each.

    The small-files problem is the dominant operational failure mode
    of long-running ingest at 100 TB: streaming sinks and per-batch
    jobs leave thousands of KB-sized files per partition, and every
    downstream scan pays one task + one footer fetch + one open per
    file (a 100k-file table can spend more time in scheduling than
    IO). Compaction is the standing maintenance job (Delta OPTIMIZE /
    Iceberg rewrite_data_files do exactly this); this is the plain-
    parquet form.

    Sizing: output file count = ceil(input_bytes / target_bytes),
    measured from the actual on-disk input (compressed) so the target
    tracks real file sizes, not in-memory estimates. The rewrite uses
    ``coalesce`` when shrinking (a partition-merge NARROW dependency:
    no shuffle, each output task reads whole input files) and falls
    back to ``repartition`` only when the input has FEWER partitions
    than requested (never the compaction direction). With
    ``preserve_order_cols`` the rewrite instead range-partitions +
    sorts on those columns — compaction and the sorted-layout sink
    (write_sorted_layout) in one pass, so footer-pruning survives the
    rewrite.

    Returns {files_before, files_after, bytes_total} for the caller
    to assert on; content equality is the test's job
    (tests/test_compaction.py round-trips and diffs).
    """
    import glob
    import math

    files = [
        f
        for f in glob.glob(os.path.join(in_path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    bytes_total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_total / target_bytes))
    df = spark.read.parquet(in_path)
    if preserve_order_cols:
        (
            df.repartitionByRange(n_out, *preserve_order_cols)
            .sortWithinPartitions(*preserve_order_cols)
            .write.mode("overwrite")
            .parquet(out_path)
        )
    else:
        n_in = df.rdd.getNumPartitions()
        out = df.coalesce(n_out) if n_in >= n_out else df.repartition(n_out)
        out.write.mode("overwrite").parquet(out_path)
    files_after = [
        f
        for f in glob.glob(os.path.join(out_path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    return {
        "files_before": len(files),
        "files_after": len(files_after),
        "bytes_total": bytes_total,
    }
