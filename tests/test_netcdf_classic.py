"""Pure-stdlib classic-NetCDF reader (S4): the test assembles CDF-1 /
CDF-2 files BYTE BY BYTE from the published file-format spec (not via
any writer in the package), so the parser is pinned against the
format, not against itself. Covers: fixed + record variables, the
two-record-var padded stride, the single-record-var unpadded stride,
CF scale/offset/_FillValue unpacking, dim-subset broadcasting,
CDF-2's 64-bit offsets, and the Spark single-file + distributed
ingest paths built on the decoder.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
    ingest,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf_classic import (
    decode_netcdf_bytes,
    parse_classic,
)

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_SZ = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}
_FMT = {1: ">b", 3: ">h", 4: ">i", 5: ">f", 6: ">d"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _values(nc_type: int, vals) -> bytes:
    if nc_type == NC_CHAR:
        return _pad4(vals.encode())
    return _pad4(b"".join(struct.pack(_FMT[nc_type], v) for v in vals))


def _attrs(items) -> bytes:
    """items: list of (name, nc_type, values)."""
    if not items:
        return struct.pack(">II", 0, 0)  # ABSENT
    out = struct.pack(">II", 0x0C, len(items))
    for nm, t, vals in items:
        n = len(vals) if t == NC_CHAR else len(list(vals))
        out += _name(nm) + struct.pack(">II", t, n) + _values(t, vals)
    return out


def _build_classic(version, numrecs, dims, gatts, variables):
    """Assemble a classic file per the spec.

    dims: [(name, length)] with 0 = record dim.
    variables: [(name, dimids, vatts, nc_type, fixed_data_or_records)]
      fixed var: flat list of values, stored contiguously;
      record var: list of per-record flat value lists.
    Two passes: first with zero begins to learn the header size, then
    for real. Record blocks pad to 4 bytes unless there is exactly
    one record variable (the spec's special case).
    """
    begin_size = 4 if version == 1 else 8

    def header(begins):
        h = b"CDF" + bytes([version]) + struct.pack(">I", numrecs)
        h += struct.pack(">II", 0x0A, len(dims))
        for nm, ln in dims:
            h += _name(nm) + struct.pack(">I", ln)
        h += _attrs(gatts)
        h += struct.pack(">II", 0x0B, len(variables))
        for (nm, dimids, vatts, t, _data), begin in zip(variables, begins):
            per = _SZ[t]
            for d in dimids:
                if dims[d][1] != 0:
                    per *= dims[d][1]
            vsize = per + (4 - per % 4) % 4
            h += _name(nm) + struct.pack(">I", len(dimids))
            h += b"".join(struct.pack(">I", d) for d in dimids)
            h += _attrs(vatts)
            h += struct.pack(">II", t, vsize)
            h += struct.pack(">q" if begin_size == 8 else ">i", begin)
        return h

    hlen = len(header([0] * len(variables)))
    rec_ids = [i for i, v in enumerate(variables) if v[1] and dims[v[1][0]][1] == 0]
    pad_rec = len(rec_ids) > 1
    begins, off = [], hlen
    fixed_payload = b""
    for i, (nm, dimids, vatts, t, data) in enumerate(variables):
        if i in rec_ids:
            begins.append(None)  # filled below
            continue
        begins.append(off)
        if t == NC_CHAR:
            raw = bytes(data)  # char var: caller passes raw bytes
        else:
            raw = b"".join(struct.pack(_FMT[t], v) for v in data)
        fixed_payload += raw
        off += len(raw)
    rec_start = off
    # per-record block sizes in var order
    blk = {}
    for i in rec_ids:
        nm, dimids, vatts, t, data = variables[i]
        per = _SZ[t]
        for d in dimids[1:]:
            per *= dims[d][1]
        blk[i] = per + ((4 - per % 4) % 4 if pad_rec else 0)
    cursor = rec_start
    for i in rec_ids:
        begins[i] = cursor
        cursor += blk[i]
    rec_payload = b""
    for r in range(numrecs):
        for i in rec_ids:
            nm, dimids, vatts, t, data = variables[i]
            raw = b"".join(struct.pack(_FMT[t], v) for v in data[r])
            rec_payload += raw + b"\x00" * (blk[i] - len(raw))
    return header(begins) + fixed_payload + rec_payload


FILL = -32767


def _era5ish(version=1):
    dims = [("time", 0), ("lat", 2), ("lon", 3)]
    t2m_r0 = [100, 200, 300, FILL, 500, 600]
    t2m_r1 = [700, 800, 900, 1000, 1100, 1200]
    variables = [
        ("lat", [1], [], NC_FLOAT, [10.0, 20.0]),
        ("lon", [2], [], NC_FLOAT, [100.0, 101.0, 102.0]),
        ("elevation", [1, 2], [], NC_DOUBLE, [11, 12, 13, 21, 22, 23]),
        ("time", [0], [], NC_INT, [[0], [1]]),
        (
            "t2m",
            [0, 1, 2],
            [
                ("scale_factor", NC_DOUBLE, [0.01]),
                ("add_offset", NC_DOUBLE, [270.0]),
                ("_FillValue", NC_SHORT, [FILL]),
            ],
            NC_SHORT,
            [t2m_r0, t2m_r1],
        ),
    ]
    gatts = [("title", NC_CHAR, "unit test")]
    return _build_classic(version, 2, dims, gatts, variables)


@pytest.mark.parametrize("version", [1, 2])
def test_parse_classic_header_and_data(version):
    dims, gattrs, varlist = parse_classic(_era5ish(version))
    assert dims == [("time", 2), ("lat", 2), ("lon", 3)]
    assert gattrs["title"] == "unit test"
    v = {x.name: x for x in varlist}
    np.testing.assert_array_equal(v["lat"].data, np.array([10.0, 20.0], ">f4"))
    np.testing.assert_array_equal(
        v["elevation"].data, np.array([[11, 12, 13], [21, 22, 23]], ">f8")
    )
    np.testing.assert_array_equal(v["time"].data, np.array([0, 1], ">i4"))
    assert v["t2m"].data.shape == (2, 2, 3)
    assert v["t2m"].data[0, 1, 0] == FILL
    assert v["t2m"].data[1, 2 - 1, 2] == 1200
    assert float(v["t2m"].attrs["scale_factor"]) == 0.01


@pytest.mark.parametrize("version", [1, 2])
def test_decode_to_dataframe_cf_unpacked(version):
    pdf = decode_netcdf_bytes(_era5ish(version))
    assert list(pdf.columns) == ["time", "lat", "lon", "elevation", "t2m"]
    assert len(pdf) == 12  # 2 time x 2 lat x 3 lon
    # CF unpack: raw * 0.01 + 270; the FILL cell is NaN.
    row = pdf[(pdf.time == 0) & (pdf.lat == 10.0) & (pdf.lon == 100.0)]
    assert row.t2m.iloc[0] == pytest.approx(271.0)
    fill_row = pdf[(pdf.time == 0) & (pdf.lat == 20.0) & (pdf.lon == 100.0)]
    assert math.isnan(fill_row.t2m.iloc[0])
    last = pdf[(pdf.time == 1) & (pdf.lat == 20.0) & (pdf.lon == 102.0)]
    assert last.t2m.iloc[0] == pytest.approx(282.0)
    # elevation has no time dim -> broadcast identically across time.
    for t in (0, 1):
        sub = pdf[pdf.time == t].sort_values(["lat", "lon"])
        np.testing.assert_array_equal(
            sub.elevation.to_numpy(), [11, 12, 13, 21, 22, 23]
        )


def test_single_record_var_unpadded_stride():
    # One record variable with a 6-byte record: the spec packs records
    # at stride 6 (no padding) — the special case a padded-only reader
    # would misread from record 1 on.
    dims = [("time", 0), ("n", 3)]
    variables = [("x", [0, 1], [], NC_SHORT, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])]
    buf = _build_classic(1, 3, dims, [], variables)
    dims_out, _, varlist = parse_classic(buf)
    np.testing.assert_array_equal(
        varlist[0].data, np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], ">i2")
    )


def test_read_netcdf_classic_via_spark(spark, tmp_path):
    p = tmp_path / "era5ish.nc"
    p.write_bytes(_era5ish())
    df = ingest.read_netcdf(spark, str(p))
    assert df.columns == ["time", "lat", "lon", "elevation", "t2m"]
    assert dict(df.dtypes)["t2m"] == "double"
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 12
    assert rows[0]["t2m"] == pytest.approx(271.0)
    assert sum(1 for r in rows if r["t2m"] is None or math.isnan(r["t2m"])) == 1


def test_read_netcdf_distributed(spark, tmp_path):
    # Two files of the same grid -> one decode task each, provenance
    # column, union of rows.
    (tmp_path / "a.nc").write_bytes(_era5ish())
    (tmp_path / "b.nc").write_bytes(_era5ish())
    df = ingest.read_netcdf_distributed(spark, str(tmp_path))
    assert df.columns[0] == "source_file"
    rows = df.collect()
    assert len(rows) == 24
    assert {r.source_file.rsplit("/", 1)[-1] for r in rows} == {"a.nc", "b.nc"}
    a = [r for r in rows if r.source_file.endswith("a.nc")]
    assert len(a) == 12
    vals = {
        (r.time, r.lat, r.lon): r.t2m for r in a
    }
    assert vals[(0, 10.0, 100.0)] == pytest.approx(271.0)


# ------------------------------------------------ property-based


def test_parse_roundtrip_property():
    """Property test: for random dim shapes, types, and values, the
    parser returns exactly the arrays the spec-builder encoded —
    fixed and record variables, any record-var count (exercising both
    stride rules)."""
    from hypothesis import given, settings, strategies as st

    numeric_types = [NC_BYTE, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE]
    rng_vals = {
        NC_BYTE: st.integers(-128, 127),
        NC_SHORT: st.integers(-32768, 32767),
        NC_INT: st.integers(-(2**31), 2**31 - 1),
        NC_FLOAT: st.sampled_from([0.0, 1.5, -2.25, 1024.0]),  # f4-exact
        NC_DOUBLE: st.floats(-1e6, 1e6, allow_nan=False),
    }

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def run(data):
        n_fixed_dims = data.draw(st.integers(1, 3))
        dim_lens = [data.draw(st.integers(1, 4)) for _ in range(n_fixed_dims)]
        numrecs = data.draw(st.integers(0, 3))
        dims = [("rec", 0)] + [(f"d{i}", ln) for i, ln in enumerate(dim_lens)]
        n_vars = data.draw(st.integers(1, 3))
        variables = []
        for vi in range(n_vars):
            t = data.draw(st.sampled_from(numeric_types))
            is_rec = data.draw(st.booleans())
            # pick a sub-shape over the fixed dims (possibly scalar)
            k = data.draw(st.integers(0, n_fixed_dims))
            sub = list(range(1, 1 + k))
            count = 1
            for d in sub:
                count *= dims[d][1]
            if is_rec:
                vals = [
                    [data.draw(rng_vals[t]) for _ in range(count)]
                    for _ in range(numrecs)
                ]
                variables.append((f"v{vi}", [0] + sub, [], t, vals))
            else:
                vals = [data.draw(rng_vals[t]) for _ in range(count)]
                variables.append((f"v{vi}", sub, [], t, vals))
        version = data.draw(st.sampled_from([1, 2]))
        buf = _build_classic(version, numrecs, dims, [], variables)
        _, _, parsed = parse_classic(buf)
        byname = {v.name: v for v in parsed}
        for nm, dimids, _vatts, t, vals in variables:
            got = byname[nm].data
            if dimids and dimids[0] == 0:
                flat = [x for rec in vals for x in rec]
                assert got.shape[0] == numrecs
            else:
                flat = list(vals)
            np.testing.assert_allclose(
                got.ravel().astype(np.float64),
                np.array(flat, dtype=np.float64),
                rtol=0,
                atol=0,
            )

    run()


# ------------------------------------------------ round-10 hardening
# (ADVICE r9: NC_CHAR data vars, per-file schema validation in the
# distributed reader, loud unsupported-nc_type diagnostics)


def _station_file() -> bytes:
    """2 stations; a char var (last dim = strlen) + a float var."""
    dims = [("station", 2), ("strlen", 4)]
    variables = [
        ("name", [0, 1], [], NC_CHAR, b"ABC\x00DE\x00\x00"),
        ("val", [0], [], NC_FLOAT, [1.5, 2.5]),
    ]
    return _build_classic(1, 0, dims, [], variables)


def test_char_variable_decodes_to_str():
    pdf = decode_netcdf_bytes(_station_file())
    # strlen never joins the grid: 2 rows, name decoded to stripped str
    assert len(pdf) == 2
    assert list(pdf["name"]) == ["ABC", "DE"]
    assert list(pdf["val"]) == [1.5, 2.5]
    assert pdf["name"].dtype == object


def test_unsupported_nc_type_is_loud():
    # A file whose single global attribute claims CDF-5's NC_INT64=10:
    # the parser must raise its own ValueError, not a bare KeyError.
    buf = (
        b"CDF\x01"
        + struct.pack(">I", 0)  # numrecs
        + struct.pack(">II", 0, 0)  # dim list ABSENT
        + struct.pack(">II", 0x0C, 1)  # 1 global attr
        + _name("bad")
        + struct.pack(">II", 10, 1)  # nc_type=10, nelems=1
        + struct.pack(">q", 0)
    )
    with pytest.raises(ValueError, match="unsupported nc_type 10"):
        parse_classic(buf)


def test_distributed_read_decodes_char_vars(spark, tmp_path):
    (tmp_path / "s.nc").write_bytes(_station_file())
    df = ingest.read_netcdf_distributed(spark, str(tmp_path))
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"ABC", "DE"}
    assert dict(df.dtypes)["name"] == "string"
    assert rows["ABC"]["val"] == pytest.approx(1.5)


def test_distributed_read_heterogeneous_archive_names_file(spark, tmp_path):
    # Mixed archive: the mismatching file must be NAMED in the error,
    # whichever file the prototype sampled.
    (tmp_path / "a.nc").write_bytes(_era5ish())
    (tmp_path / "b.nc").write_bytes(_station_file())
    df = ingest.read_netcdf_distributed(spark, str(tmp_path))
    with pytest.raises(Exception, match="do not match the archive prototype"):
        df.collect()


def _int_var_file() -> bytes:
    """Same grid/columns as _era5ish but t2m raw NC_INT (no CF attrs)
    and elevation unchanged — the unpacked sibling of a packed file."""
    dims = [("time", 0), ("lat", 2), ("lon", 3)]
    variables = [
        ("lat", [1], [], NC_FLOAT, [10.0, 20.0]),
        ("lon", [2], [], NC_FLOAT, [100.0, 101.0, 102.0]),
        ("elevation", [1, 2], [], NC_DOUBLE, [11, 12, 13, 21, 22, 23]),
        ("time", [0], [], NC_INT, [[0], [1]]),
        ("t2m", [0, 1, 2], [], NC_INT,
         [[271, 272, 273, 274, 275, 276], [277, 278, 279, 280, 281, 282]]),
    ]
    return _build_classic(1, 2, dims, [], variables)


def test_distributed_read_widens_int_to_double(spark, tmp_path):
    """A raw-int file in an archive whose prototype is CF-packed
    (double) widens losslessly instead of erroring: int -> double is
    the one legitimate cross-file dtype difference (one writer packed,
    another didn't). File names pin the packed file as the prototype
    (binaryFile lists lexicographically here)."""
    (tmp_path / "a_packed.nc").write_bytes(_era5ish())
    (tmp_path / "b_raw.nc").write_bytes(_int_var_file())
    df = ingest.read_netcdf_distributed(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 24
    raw = [r for r in rows if r.source_file.endswith("b_raw.nc")]
    assert {type(r.t2m) for r in raw} == {float}
    vals = {(r.time, r.lat, r.lon): r.t2m for r in raw}
    assert vals[(0, 10.0, 100.0)] == pytest.approx(271.0)
