"""netCDF-4 (HDF5) WRITER tests: every file the writer produces is
decoded by the READER that is itself pinned against spec-assembled
fixtures (tests/test_hdf5_min.py), so the writer is checked against
the format, not against itself — the same discipline as
tests/test_netcdf_writer.py for the classic half.
"""

from __future__ import annotations

import numpy as np
import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
    decode_netcdf4_bytes,
    parse_netcdf4,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf4_writer import (
    write_netcdf4,
)


def _grid_blob(**over):
    t2m = (np.arange(24).reshape(2, 3, 4) * 10).astype("<i2")
    kw = dict(
        dims=[("time", None), ("lat", 3), ("lon", 4)],
        variables=[
            {"name": "lat", "nc_type": 6, "dims": ["lat"], "values": [10.0, 20.0, 30.0]},
            {"name": "lon", "nc_type": 6, "dims": ["lon"], "values": [1.0, 2.0, 3.0, 4.0]},
            {
                "name": "t2m",
                "nc_type": 3,
                "dims": ["time", "lat", "lon"],
                "values": t2m,
                "attrs": {
                    "scale_factor": 0.01,
                    "add_offset": 270.0,
                    "_FillValue": np.int16(-32767),
                },
            },
        ],
        gattrs={"title": "roundtrip", "version": 3},
    )
    kw.update(over)
    return write_netcdf4(None, **kw), t2m


def test_roundtrip_structure_and_values():
    blob, t2m = _grid_blob()
    dims, gattrs, varlist = parse_netcdf4(blob)
    assert dims == [("time", 2), ("lat", 3), ("lon", 4)]
    assert gattrs == {"title": "roundtrip", "version": 3}
    by = {v.name: v for v in varlist}
    assert set(by) == {"lat", "lon", "t2m"}
    assert by["t2m"].dimids == [0, 1, 2]
    np.testing.assert_array_equal(by["t2m"].data, t2m)
    np.testing.assert_array_equal(by["lat"].data, [10.0, 20.0, 30.0])
    assert float(by["t2m"].attrs["scale_factor"]) == 0.01


def test_cf_unpacking_applies_through_decode():
    blob, _ = _grid_blob()
    pdf = decode_netcdf4_bytes(blob).sort_values(["time", "lat", "lon"])
    assert len(pdf) == 24
    assert pdf.t2m.iloc[0] == pytest.approx(270.0)  # 0*0.01 + 270
    assert pdf.t2m.iloc[-1] == pytest.approx(272.3)  # 230*0.01 + 270


def test_pure_dimension_carries_sentinel():
    # time has no coordinate variable: the scale must carry the
    # netCDF "not a variable" NAME sentinel and contribute only its
    # length (no 'time' data column beyond the index).
    blob, _ = _grid_blob()
    _, _, varlist = parse_netcdf4(blob)
    assert "time" not in {v.name for v in varlist}


def test_char_variable_as_fixed_string():
    names = np.array([b"ABC", b"DE"], dtype="S3")
    blob = write_netcdf4(
        None,
        dims=[("type", 2), ("strlen", 3)],
        variables=[
            {"name": "type", "nc_type": 4, "dims": ["type"], "values": [0, 1]},
            {
                "name": "type_name",
                "nc_type": 2,
                "dims": ["type", "strlen"],
                "values": names,
            },
        ],
    )
    _, _, varlist = parse_netcdf4(blob)
    by = {v.name: v for v in varlist}
    assert by["type_name"].dimids == [0]
    got = [x.decode() if isinstance(x, bytes) else str(x) for x in np.ravel(by["type_name"].data)]
    assert [g.rstrip("\x00") for g in got] == ["ABC", "DE"]


def test_writer_input_validation():
    with pytest.raises(ValueError, match="unknown dim"):
        write_netcdf4(
            None,
            dims=[("x", 2)],
            variables=[{"name": "v", "nc_type": 4, "dims": ["y"], "values": [1, 2]}],
        )
    with pytest.raises(ValueError, match="duplicate variable"):
        write_netcdf4(
            None,
            dims=[("x", 2)],
            variables=[
                {"name": "v", "nc_type": 4, "dims": ["x"], "values": [1, 2]},
                {"name": "v", "nc_type": 4, "dims": ["x"], "values": [3, 4]},
            ],
        )
    with pytest.raises(ValueError, match="exactly its own dimension"):
        write_netcdf4(
            None,
            dims=[("x", 2), ("y", 2)],
            variables=[
                {"name": "x", "nc_type": 4, "dims": ["x", "y"], "values": [[1, 2], [3, 4]]}
            ],
        )
    with pytest.raises(ValueError, match="no length and no variable"):
        write_netcdf4(None, dims=[("x", None)], variables=[])
    with pytest.raises(ValueError, match="exceeds NC_INT range"):
        write_netcdf4(
            None,
            dims=[("x", 1)],
            variables=[
                {
                    "name": "v",
                    "nc_type": 4,
                    "dims": ["x"],
                    "values": [1],
                    "attrs": {"big": np.int64(2**40)},
                }
            ],
        )


def test_writer_via_spark_ingest(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        ingest,
    )

    blob, t2m = _grid_blob()
    p = tmp_path / "grid.nc4"
    p.write_bytes(blob)
    df = ingest.read_netcdf(spark, str(p))
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 24
    assert rows[0]["t2m"] == pytest.approx(270.0)


def test_truncated_output_is_loud():
    """Any truncation of the writer's output must raise (truncated
    read or structural error), never silently decode a shorter grid —
    the same loudness sweep discipline as the reader's fixtures."""
    blob, _ = _grid_blob()
    for frac in (0.25, 0.5, 0.75, 0.9, 0.99):
        cut = blob[: int(len(blob) * frac)]
        with pytest.raises((ValueError, NotImplementedError)):
            parse_netcdf4(cut)


def _find_gcol(blob: bytes) -> int:
    off = blob.find(b"GCOL")
    assert off > 0, "no global heap collection in output"
    assert blob.find(b"GCOL", off + 4) < 0, "writer must emit exactly one GCOL"
    return off


def test_gcol_meets_libhdf5_minimum_size():
    """libhdf5 validates Collection Size >= H5HG_MINSIZE (4096) when
    loading a global heap; a smaller collection makes DIMENSION_LIST
    unreadable by h5py/netcdf-c even though the in-repo reader is
    lenient. Pin the on-disk struct, not just the roundtrip."""
    import struct

    blob, _ = _grid_blob()
    off = _find_gcol(blob)
    (size,) = struct.unpack_from("<Q", blob, off + 8)
    assert size >= 4096
    # the declared collection must actually fit in the file
    assert off + size <= len(blob)


def test_gcol_free_space_object_declares_remainder():
    """The index-0 terminator's size field must carry the remaining
    collection space INCLUDING its own 16-byte header (spec IV.E);
    libhdf5 walks the heap by these sizes."""
    import struct

    blob, _ = _grid_blob()
    off = _find_gcol(blob)
    (total,) = struct.unpack_from("<Q", blob, off + 8)
    p = off + 16
    end = off + total
    while p < end:
        idx, = struct.unpack_from("<H", blob, p)
        obj_size, = struct.unpack_from("<Q", blob, p + 8)
        if idx == 0:
            assert obj_size == end - p, (
                "free-space size must equal the remaining collection bytes"
            )
            # remainder after the header is zero padding
            assert blob[p + 16 : end] == b"\0" * (end - p - 16)
            return
        p += 16 + (obj_size + 7) // 8 * 8
    raise AssertionError("no free-space terminator found")


def test_leaf_k_scales_with_root_entry_count():
    """libhdf5 rejects SNOD nodes with nsyms > 2 * (group-leaf K from
    the superblock). The writer keeps one SNOD, so K must be derived
    from the entry count — a fixed K=4 breaks any file with more than
    8 root objects (dims + variables), an easy real-export shape."""
    import struct

    n_vars = 30  # 2 dims + 30 variables = 32 root objects > 2*4
    variables = [
        {"name": "lat", "nc_type": 6, "dims": ["lat"], "values": [1.0, 2.0]},
        {"name": "lon", "nc_type": 6, "dims": ["lon"], "values": [1.0, 2.0, 3.0]},
    ] + [
        {
            "name": f"v{i:02d}",
            "nc_type": 4,
            "dims": ["lat", "lon"],
            "values": np.arange(6).reshape(2, 3) + i,
        }
        for i in range(n_vars)
    ]
    blob = write_netcdf4(None, dims=[("lat", 2), ("lon", 3)], variables=variables)

    # superblock leaf K at offset 13 (after 8-byte signature + 5 bytes)
    leaf_k, = struct.unpack_from("<H", blob, 16)
    snod_off = blob.find(b"SNOD")
    nsyms, = struct.unpack_from("<H", blob, snod_off + 6)
    assert nsyms == n_vars + 2
    assert nsyms <= 2 * leaf_k, "SNOD record count must satisfy nsyms <= 2K"

    # and the file still roundtrips through the spec-pinned reader
    dims, _, varlist = parse_netcdf4(blob)
    by = {v.name: v for v in varlist}
    assert len(by) == n_vars + 2
    np.testing.assert_array_equal(by["v07"].data, np.arange(6).reshape(2, 3) + 7)


def test_small_file_keeps_default_leaf_k():
    import struct

    blob, _ = _grid_blob()
    leaf_k, = struct.unpack_from("<H", blob, 16)
    assert leaf_k == 4


def test_external_hdf5_interop_when_available():
    """Read the writer's output with h5py / netCDF4 when installed —
    the consumers the GCOL/SNOD struct rules above exist for. Skipped
    in environments without the libs (this container), enforced where
    they exist."""
    h5py = pytest.importorskip("h5py")
    import io

    blob, t2m = _grid_blob()
    with h5py.File(io.BytesIO(blob), "r") as f:
        assert set(f.keys()) == {"time", "lat", "lon", "t2m"}
        np.testing.assert_array_equal(f["t2m"][...], t2m)
        dl = f["t2m"].attrs["DIMENSION_LIST"]
        assert len(dl) == 3
        assert f["lat"].attrs["CLASS"] == b"DIMENSION_SCALE"
