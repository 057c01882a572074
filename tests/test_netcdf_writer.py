"""The classic netCDF WRITER against the stdlib reader: exact
roundtrips for every structural case the format distinguishes —
record interleave (padded and single-var unpadded), char variables,
CF attributes, and the loud-error seams."""

from __future__ import annotations

import numpy as np
import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf_classic import (
    decode_netcdf_bytes,
    parse_classic,
)
from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.netcdf_writer import (
    write_netcdf_classic,
)


def test_grid_roundtrip_with_record_dim_and_char_names():
    days = np.array([19000, 19001, 19002], "i4")
    names = np.array([b"click", b"view"], dtype="S5")
    grid = np.array([[3, 0], [0, 7], [1, 2]], "i4")
    buf = write_netcdf_classic(
        None,
        dims=[("day", None), ("type", 2), ("strlen", 5)],
        variables=[
            {"name": "day", "nc_type": 4, "dims": ["day"], "values": days},
            {
                "name": "type",
                "nc_type": 4,
                "dims": ["type"],
                "values": np.arange(2, dtype="i4"),
            },
            {
                "name": "type_name",
                "nc_type": 2,
                "dims": ["type", "strlen"],
                "values": names,
            },
            {
                "name": "n_events",
                "nc_type": 4,
                "dims": ["day", "type"],
                "values": grid,
            },
        ],
        gattrs={"title": "t"},
    )
    pdf = decode_netcdf_bytes(buf).sort_values(["day", "type"])
    assert list(pdf["day"]) == [19000, 19000, 19001, 19001, 19002, 19002]
    assert list(pdf["type_name"]) == ["click", "view"] * 3
    assert list(pdf["n_events"]) == [3, 0, 0, 7, 1, 2]
    dims, gattrs, _ = parse_classic(buf)
    assert dims == [("day", 3), ("type", 2), ("strlen", 5)]
    assert gattrs == {"title": "t"}


def test_single_record_var_is_unpadded():
    # THE spec special case: one record variable -> per-record slabs
    # are NOT padded to 4 bytes (stride 2 for an i2 scalar slab).
    buf = write_netcdf_classic(
        None,
        dims=[("t", None)],
        variables=[
            {
                "name": "x",
                "nc_type": 3,
                "dims": ["t"],
                "values": np.array([1, -2, 300], "i2"),
            }
        ],
    )
    _, _, (v,) = parse_classic(buf)
    assert v.vsize == 2  # unpadded per-record size
    assert list(v.data) == [1, -2, 300]
    # two record vars -> both slabs pad to 4
    buf2 = write_netcdf_classic(
        None,
        dims=[("t", None)],
        variables=[
            {
                "name": "x",
                "nc_type": 3,
                "dims": ["t"],
                "values": np.array([1, -2, 300], "i2"),
            },
            {
                "name": "y",
                "nc_type": 3,
                "dims": ["t"],
                "values": np.array([7, 8, 9], "i2"),
            },
        ],
    )
    _, _, (vx, vy) = parse_classic(buf2)
    assert vx.vsize == 4 and vy.vsize == 4
    assert list(vx.data) == [1, -2, 300] and list(vy.data) == [7, 8, 9]


def test_cf_attrs_roundtrip_through_reader_unpack():
    buf = write_netcdf_classic(
        None,
        dims=[("x", 3)],
        variables=[
            {
                "name": "v",
                "nc_type": 3,
                "dims": ["x"],
                "values": np.array([100, -32767, 300], "i2"),
                "attrs": {
                    "scale_factor": 0.01,
                    "add_offset": 270.0,
                    "_FillValue": np.int16(-32767),
                },
            }
        ],
    )
    pdf = decode_netcdf_bytes(buf)
    got = list(pdf["v"])
    assert got[0] == pytest.approx(271.0)
    assert np.isnan(got[1])
    assert got[2] == pytest.approx(273.0)


def test_cdf2_roundtrips_identically():
    # CDF-2 differs only in magic + 64-bit begin offsets; the reader
    # dispatches on the magic and must see the same frame
    kw = dict(
        dims=[("t", None), ("x", 2)],
        variables=[
            {
                "name": "v",
                "nc_type": 4,
                "dims": ["t", "x"],
                "values": np.array([[1, 2], [3, 4], [5, 6]], "i4"),
            },
            {
                "name": "w",
                "nc_type": 6,
                "dims": ["x"],
                "values": np.array([0.5, -1.5]),
            },
        ],
    )
    b1 = write_netcdf_classic(None, **kw)
    b2 = write_netcdf_classic(None, version=2, **kw)
    assert b1[:4] == b"CDF\x01" and b2[:4] == b"CDF\x02"
    p1, p2 = decode_netcdf_bytes(b1), decode_netcdf_bytes(b2)
    for c in p1.columns:
        np.testing.assert_array_equal(p1[c].to_numpy(), p2[c].to_numpy())
    with pytest.raises(ValueError, match="version must be 1 or 2"):
        write_netcdf_classic(None, version=5, **kw)


def test_all_numeric_types_roundtrip():
    vals = {
        1: np.array([-1, 2], "i1"),
        3: np.array([-300, 400], "i2"),
        4: np.array([-70000, 80000], "i4"),
        5: np.array([1.5, -2.25], "f4"),
        6: np.array([1e-9, -3.5], "f8"),
    }
    buf = write_netcdf_classic(
        None,
        dims=[("x", 2)],
        variables=[
            {"name": f"v{t}", "nc_type": t, "dims": ["x"], "values": v}
            for t, v in vals.items()
        ],
    )
    pdf = decode_netcdf_bytes(buf)
    for t, v in vals.items():
        np.testing.assert_array_equal(pdf[f"v{t}"].to_numpy(), v)


def test_loud_errors():
    with pytest.raises(ValueError, match="at most one record"):
        write_netcdf_classic(None, dims=[("a", None), ("b", None)], variables=[])
    with pytest.raises(ValueError, match="FIRST dimension"):
        write_netcdf_classic(
            None,
            dims=[("t", None), ("x", 2)],
            variables=[
                {
                    "name": "v",
                    "nc_type": 4,
                    "dims": ["x", "t"],
                    "values": np.zeros((2, 1), "i4"),
                }
            ],
        )
    with pytest.raises(ValueError, match="unsupported nc_type"):
        write_netcdf_classic(
            None,
            dims=[("x", 1)],
            variables=[
                {"name": "v", "nc_type": 10, "dims": ["x"], "values": np.zeros(1)}
            ],
        )
    with pytest.raises(ValueError, match="does not match"):
        write_netcdf_classic(
            None,
            dims=[("x", 3)],
            variables=[
                {"name": "v", "nc_type": 4, "dims": ["x"], "values": np.zeros(2, "i4")}
            ],
        )
    with pytest.raises(ValueError, match="unknown dim"):
        write_netcdf_classic(
            None,
            dims=[("x", 1)],
            variables=[
                {"name": "v", "nc_type": 4, "dims": ["y"], "values": np.zeros(1, "i4")}
            ],
        )


def test_int_attr_range_guard_is_exact():
    """NC_INT range guard compares against the int32 bounds directly.

    np.abs(int64 min) overflows back negative, so an abs-based guard
    would silently truncate -2**63; and -2**31 IS representable by
    NC_INT so it must pass. (ADVICE r10 item 1.)
    """
    def write_with_attr(value):
        return write_netcdf_classic(
            None,
            dims=[("x", 1)],
            variables=[
                {"name": "v", "nc_type": 4, "dims": ["x"], "values": np.zeros(1, "i4")}
            ],
            gattrs={"a": value},
        )

    with pytest.raises(ValueError, match="exceeds NC_INT range"):
        write_with_attr(np.int64(-(2**63)))  # np.abs overflows on this
    with pytest.raises(ValueError, match="exceeds NC_INT range"):
        write_with_attr(np.int64(2**31))
    # boundary values are representable and must roundtrip exactly
    for ok in (-(2**31), 2**31 - 1):
        _, gattrs, _ = parse_classic(write_with_attr(np.int64(ok)))
        assert gattrs["a"] == ok


def test_writer_roundtrip_property():
    """Random dim shapes / dtypes / record-dim choice roundtrip
    exactly through write -> parse."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(data=st.data())
    def run(data):
        n_rec = data.draw(st.integers(1, 4))
        n_x = data.draw(st.integers(1, 3))
        use_record = data.draw(st.booleans())
        t = data.draw(st.sampled_from([1, 3, 4, 5, 6]))
        lo, hi = {1: (-128, 127), 3: (-(2**15), 2**15 - 1)}.get(
            t, (-(2**31), 2**31 - 1)
        )
        arr = np.array(
            [
                [data.draw(st.integers(lo, hi)) for _ in range(n_x)]
                for _ in range(n_rec)
            ]
        )
        extra = data.draw(st.booleans())  # second var exercises padding
        dims = [("t", None if use_record else n_rec), ("x", n_x)]
        variables = [
            {"name": "v", "nc_type": t, "dims": ["t", "x"], "values": arr}
        ]
        if extra:
            variables.append(
                {
                    "name": "w",
                    "nc_type": 3,
                    "dims": ["t"],
                    "values": np.arange(n_rec, dtype="i2"),
                }
            )
        buf = write_netcdf_classic(None, dims=dims, variables=variables)
        parsed_dims, _, vl = parse_classic(buf)
        assert parsed_dims == [("t", n_rec), ("x", n_x)]
        got = {v.name: v.data for v in vl}
        # expectation passes through the declared nc_type first (an
        # int that float32 can't represent exactly rounds on WRITE)
        want = arr.astype({1: "i1", 3: "i2", 4: "i4", 5: "f4", 6: "f8"}[t])
        np.testing.assert_array_equal(
            got["v"].astype(np.float64), want.astype(np.float64)
        )
        if extra:
            np.testing.assert_array_equal(
                got["w"].astype(np.int64), np.arange(n_rec)
            )

    run()
