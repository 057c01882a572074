"""Pure-stdlib reader for the NetCDF CLASSIC binary format (CDF-1 /
CDF-2), closing the S4 gap for the format family that needs no
external library.

The reference ingests ERA5 ``.nc`` files with
``xarray.open_dataset(...).to_dataframe()`` (ERA5_preprocessing.ipynb
cell2-4). This container has no xarray/netcdf4/scipy, and the
reference's own ``.nc`` files are git-LFS pointers — but the classic
NetCDF format is a small, fully public specification (magic
``CDF\\x01``/``CDF\\x02``; the NetCDF User's Guide, appendix "File
Format Specification"), so the classic half of S4 is implementable
with ``struct`` + numpy alone:

    header := magic numrecs dim_list gatt_list var_list
    dim    := name length            (length 0 = the record dimension)
    attr   := name nc_type nelems values          (4-byte aligned)
    var    := name rank dimids vatt_list nc_type vsize begin
              (begin is int32 in CDF-1, int64 in CDF-2)

Fixed-size variables are contiguous at ``begin``; record variables
are interleaved per record with stride = sum of their padded
per-record sizes (unpadded when there is exactly one record
variable). All values are big-endian.

CF packing is honored the way xarray's ``mask_and_scale`` does it:
``_FillValue``/``missing_value`` raws become NaN, then
``raw * scale_factor + add_offset`` — ERA5 classic files ship packed
int16 temperatures, so without this the numbers would be raw counts.

netCDF-4 files are HDF5 containers (magic ``\\x89HDF``) — a format an
order of magnitude larger; since round 10 the netCDF-4 SUBSET of it
decodes pure-stdlib too (:mod:`.hdf5_min`), with the xarray seam as
the fallback for exotic HDF5 features. ``read_netcdf`` dispatches on
the magic (``ingest.decode_netcdf_auto``).

Scale path: :func:`decode_netcdf_bytes` is bytes-in/pandas-out, so
the distributed ingest is ``spark.read.format("binaryFile")`` over
the archive + one Arrow ``mapInPandas`` decode task per file
(``ingest.read_netcdf_distributed``) — the 100 TB shape the previous
round's doc-comment promised, now real for classic files.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_MAGIC_CDF1 = b"CDF\x01"
_MAGIC_CDF2 = b"CDF\x02"
_MAGIC_HDF5 = b"\x89HDF"

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy big-endian dtype, size in bytes)
_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
}


def _nc_dtype(nc_type: int) -> tuple[np.dtype, int]:
    """Look up a classic nc_type, raising the parser's loud ValueError
    diagnostics instead of a bare KeyError for CDF-5-only types
    (NC_UBYTE=7 ... NC_UINT64=11) or corrupt headers."""
    try:
        return _TYPES[nc_type]
    except KeyError:
        raise ValueError(
            f"unsupported nc_type {nc_type} (classic CDF-1/CDF-2 defines "
            "types 1-6; CDF-5 extended types are not supported)"
        ) from None


@dataclass
class _Var:
    name: str
    dimids: list[int]
    attrs: dict
    nc_type: int
    vsize: int
    begin: int
    is_record: bool = False
    data: np.ndarray = field(default=None, repr=False)


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.off : self.off + n]
        if len(b) != n:
            raise ValueError("truncated classic NetCDF file")
        self.off += n
        return b

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.u32()
        s = self.take(n).decode("utf-8")
        self.take((4 - n % 4) % 4)  # names pad to 4-byte boundary
        return s

    def attr_values(self, nc_type: int, nelems: int):
        dt, sz = _nc_dtype(nc_type)
        raw = self.take(nelems * sz)
        self.take((4 - (nelems * sz) % 4) % 4)  # values pad to 4
        if nc_type == 2:  # char attr = string
            return raw.decode("utf-8", errors="replace")
        vals = np.frombuffer(raw, dtype=dt)
        return vals[0] if nelems == 1 else vals

    def attr_list(self) -> dict:
        tag, nelems = self.u32(), self.u32()
        if tag == 0 and nelems == 0:  # ABSENT
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        out = {}
        for _ in range(nelems):
            nm = self.name()
            t = self.u32()
            n = self.u32()
            out[nm] = self.attr_values(t, n)
        return out


def parse_classic(buf: bytes):
    """Parse a classic NetCDF byte string.

    Returns (dims, global_attrs, vars) where dims is a list of
    (name, length) with the record dimension's length already
    resolved from numrecs, and every _Var carries its decoded numpy
    array (raw, pre-CF-unpacking) shaped by its dims.
    """
    magic = buf[:4]
    if magic == _MAGIC_CDF1:
        wide = False
    elif magic == _MAGIC_CDF2:
        wide = True
    elif magic == _MAGIC_HDF5:
        raise NotImplementedError(
            "netCDF-4 (HDF5-based) file: needs the xarray seam; the "
            "stdlib parser covers classic CDF-1/CDF-2 only"
        )
    else:
        raise ValueError(f"not a NetCDF file (magic {magic!r})")
    c = _Cursor(buf)
    c.take(4)
    numrecs = c.u32()  # 0xFFFFFFFF = STREAMING; resolved below

    tag, ndims = c.u32(), c.u32()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dims.append((c.name(), c.u32()))
    elif not (tag == 0 and ndims == 0):
        raise ValueError(f"bad dimension-list tag 0x{tag:x}")
    rec_dimid = next((i for i, (_, ln) in enumerate(dims) if ln == 0), None)

    gattrs = c.attr_list()

    tag, nvars = c.u32(), c.u32()
    if tag == 0 and nvars == 0:
        varlist: list[_Var] = []
    elif tag != _NC_VARIABLE:
        raise ValueError(f"bad variable-list tag 0x{tag:x}")
    else:
        varlist = []
        for _ in range(nvars):
            nm = c.name()
            rank = c.u32()
            dimids = [c.u32() for _ in range(rank)]
            vattrs = c.attr_list()
            nc_type = c.u32()
            vsize = c.u32()
            begin = c.i64() if wide else c.i32()
            varlist.append(
                _Var(
                    nm,
                    dimids,
                    vattrs,
                    nc_type,
                    vsize,
                    begin,
                    is_record=rec_dimid is not None and dimids[:1] == [rec_dimid],
                )
            )

    rec_vars = [v for v in varlist if v.is_record]
    dimlen = [ln for _, ln in dims]
    if numrecs == 0xFFFFFFFF:  # STREAMING: infer from file length
        if rec_vars:
            stride = _record_stride(rec_vars, dimlen)
            first = min(v.begin for v in rec_vars)
            numrecs = (len(buf) - first) // stride if stride else 0
        else:
            numrecs = 0

    for v in varlist:
        v.data = _read_var(buf, v, dimlen, numrecs, rec_vars)
    if rec_dimid is not None:
        nm, _ = dims[rec_dimid]
        dims[rec_dimid] = (nm, numrecs)
    return dims, gattrs, varlist


def _per_record_bytes(v: _Var, dimlen: list[int], pad: bool) -> int:
    # vsize in the header is the PADDED per-record size for record
    # vars; recompute from shape so a writer's nonstandard vsize
    # can't corrupt the read.
    _, sz = _nc_dtype(v.nc_type)
    n = sz
    for d in v.dimids[1:]:
        n *= dimlen[d]
    return n + ((4 - n % 4) % 4 if pad else 0)


def _record_stride(rec_vars: list[_Var], dimlen: list[int]) -> int:
    # The per-record blocks pad to 4 bytes UNLESS there is exactly one
    # record variable (the spec's special case).
    pad = len(rec_vars) > 1
    return sum(_per_record_bytes(v, dimlen, pad) for v in rec_vars)


def _read_var(buf, v: _Var, dimlen: list[int], numrecs, rec_vars) -> np.ndarray:
    dt, sz = _nc_dtype(v.nc_type)
    if not v.is_record:
        shape = tuple(dimlen[d] for d in v.dimids)
        count = int(np.prod(shape)) if shape else 1
        raw = buf[v.begin : v.begin + count * sz]
        return np.frombuffer(raw, dtype=dt, count=count).reshape(shape)
    stride = _record_stride(rec_vars, dimlen)
    per = int(np.prod([dimlen[d] for d in v.dimids[1:]])) if v.dimids[1:] else 1
    recs = []
    for r in range(numrecs):
        off = v.begin + r * stride
        recs.append(np.frombuffer(buf[off : off + per * sz], dtype=dt, count=per))
    shape = (numrecs, *(dimlen[d] for d in v.dimids[1:]))
    if numrecs == 0:
        return np.empty(shape, dtype=dt)
    return np.stack(recs).reshape(shape)


def _cf_unpack(v: _Var) -> np.ndarray:
    """xarray mask_and_scale semantics: fill -> NaN, then
    raw * scale_factor + add_offset (only when the attrs exist)."""
    a = v.attrs
    data = v.data
    if v.nc_type == 2:  # char array -> per-row strings not needed here
        return data
    fill = a.get("_FillValue", a.get("missing_value"))
    scale = a.get("scale_factor")
    offset = a.get("add_offset")
    if fill is None and scale is None and offset is None:
        return data
    out = data.astype(np.float64)
    if fill is not None:
        out = np.where(data == np.asarray(fill).astype(data.dtype), np.nan, out)
    if scale is not None:
        out = out * float(scale)
    if offset is not None:
        out = out + float(offset)
    return out


def _char_to_str(arr: np.ndarray) -> np.ndarray:
    """NC_CHAR data decodes to Python str: the LAST dimension is the
    string length (the classic-format convention xarray follows);
    trailing NULs and padding spaces are stripped. Returns an object
    array over the remaining dims (0-d for a rank-1 char var)."""
    if arr.ndim == 0:
        s = arr.tobytes().decode("utf-8", errors="replace").rstrip("\x00 ")
        return np.array(s, dtype=object)
    flat = arr.reshape(-1, arr.shape[-1])
    strs = [
        row.tobytes().decode("utf-8", errors="replace").rstrip("\x00 ")
        for row in flat
    ]
    return np.array(strs, dtype=object).reshape(arr.shape[:-1])


def _native(a: np.ndarray) -> np.ndarray:
    """File data is big-endian; pandas requires native byte order."""
    if a.dtype.byteorder in (">", "<") and a.dtype.byteorder != "=":
        return a.astype(a.dtype.newbyteorder("="))
    return a


def decode_netcdf_bytes(buf: bytes) -> pd.DataFrame:
    """bytes -> the frame xarray's ``to_dataframe().reset_index()``
    would give: one row per point of the full coordinate grid (all
    dims used by data variables, file order, C-order raveled), one
    column per coordinate dim and per data variable, CF-unpacked.

    Variables on a dim SUBSET broadcast across the missing dims,
    matching xarray's alignment.
    """
    dims, _gattrs, varlist = parse_classic(buf)
    return assemble_dataframe(dims, varlist)


def assemble_dataframe(dims, varlist) -> pd.DataFrame:
    """(dims, vars) -> the xarray-shaped frame. Shared by the classic
    parser and the netCDF-4/HDF5 reader (hdf5_min builds compatible
    ``_Var`` objects): the grid/broadcast/CF-unpack semantics are the
    FORMAT-INDEPENDENT half of S4."""
    dim_names = [n for n, _ in dims]
    coord_vars = {
        v.name: v
        for v in varlist
        if v.name in dim_names and v.dimids == [dim_names.index(v.name)]
    }
    data_vars = [v for v in varlist if v.name not in coord_vars]
    if not data_vars:
        raise ValueError("classic NetCDF file has no data variables")

    # NC_CHAR data variables are fixed-length strings: their last dim
    # is the string length, which never joins the coordinate grid.
    def _eff_dimids(v: _Var) -> list[int]:
        return v.dimids[:-1] if v.nc_type == 2 and v.dimids else v.dimids

    used: list[int] = []
    for v in data_vars:
        for d in _eff_dimids(v):
            if d not in used:
                used.append(d)
    used.sort()  # file dim order, like xarray's dataset dims
    shape = tuple(dims[d][1] for d in used)
    coords = []
    for d in used:
        nm, ln = dims[d]
        cv = coord_vars.get(nm)
        coords.append(_cf_unpack(cv).ravel() if cv is not None else np.arange(ln))
    grid = np.meshgrid(*coords, indexing="ij") if coords else []
    out = {dims[d][0]: _native(g.ravel()) for d, g in zip(used, grid)}
    for v in data_vars:
        if v.nc_type == 2:  # char -> str over the dims minus strlen
            full = _expand(_char_to_str(v.data), _eff_dimids(v), used, dims)
        else:
            full = _expand(_cf_unpack(v), v.dimids, used, dims)
        out[v.name] = _native(np.broadcast_to(full, shape).ravel())
    return pd.DataFrame(out)


def _expand(arr: np.ndarray, var_dims: list[int], used: list[int], dims) -> np.ndarray:
    """Reshape ``arr`` (over var_dims, file order) to rank len(used)
    with length-1 axes for dims the variable lacks."""
    # var_dims are already in increasing file order for classic files
    # (the record dim, if any, is first and has the smallest id among
    # used dims by construction of `used`); guard anyway.
    order = sorted(range(len(var_dims)), key=lambda i: used.index(var_dims[i]))
    arr = np.transpose(arr, order) if order != list(range(len(var_dims))) else arr
    shape = [dims[d][1] if d in var_dims else 1 for d in used]
    return arr.reshape(shape)
