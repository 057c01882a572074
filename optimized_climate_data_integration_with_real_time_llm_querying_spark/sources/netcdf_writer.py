"""Pure-stdlib WRITER for the NetCDF classic binary format
(CDF-1, and CDF-2 for files past 2 GiB).

The reader half of S4 (:mod:`.netcdf_classic`) decodes the format the
reference's ERA5 module consumes (ERA5_preprocessing.ipynb cell2-4);
this module is the inverse: a typed-grid sink so gridded results can
be handed BACK to netCDF-consuming tooling, and so the S4 family gets
the same write->read->content-oracle registry gate as every other
source/sink pair (parquet, JSONL, CSV, ORC, SQLite, Excel).

Format (NetCDF User's Guide, appendix "File Format Specification"):

    header := magic numrecs dim_list gatt_list var_list
    dim    := name length            (length 0 = the record dimension)
    attr   := name nc_type nelems values          (4-byte aligned)
    var    := name rank dimids vatt_list nc_type vsize begin

Fixed-size variables are contiguous at ``begin`` (each padded to 4);
record variables are interleaved per record, each per-record slab
padded to 4 bytes UNLESS there is exactly one record variable (the
spec's special case — both cases exercised in tests). All values are
big-endian. Like the SQLite sink, this is a driver-side single-file
path for DIM-SIZED grids (a dense coordinate grid is small by
construction); parquet remains the fact sink.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> big-endian numpy dtype (mirrors netcdf_classic._TYPES)
_TYPES = {
    1: np.dtype(">i1"),  # NC_BYTE
    2: np.dtype("S1"),  # NC_CHAR
    3: np.dtype(">i2"),  # NC_SHORT
    4: np.dtype(">i4"),  # NC_INT
    5: np.dtype(">f4"),  # NC_FLOAT
    6: np.dtype(">f8"),  # NC_DOUBLE
}


def _pad4(b: bytes) -> bytes:
    return b + b"\0" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _attr_bytes(name: str, value) -> bytes:
    """One attribute: str -> NC_CHAR, int -> NC_INT, float ->
    NC_DOUBLE, numpy scalar/array -> its matching nc_type."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return _name(name) + struct.pack(">II", 2, len(raw)) + _pad4(raw)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i" and arr.dtype.itemsize <= 4:
        t = {1: 1, 2: 3, 4: 4}[arr.dtype.itemsize]
    elif arr.dtype.kind == "i":
        # Compare against the int32 bounds directly: np.abs(int64 min)
        # overflows back negative (would bypass the guard), and
        # -2**31 itself IS representable by NC_INT.
        if ((arr < -(2**31)) | (arr > 2**31 - 1)).any():
            raise ValueError(f"attribute {name!r}: int64 exceeds NC_INT range")
        t, arr = 4, arr.astype(np.int32)
    elif arr.dtype.kind == "f":
        t = 5 if arr.dtype.itemsize == 4 else 6
    else:
        raise ValueError(f"attribute {name!r}: unsupported dtype {arr.dtype}")
    enc = arr.astype(_TYPES[t]).tobytes()
    return _name(name) + struct.pack(">II", t, len(arr)) + _pad4(enc)


def _attr_list(attrs: dict | None) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)  # ABSENT
    body = b"".join(_attr_bytes(k, v) for k, v in attrs.items())
    return struct.pack(">II", _NC_ATTRIBUTE, len(attrs)) + body


def _coerce(name: str, nc_type: int, values, shape: tuple[int, ...]) -> np.ndarray:
    if nc_type not in _TYPES:
        raise ValueError(
            f"variable {name!r}: unsupported nc_type {nc_type} "
            "(classic CDF defines types 1-6)"
        )
    arr = np.asarray(values)
    if nc_type == 2:
        # Convenience: fixed-width bytes ("S8") expand to S1 along a
        # new last axis matching the string-length dimension.
        if arr.dtype.kind == "S" and arr.dtype.itemsize > 1:
            width = arr.dtype.itemsize
            arr = (
                np.frombuffer(arr.tobytes(), dtype="S1")
                .reshape(*arr.shape, width)
                .copy()
            )
        arr = arr.astype("S1")
    else:
        arr = arr.astype(_TYPES[nc_type])
    if tuple(arr.shape) != shape:
        raise ValueError(
            f"variable {name!r}: values shape {tuple(arr.shape)} does not "
            f"match its dims shape {shape}"
        )
    return arr


def write_netcdf_classic(
    path: str | None,
    dims: list[tuple[str, int | None]],
    variables: list[dict],
    gattrs: dict | None = None,
    version: int = 1,
) -> bytes:
    """Encode a CDF-1/CDF-2 classic NetCDF file and (optionally)
    write it.

    ``dims``: (name, length) in file order; length ``None`` marks THE
    record dimension (at most one, classic rule). ``variables``: dicts
    with keys ``name``, ``nc_type`` (1-6), ``dims`` (dim-name list;
    a record variable must put the record dim FIRST), ``values``
    (array matching the dim shape; the record dim's length is taken
    from the data), optional ``attrs``. ``version=2`` writes CDF-2
    (64-bit variable offsets — files past 2 GiB; everything else is
    byte-identical). Returns the encoded bytes; writes them to
    ``path`` when given.
    """
    if version not in (1, 2):
        raise ValueError(f"classic NetCDF version must be 1 or 2, got {version}")
    dim_index = {n: i for i, (n, _) in enumerate(dims)}
    rec_ids = [i for i, (_, ln) in enumerate(dims) if ln is None]
    if len(rec_ids) > 1:
        raise ValueError("classic NetCDF allows at most one record dimension")
    rec_id = rec_ids[0] if rec_ids else None

    # Resolve numrecs from the record variables' data.
    numrecs = 0
    prepared = []
    for v in variables:
        dimids = []
        for dn in v["dims"]:
            if dn not in dim_index:
                raise ValueError(f"variable {v['name']!r}: unknown dim {dn!r}")
            dimids.append(dim_index[dn])
        is_record = rec_id is not None and rec_id in dimids
        if is_record and dimids[0] != rec_id:
            raise ValueError(
                f"variable {v['name']!r}: the record dimension must be "
                "its FIRST dimension (classic rule)"
            )
        arr = np.asarray(v["values"])
        if is_record:
            n = arr.shape[0] if arr.ndim else 0
            if numrecs and n != numrecs:
                raise ValueError(
                    f"variable {v['name']!r}: {n} records but an earlier "
                    f"record variable has {numrecs}"
                )
            numrecs = n
        prepared.append((v, dimids, is_record, arr))

    def dim_len(d: int) -> int:
        return numrecs if d == rec_id else dims[d][1]

    encoded = []
    for v, dimids, is_record, arr in prepared:
        shape = tuple(dim_len(d) for d in dimids)
        data = _coerce(v["name"], v["nc_type"], arr, shape)
        encoded.append((v, dimids, is_record, data))

    n_rec_vars = sum(1 for _, _, r, _ in encoded if r)
    pad_records = n_rec_vars > 1

    def slab_size(data: np.ndarray, is_record: bool) -> int:
        n = data.itemsize
        for s in data.shape[1:] if is_record else data.shape:
            n *= s
        return n

    def vsize(data: np.ndarray, is_record: bool) -> int:
        n = slab_size(data, is_record)
        if is_record and not pad_records:
            return n  # single-record-var special case: unpadded
        return n + ((4 - n % 4) % 4)

    begin_fmt = ">q" if version == 2 else ">i"

    def header(begins: list[int]) -> bytes:
        h = (b"CDF\x02" if version == 2 else b"CDF\x01") + struct.pack(
            ">I", numrecs
        )
        if dims:
            h += struct.pack(">II", _NC_DIMENSION, len(dims))
            for n, ln in dims:
                h += _name(n) + struct.pack(">I", 0 if ln is None else ln)
        else:
            h += struct.pack(">II", 0, 0)
        h += _attr_list(gattrs)
        if encoded:
            h += struct.pack(">II", _NC_VARIABLE, len(encoded))
            for (v, dimids, is_record, data), begin in zip(encoded, begins):
                h += _name(v["name"]) + struct.pack(">I", len(dimids))
                h += b"".join(struct.pack(">I", d) for d in dimids)
                h += _attr_list(v.get("attrs"))
                h += struct.pack(">II", v["nc_type"], vsize(data, is_record))
                h += struct.pack(begin_fmt, begin)
        else:
            h += struct.pack(">II", 0, 0)
        return h

    # begins don't change the CDF-1 header length (fixed 4 bytes each),
    # so one placeholder pass measures it.
    hlen = len(header([0] * len(encoded)))
    begins, off = [], hlen
    for v, dimids, is_record, data in encoded:
        if is_record:
            begins.append(-1)  # assigned in the record section below
        else:
            begins.append(off)
            n = data.nbytes if data.ndim else data.itemsize
            off += n + ((4 - n % 4) % 4)
    for i, (v, dimids, is_record, data) in enumerate(encoded):
        if begins[i] == -1:
            begins[i] = off
            off += vsize(data, is_record)

    out = bytearray(header(begins))
    for v, dimids, is_record, data in encoded:
        if not is_record:
            out += _pad4(data.tobytes())
    for r in range(numrecs):
        for v, dimids, is_record, data in encoded:
            if is_record:
                # r:r+1, not [r]: indexing a 1-D big-endian array
                # yields a numpy SCALAR, which serializes native-endian
                slab = data[r : r + 1].tobytes()
                out += _pad4(slab) if pad_records else slab
    buf = bytes(out)
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(buf)
    return buf
