"""Pure-stdlib WRITER for the netCDF-4 SUBSET of HDF5 — the second
half of the S4 sink story (:mod:`.netcdf_writer` is the classic
CDF-1/2 half; :mod:`.hdf5_min` is the matching reader).

Modern tooling increasingly REQUIRES the HDF5 container (xarray's
default engines, CDS downloads, h5netcdf); this writer hands a dense
typed grid back in that container so the engine's export path covers
both halves the reference's ecosystem consumes
(ERA5_preprocessing.ipynb cell2-4 reads exactly this file shape).

Layout written (HDF5 File Format Specification Version 3.0 — the
most-compatible classic shapes, all of them pinned by the reader's
spec-assembled fixtures in tests/test_hdf5_min.py):

- superblock version 0 (every HDF5 library ever released reads it),
- version-1 object headers and version-1 attribute messages,
- an old-style root group: local heap + one SNOD symbol node +
  a v1 group B-tree (names are sorted, the SNOD invariant),
- one dataset per dimension (netCDF-4 dimension scales: CLASS =
  "DIMENSION_SCALE", ``_Netcdf4Dimid``; pure dimensions carry the
  "not a netCDF variable" NAME sentinel and no data; dimensions
  with a same-named variable fold it in as a coordinate variable),
- data variables with contiguous v3 layouts and DIMENSION_LIST
  vlen-of-object-reference attributes through ONE global heap
  collection (GCOL) — the netCDF-4 dimension-attachment wiring.

Input contract mirrors :func:`.netcdf_writer.write_netcdf_classic`
(same nc_type codes, same variable dicts) so export call sites can
choose the container per file extension. Like the classic writer and
the SQLite/Excel sinks this is a driver-side single-file path for
DIM-SIZED grids; fact-sized data stays columnar (parquet).
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF

# nc_type -> little-endian numpy dtype (HDF5 is little-endian here;
# the classic format is big-endian — same codes, opposite byte order)
_TYPES = {
    1: np.dtype("<i1"),  # NC_BYTE
    2: np.dtype("S1"),  # NC_CHAR
    3: np.dtype("<i2"),  # NC_SHORT
    4: np.dtype("<i4"),  # NC_INT
    5: np.dtype("<f4"),  # NC_FLOAT
    6: np.dtype("<f8"),  # NC_DOUBLE
}

_NC_DIM_SENTINEL = "This is a netCDF dimension but not a netCDF variable."


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * ((8 - len(b) % 8) % 8)


# ------------------------------------------------------ message encoders


def _msg(mtype: int, body: bytes) -> bytes:
    """v1 object-header message frame: type(2) size(2) flags(1) pad(3)."""
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return (
        struct.pack("<BBHII", 1, 0, len(messages), 1, len(blob)) + b"\0" * 4 + blob
    )


def _dt_fixed(size: int, signed: bool = True) -> bytes:
    return (
        bytes([0x10, 0x08 if signed else 0x00, 0, 0])
        + struct.pack("<I", size)
        + struct.pack("<HH", 0, size * 8)
    )


def _dt_float(size: int) -> bytes:
    if size == 8:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    else:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
    return bytes([0x11, 0x20, 0x3F, 0]) + struct.pack("<I", size) + props


def _dt_string(size: int) -> bytes:
    return bytes([0x13, 0, 0, 0]) + struct.pack("<I", size)


def _dt_reference() -> bytes:
    return bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)


def _dt_vlen_of_ref() -> bytes:
    return bytes([0x19, 0, 0, 0]) + struct.pack("<I", 16) + _dt_reference()


def _dt_of(nc_type: int, strlen: int = 1) -> bytes:
    if nc_type == 2:
        return _dt_string(strlen)
    if nc_type in (1, 3, 4):
        return _dt_fixed(_TYPES[nc_type].itemsize)
    if nc_type in (5, 6):
        return _dt_float(_TYPES[nc_type].itemsize)
    raise ValueError(f"unsupported nc_type {nc_type}")


def _ds_simple(dims: list[int]) -> bytes:
    return (
        bytes([1, len(dims), 0, 0])
        + b"\0" * 4
        + b"".join(struct.pack("<Q", d) for d in dims)
    )


def _layout_contiguous(addr: int, size: int) -> bytes:
    return _msg(0x0008, bytes([3, 1]) + struct.pack("<QQ", addr, size))


def _attr_msg(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nb = name.encode("utf-8") + b"\0"
    body = (
        struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
        + _pad8(nb)
        + _pad8(dt)
        + _pad8(ds)
        + data
    )
    return _msg(0x000C, body)


def _attr_value_msg(name: str, value) -> bytes:
    """Coerce a python/numpy attribute value the same way the classic
    writer's _attr_bytes does: str -> fixed string (NUL-terminated),
    int -> i4 (range-guarded), float -> f8, numpy arrays keep their
    width."""
    if isinstance(value, str):
        raw = value.encode("utf-8") + b"\0"
        return _attr_msg(name, _dt_string(len(raw)), _ds_simple([]), raw)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i" and arr.dtype.itemsize <= 4:
        enc = arr.astype(f"<i{arr.dtype.itemsize}")
        dt = _dt_fixed(arr.dtype.itemsize)
    elif arr.dtype.kind == "i":
        if ((arr < -(2**31)) | (arr > 2**31 - 1)).any():
            raise ValueError(f"attribute {name!r}: int64 exceeds NC_INT range")
        enc = arr.astype("<i4")
        dt = _dt_fixed(4)
    elif arr.dtype.kind == "f":
        size = 4 if arr.dtype.itemsize == 4 else 8
        enc = arr.astype(f"<f{size}")
        dt = _dt_float(size)
    else:
        raise ValueError(f"attribute {name!r}: unsupported dtype {arr.dtype}")
    ds = _ds_simple([] if np.asarray(value).ndim == 0 else [len(arr)])
    return _attr_msg(name, dt, ds, enc.tobytes())


# ------------------------------------------------------------ file builder


class _Buf:
    def __init__(self):
        self.buf = bytearray(b"\0" * 96)  # superblock v0 placeholder

    def put(self, b: bytes) -> int:
        while len(self.buf) % 8:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf.extend(b)
        return addr

    def finish(self, root_header: int, leaf_k: int = 4) -> bytes:
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])  # versions + 8/8 sizes
        sb += struct.pack("<HHI", leaf_k, 16, 0)  # leaf K, internal K, flags
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol-table entry (cache type 1, scratch zeroed)
        sb += struct.pack("<QQI4x16x", 0, root_header, 1)
        assert len(sb) == 96
        self.buf[:96] = sb
        return bytes(self.buf)


def _coerce(name: str, nc_type: int, values, shape: tuple[int, ...]) -> np.ndarray:
    """Match the classic writer's coercion: data reshaped to the dim
    shape in its little-endian on-disk dtype; NC_CHAR values must be
    an ``S{n}`` array whose width is the LAST dim's length."""
    if nc_type == 2:
        arr = np.asarray(values)
        if arr.dtype.kind != "S":
            raise ValueError(f"variable {name!r}: NC_CHAR needs an S-dtype array")
        if not shape or arr.dtype.itemsize != shape[-1]:
            raise ValueError(
                f"variable {name!r}: string width {arr.dtype.itemsize} must "
                f"equal the last (strlen) dimension {shape[-1] if shape else '?'}"
            )
        want = shape[:-1]
        if tuple(arr.shape) != want:
            arr = arr.reshape(want)
        return arr
    arr = np.asarray(values, dtype=_TYPES[nc_type])
    if tuple(arr.shape) != shape:
        arr = arr.reshape(shape)
    return arr


def write_netcdf4(
    path: str | None,
    dims: list[tuple[str, int | None]],
    variables: list[dict],
    gattrs: dict | None = None,
) -> bytes:
    """Encode a netCDF-4 (HDF5) file and (optionally) write it.

    Same contract as :func:`.netcdf_writer.write_netcdf_classic`:
    ``dims`` are (name, length) in id order (``None`` = take the
    length from the first variable using that dim on its first axis
    — HDF5 has no record-dimension special case, the length is just
    resolved); ``variables`` are dicts with ``name``, ``nc_type``
    (1-6), ``dims``, ``values``, optional ``attrs``. A variable named
    like a dimension becomes that dimension's COORDINATE variable
    (folded into the dimension-scale dataset, netCDF-4 semantics).
    NC_CHAR variables use the classic (..., strlen-dim) convention
    and are stored as fixed-width HDF5 strings over the leading dims.
    Returns the encoded bytes; writes them to ``path`` when given.
    """
    dim_index = {n: i for i, (n, _) in enumerate(dims)}
    by_name = {v["name"]: v for v in variables}
    if len(by_name) != len(variables):
        raise ValueError("duplicate variable names")
    for v in variables:
        for dn in v["dims"]:
            if dn not in dim_index:
                raise ValueError(f"variable {v['name']!r}: unknown dim {dn!r}")

    # resolve None-length dims from data (classic-API parity)
    lengths: list[int] = []
    for n, ln in dims:
        if ln is None:
            user = next((v for v in variables if v["dims"][:1] == [n]), None)
            if user is None:
                raise ValueError(f"dim {n!r}: no length and no variable to infer it")
            ln = int(np.asarray(user["values"]).shape[0])
        lengths.append(int(ln))

    b = _Buf()

    def shape_of(v: dict) -> tuple[int, ...]:
        return tuple(lengths[dim_index[d]] for d in v["dims"])

    def data_msgs(v: dict | None, shape: tuple[int, ...]) -> tuple[list[bytes], bytes, bytes]:
        """(layout msgs, datatype body, dataspace body) for a var —
        or an UNDEF empty layout for a pure dimension."""
        if v is None:
            return (
                [_layout_contiguous(UNDEF, 0)],
                _dt_float(4),
                _ds_simple(list(shape)),
            )
        arr = _coerce(v["name"], v["nc_type"], v["values"], shape)
        addr = b.put(arr.tobytes())
        if v["nc_type"] == 2:
            dt = _dt_string(shape[-1])
            ds = _ds_simple(list(shape[:-1]))
        else:
            dt = _dt_of(v["nc_type"])
            ds = _ds_simple(list(shape))
        return [_layout_contiguous(addr, arr.nbytes)], dt, ds

    def attr_msgs(v: dict | None) -> list[bytes]:
        out = []
        for k, val in (v or {}).get("attrs", {}).items() if v else []:
            out.append(_attr_value_msg(k, val))
        return out

    # --- dimension-scale datasets (coordinate variables folded in) ---
    entries: list[tuple[str, int]] = []
    dim_hdr: list[int] = []
    for i, (n, _ln) in enumerate(dims):
        coord = by_name.get(n)
        if coord is not None and coord["dims"] != [n]:
            raise ValueError(
                f"coordinate variable {n!r} must span exactly its own dimension"
            )
        layout, dt, ds = data_msgs(coord, (lengths[i],))
        msgs = [_msg(0x0001, ds), _msg(0x0003, dt)] + layout
        msgs.append(
            _attr_msg(
                "CLASS", _dt_string(16), _ds_simple([]), b"DIMENSION_SCALE\0"
            )
        )
        msgs.append(_attr_value_msg("_Netcdf4Dimid", np.int32(i)))
        if coord is None:
            sentinel = (f"{_NC_DIM_SENTINEL}{lengths[i]:10d}").encode() + b"\0"
            msgs.append(
                _attr_msg("NAME", _dt_string(len(sentinel)), _ds_simple([]), sentinel)
            )
        msgs.extend(attr_msgs(coord))
        hdr = b.put(_object_header(msgs))
        dim_hdr.append(hdr)
        entries.append((n, hdr))

    # --- ONE global heap collection: an object-reference list per dim ---
    payload = b""
    for i, hdr in enumerate(dim_hdr, start=1):
        payload += struct.pack("<HH4xQ", i, 1, 8) + _pad8(struct.pack("<Q", dim_hdr[i - 1]))
    # libhdf5 validates Collection Size >= H5HG_MINSIZE (4096 bytes,
    # H5HGprivate.h) when it loads a collection, and the terminating
    # free-space object (index 0) must carry the remaining space in
    # its size field — which, per spec IV.E, INCLUDES object 0's own
    # 16-byte header. A minimal/zero-sized trailer makes every
    # DIMENSION_LIST unreadable by h5py/netcdf-c, the exact consumers
    # this container targets.
    total = max(4096, 16 + len(payload) + 16)
    free = total - 16 - len(payload)
    coll = b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack("<Q", total)
    coll += payload + struct.pack("<HH4xQ", 0, 0, free)
    coll += b"\0" * (total - len(coll))
    gcol = b.put(coll)

    def dimension_list(dimids: list[int]) -> bytes:
        data = b"".join(struct.pack("<IQI", 1, gcol, i + 1) for i in dimids)
        return _attr_msg(
            "DIMENSION_LIST", _dt_vlen_of_ref(), _ds_simple([len(dimids)]), data
        )

    # --- data variables ---
    for v in variables:
        if v["name"] in dim_index:
            continue  # folded into its dimension scale above
        shape = shape_of(v)
        layout, dt, ds = data_msgs(v, shape)
        axes = v["dims"][:-1] if v["nc_type"] == 2 else v["dims"]
        msgs = [_msg(0x0001, ds), _msg(0x0003, dt)] + layout
        if axes:
            msgs.append(dimension_list([dim_index[d] for d in axes]))
        msgs.extend(attr_msgs(v))
        entries.append((v["name"], b.put(_object_header(msgs))))

    # --- old-style root group: local heap + SNOD + v1 B-tree ---
    heap_data = bytearray(b"\0" * 8)  # offset 0 = the empty string
    name_offs: dict[str, int] = {}
    for nm, _ in entries:
        name_offs[nm] = len(heap_data)
        heap_data += _pad8(nm.encode("utf-8") + b"\0")
    heap_seg = b.put(bytes(heap_data))
    heap_hdr = b.put(
        b"HEAP"
        + bytes([0, 0, 0, 0])
        + struct.pack("<QQQ", len(heap_data), 1, heap_seg)
    )
    # libhdf5 rejects a symbol-table node whose record count exceeds
    # 2 * (superblock group-leaf K) — "bad symbol table node record
    # count". The leaf K is a writer-controlled 2-byte field, so size
    # it to the entry count (all entries stay in ONE sorted SNOD,
    # which an under-full leaf permits); past the 2-byte ceiling the
    # writer is loud instead of emitting a file external tools reject.
    leaf_k = max(4, (len(entries) + 1) // 2)
    if leaf_k > 0xFFFF:
        raise NotImplementedError(
            f"{len(entries)} root objects exceeds the single-SNOD ceiling "
            "(2*65535); multi-SNOD group B-trees are not written"
        )
    snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(entries))
    ordered = sorted(entries)
    for nm, hdr in ordered:
        snod += struct.pack("<QQI4x16x", name_offs[nm], hdr, 0)
    snod_addr = b.put(snod)
    btree = b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    btree += struct.pack("<QQ", UNDEF, UNDEF)
    btree += struct.pack("<QQQ", 0, snod_addr, name_offs[ordered[-1][0]])
    bt_addr = b.put(btree)

    root_msgs = [_msg(0x0011, struct.pack("<QQ", bt_addr, heap_hdr))]
    for k, val in (gattrs or {}).items():
        root_msgs.append(_attr_value_msg(k, val))
    root_hdr = b.put(_object_header(root_msgs))

    blob = b.finish(root_hdr, leaf_k=leaf_k)
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob
