"""Pure-stdlib reader for the netCDF-4 SUBSET of HDF5 — the second
half of S4 (the classic CDF-1/2 half lives in netcdf_classic.py).

The reference ingests ERA5 ``.nc`` files with xarray
(ERA5_preprocessing.ipynb cell2-4); modern CDS downloads are
netCDF-4, i.e. HDF5 containers. This container has no
xarray/netcdf4/h5py, but the HDF5 file format is a public
specification ("HDF5 File Format Specification Version 3.0") and the
subset netCDF-4 actually uses is small enough to decode with
``struct`` + ``zlib`` + numpy:

- superblock versions 0 (libhdf5's default compatibility bounds) and
  2/3 (LIBVER_LATEST bounds),
- version-1 object headers (+ continuation blocks) AND version-2
  "OHDR" headers (+ OCHK continuations; checksums skipped, not
  verified),
- old-style groups (symbol-table message -> v1 B-tree -> SNOD symbol
  nodes -> local heap names), new-style COMPACT groups (inline Link
  messages), and new-style DENSE groups (link-name v2 B-tree type-5
  records resolved through a managed fractal heap — root direct
  block, root indirect block of direct blocks, or nested indirect
  blocks for heaps past the doubling table's max-direct rows),
- dataspace (v1), datatype (fixed-point / IEEE-float / fixed string /
  reference / vlen-of-reference), fill value, attribute (v1 and v3,
  inline AND dense: Attribute Info message -> attribute-name v2
  B-tree type-8 records -> v3 bodies in a fractal heap, the storage
  libhdf5 switches to past 8 attributes per object — a CF-complete
  variable's metadata would silently vanish otherwise),
  data layout v3 and v4 (compact, contiguous and chunked),
- chunked data through the v1 B-tree (node type 1) AND all five
  v4-layout chunk indexes LIBVER_LATEST writes: single-chunk,
  implicit, and fixed-array (paged AND unpaged — million-chunk
  archive-scale grids use the paged form) for fixed-dims datasets,
  extensible-array (paged AND unpaged data blocks — the paged form
  is what an archive-scale appendable time axis grows into, page-init
  bitmap read from the owning super block) for ONE unlimited
  dimension — the appendable netCDF-4 record/time axis — and v2
  B-trees
  (root-leaf AND multi-level, child-pointer widths from the H5B2
  node_info math) for 2+ unlimited dimensions, all with filtered
  entries, with the deflate (id 1) and shuffle (id 2) filters
  (pipeline message v1 and v2),
- vlen attribute payloads through global heap collections (GCOL) —
  what netCDF-4's DIMENSION_LIST uses to attach dimensions to
  variables.

netCDF-4 semantics on top: datasets whose CLASS attribute is
"DIMENSION_SCALE" are dimensions (pure dimensions carry the "This is
a netCDF dimension but not a netCDF variable" NAME and contribute
only their length; dimension scales with real data are coordinate
variables); every data variable's dims come from DIMENSION_LIST
object references. CF unpacking (scale_factor / add_offset /
_FillValue) and the grid assembly are shared with the classic reader
(netcdf_classic.assemble_dataframe), so both halves of S4 produce
the same xarray-shaped frame.

Groups decode from all three storages: old-style symbol tables,
compact link messages, and DENSE (fractal-heap) storage — the
link-name v2 B-tree's records resolve through the heap's doubling
table (root direct block, root indirect block, or nested indirect
blocks once a row's block size passes the max-direct threshold),
which is what libhdf5 switches to past the 8-link compact threshold.

Anything outside the subset — later superblocks, v2 object headers,
v1/v2 data layouts, filters beyond deflate+shuffle+fletcher32,
compound datatypes, filtered fractal heaps, tiny/filtered-huge heap
objects —
raises a loud ``NotImplementedError`` naming the feature;
``ingest.read_netcdf`` then falls back to the xarray seam, which
stays the documented escape hatch for exotic files.

Tests assemble HDF5 bytes FROM THE SPEC (tests/test_hdf5_min.py), the
same discipline that pinned the classic parser against the format
rather than against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from .netcdf_classic import _Var, assemble_dataframe

MAGIC = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


class _F:
    """Cursor-free random-access helpers over the whole file buffer."""

    def __init__(self, buf: bytes):
        self.buf = buf

    def u(self, off: int, n: int) -> int:
        # Route through raw() so a truncated file fails loudly at the
        # point of truncation instead of yielding a silently-shortened
        # integer (bogus address/count) that wanders before failing.
        return int.from_bytes(self.raw(off, n), "little")

    def raw(self, off: int, n: int) -> bytes:
        b = self.buf[off : off + n]
        if len(b) != n:
            raise ValueError("truncated HDF5 file")
        return b


# --------------------------------------------------------------- superblock


def _superblock(f: _F) -> dict:
    if f.raw(0, 8) != MAGIC:
        raise ValueError("not an HDF5 file")
    ver = f.u(8, 1)
    if ver == 0:
        size_off, size_len = f.u(13, 1), f.u(14, 1)
        if (size_off, size_len) != (8, 8):
            raise NotImplementedError(
                f"HDF5 offsets/lengths of {size_off}/{size_len} bytes: only 8/8"
            )
        # addresses start at 24 (leaf/internal K at 16/18, consistency
        # flags at 20); base + free-space + EOF + driver-info = 32
        # bytes, so the root group symbol table entry starts at 56 and
        # its object header address is its second 8-byte field.
        root_entry_off = 24 + 8 * 4
        return {"root_header": f.u(root_entry_off + 8, 8)}
    if ver in (2, 3):
        # v2/v3 (LIBVER_LATEST bounds): version(8), size of offsets(9),
        # size of lengths(10), consistency flags(11), then base /
        # superblock-extension / EOF / root OBJECT HEADER addresses,
        # then a checksum (not verified — see module doc).
        size_off, size_len = f.u(9, 1), f.u(10, 1)
        if (size_off, size_len) != (8, 8):
            raise NotImplementedError(
                f"HDF5 offsets/lengths of {size_off}/{size_len} bytes: only 8/8"
            )
        return {"root_header": f.u(36, 8)}
    raise NotImplementedError(
        f"HDF5 superblock version {ver}: versions 0, 2, and 3 are supported"
    )


# ----------------------------------------------------------- object headers


def _messages(f: _F, header_addr: int) -> list[tuple[int, bytes]]:
    """All (type, data) messages of a v1 or v2 object header,
    following continuation blocks."""
    if f.raw(header_addr, 4) == b"OHDR":
        return _messages_v2(f, header_addr)
    ver = f.u(header_addr, 1)
    if ver != 1:
        raise NotImplementedError(
            f"HDF5 object header version {ver}: only version 1 "
            "(old-style) and version 2 (OHDR) are supported"
        )
    n_msgs = f.u(header_addr + 2, 2)
    block_size = f.u(header_addr + 8, 4)
    # v1 prefix is 12 bytes + 4 padding; messages are 8-aligned.
    blocks = [(header_addr + 16, block_size)]
    out: list[tuple[int, bytes]] = []
    while blocks and len(out) < n_msgs:
        off, remaining = blocks.pop(0)
        while remaining >= 8 and len(out) < n_msgs:
            mtype = f.u(off, 2)
            msize = f.u(off + 2, 2)
            flags = f.u(off + 4, 1)
            if flags & 0x02:
                # A shared message's body is a REFERENCE into the
                # shared-message heap, not the message itself —
                # parsing it as inline data would silently misread.
                raise NotImplementedError(
                    f"HDF5 shared message (type 0x{mtype:04x}): the "
                    "netCDF-4 subset stores messages inline"
                )
            body = f.raw(off + 8, msize)
            off += 8 + msize
            remaining -= 8 + msize
            if mtype == 0x0010:  # continuation: (offset, length)
                c_off = int.from_bytes(body[0:8], "little")
                c_len = int.from_bytes(body[8:16], "little")
                blocks.append((c_off, c_len))
                out.append((mtype, body))
            else:
                out.append((mtype, body))
    return out


def _messages_v2(f: _F, header_addr: int) -> list[tuple[int, bytes]]:
    """Version-2 ("OHDR") object header + OCHK continuation blocks.
    Checksums are skipped, not verified (the decode targets trusted
    archives; a flipped bit surfaces as a loud parse error instead).
    """
    ver = f.u(header_addr + 4, 1)
    if ver != 2:
        raise NotImplementedError(f"OHDR version {ver}")
    flags = f.u(header_addr + 5, 1)
    p = header_addr + 6
    if flags & 0x20:  # access/mod/change/birth times stored
        p += 16
    if flags & 0x10:  # non-default attribute phase-change values
        p += 4
    c0len = 1 << (flags & 0x03)
    chunk0 = f.u(p, c0len)
    p += c0len
    track_order = bool(flags & 0x04)
    # each block = (start of message bytes, length of message bytes);
    # chunk 0 ends with a 4-byte checksum, OCHK blocks carry a 4-byte
    # signature up front and a checksum at the end.
    blocks = [(p, chunk0)]
    out: list[tuple[int, bytes]] = []
    while blocks:
        off, remaining = blocks.pop(0)
        hdr = 4 + (2 if track_order else 0)
        while remaining >= hdr + 4:
            mtype = f.u(off, 1)
            msize = f.u(off + 1, 2)
            mflags = f.u(off + 3, 1)
            if mflags & 0x02:
                raise NotImplementedError(
                    f"HDF5 shared message (type 0x{mtype:02x}): the "
                    "netCDF-4 subset stores messages inline"
                )
            body = f.raw(off + hdr, msize)
            off += hdr + msize
            remaining -= hdr + msize
            if mtype == 0x10:
                c_off = int.from_bytes(body[0:8], "little")
                c_len = int.from_bytes(body[8:16], "little")
                if f.raw(c_off, 4) != b"OCHK":
                    raise ValueError("bad continuation block signature")
                blocks.append((c_off + 4, c_len - 8))  # minus sig+checksum
            out.append((mtype, body))
    return out


def _link_message(body: bytes) -> tuple[str, int]:
    """(name, object header address) from a hard Link message (the
    compact-group storage LIBVER_LATEST uses for small groups)."""
    ver, flags = body[0], body[1]
    if ver != 1:
        raise NotImplementedError(f"link message version {ver}")
    p = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[p]
        p += 1
    if flags & 0x04:  # creation order
        p += 8
    if flags & 0x10:  # charset
        p += 1
    nlen_size = 1 << (flags & 0x03)
    nlen = int.from_bytes(body[p : p + nlen_size], "little")
    p += nlen_size
    name = body[p : p + nlen].decode("utf-8")
    p += nlen
    if ltype != 0:
        raise NotImplementedError(
            f"link type {ltype} ({name!r}): only hard links are in the subset"
        )
    return name, int.from_bytes(body[p : p + 8], "little")


def _btree2_records(f: "_F", addr: int, want_type: int) -> list[bytes]:
    """All records of a version-2 B-tree (BTHD -> BTIN -> BTLF), in
    tree order. Same H5B2 node_info child-pointer math as the chunk
    walker in _read_data_v4; factored separately because this caller
    (the dense-group link-name index, record type 5) wants the raw
    record bytes rather than chunk placement."""
    if f.raw(addr, 4) != b"BTHD":
        raise ValueError("bad v2 B-tree header signature")
    rec_type = f.u(addr + 5, 1)
    if rec_type != want_type:
        raise ValueError(
            f"v2 B-tree record type {rec_type}: expected type {want_type}"
        )
    node_size = f.u(addr + 6, 4)
    record_size = f.u(addr + 10, 2)
    depth = f.u(addr + 12, 2)
    root_addr = f.u(addr + 16, 8)
    root_nrec = f.u(addr + 24, 2)
    out: list[bytes] = []
    if root_addr == UNDEF or root_nrec == 0:
        return out
    leaf_max = (node_size - 10) // record_size
    if leaf_max < 1:
        raise ValueError(
            f"v2 B-tree node size {node_size} cannot hold one record "
            f"of size {record_size}"
        )
    max_nrec_size = (leaf_max.bit_length() - 1) // 8 + 1
    cum_max = leaf_max
    cum_size = [0]  # cum_size[d] = bytes encoding a depth-d subtree total
    for d in range(1, depth + 1):
        ptr = 8 + max_nrec_size + cum_size[d - 1]
        int_max = (node_size - 10 - ptr) // (record_size + ptr)
        if int_max < 1:
            raise ValueError(
                f"v2 B-tree node size {node_size} cannot hold an "
                f"internal record+pointer at depth {d}"
            )
        cum_max = (int_max + 1) * cum_max + int_max
        cum_size.append((cum_max.bit_length() - 1) // 8 + 1)

    def walk(naddr: int, nrec: int, d: int) -> None:
        if d == 0:
            if f.raw(naddr, 4) != b"BTLF":
                raise ValueError("bad v2 B-tree leaf signature")
            rp = naddr + 6  # sig(4) version(1) type(1)
            for _ in range(nrec):
                out.append(f.raw(rp, record_size))
                rp += record_size
            return
        if f.raw(naddr, 4) != b"BTIN":
            raise ValueError("bad v2 B-tree internal node signature")
        rp = naddr + 6
        for _ in range(nrec):
            out.append(f.raw(rp, record_size))
            rp += record_size
        tot_size = cum_size[d - 1] if d > 1 else 0
        for _ in range(nrec + 1):
            caddr = f.u(rp, 8)
            cnrec = f.u(rp + 8, max_nrec_size)
            rp += 8 + max_nrec_size + tot_size
            walk(caddr, cnrec, d - 1)

    walk(root_addr, root_nrec, depth)
    return out


class _FractalHeap:
    """Object reader for one fractal heap (spec III.D). MANAGED IDs:
    the header's doubling table maps the ID's linear offset to a
    direct block (root direct, root indirect, or nested indirect),
    whose bytes map 1:1 onto its slice of the heap's linear address
    space (header included — the allocator reserves the prefix).
    HUGE IDs (objects past the max-managed size, e.g. a >4 KB array
    attribute): the ID's sequence number resolves through the
    header's huge-object v2 B-tree (indirect unfiltered records).
    Dense group storage keeps one serialized Link message per
    object; dense attribute storage one v3 attribute body.
    Unfiltered heaps only (link/attribute storage never filters);
    TINY IDs stay loud — no link or attribute body fits inside a
    7/8-byte ID."""

    def __init__(self, f: "_F", addr: int):
        if f.raw(addr, 4) != b"FRHP":
            raise ValueError("bad fractal heap header signature")
        self.f = f
        self.id_len = f.u(addr + 5, 2)
        io_filter_len = f.u(addr + 7, 2)
        if io_filter_len:
            raise NotImplementedError(
                "I/O-filtered fractal heap: dense group link storage "
                "is never filtered in the netCDF-4 subset"
            )
        # after flags(1): max managed size(4), then twelve 8-byte
        # statistics/bookkeeping fields (next huge ID, huge B-tree,
        # free space, free-space manager, managed space, allocated
        # managed, iterator offset, #managed, huge size, #huge,
        # tiny size, #tiny), then the doubling table. The huge-object
        # B-tree address (second of the twelve) serves HUGE heap IDs:
        # objects past the max-managed size — e.g. a >4 KB array or
        # history attribute — move out of the doubling table.
        self.huge_bt = f.u(addr + 22, 8)
        p = addr + 10 + 4 + 8 * 12
        self.width = f.u(p, 2)
        self.start_size = f.u(p + 2, 8)
        self.max_direct = f.u(p + 10, 8)
        max_heap_bits = f.u(p + 18, 2)
        self.off_size = (max_heap_bits + 7) // 8
        self.len_size = self.id_len - 1 - self.off_size
        if self.len_size < 1:
            raise ValueError("fractal heap ID shorter than its offset field")
        # starting rows(2) at p+20 (unused: current rows governs)
        self.root_addr = f.u(p + 22, 8)
        self.root_rows = f.u(p + 30, 2)

    def _row_size(self, r: int) -> int:
        # doubling table: rows 0 and 1 use the starting size, every
        # later row doubles
        return self.start_size if r < 2 else self.start_size << (r - 1)

    def _row_off(self, r: int) -> int:
        return 0 if r == 0 else (self.width * self.start_size) << (r - 1)

    def _iblock_nrows(self, span: int) -> int:
        # rows of a NON-root indirect block covering `span` bytes:
        # sum of its row spans (width*start, width*start, 2x, 4x, ...)
        # equals width*start*2^(nrows-1) = span, i.e.
        # nrows = log2(span) - log2(width*start) + 1 — libhdf5's
        # H5HF dtable "(log2(size) - first_row_bits) + 1".
        first_row_bits = (self.width * self.start_size).bit_length() - 1
        return (span.bit_length() - 1) - first_row_bits + 1

    def _locate(self, off: int) -> tuple[int, int, int]:
        """linear offset -> (direct block file addr, block linear
        offset, block size)."""
        if self.root_rows == 0:  # root IS a direct block
            return self.root_addr, 0, self.start_size
        return self._locate_in(self.root_addr, 0, self.root_rows, off)

    def _locate_in(
        self, iaddr: int, istart: int, nrows: int, off: int
    ) -> tuple[int, int, int]:
        """Walk one indirect block (root or nested). Every entry in
        row r — direct OR indirect — covers _row_size(r) bytes of
        linear space; the doubling-table rows RESTART at 0 inside
        each indirect block, so the same row math recurses. Rows
        whose block size exceeds max_direct hold child indirect
        blocks (each subdividing its span with its own rows of
        direct blocks); unfiltered heaps keep every entry 8 bytes,
        so the entry array indexes uniformly as r*width + col."""
        f = self.f
        if f.raw(iaddr, 4) != b"FHIB":
            raise ValueError("bad fractal heap indirect block signature")
        blk_off = f.u(iaddr + 13, self.off_size)
        if blk_off != istart:
            raise ValueError(
                f"fractal heap indirect block offset {blk_off} does not "
                f"match its addressed position {istart}"
            )
        rel = off - istart
        if rel < self.width * self.start_size:
            r = 0
        else:
            r = 1
            while self._row_off(r + 1) <= rel:
                r += 1
        if r >= nrows:
            raise ValueError(
                f"fractal heap offset {off} beyond this indirect "
                f"block's {nrows} rows"
            )
        size_r = self._row_size(r)
        col = (rel - self._row_off(r)) // size_r
        # entries are row-major, width per row; unfiltered heap ->
        # 8-byte child addresses after sig(4) version(1) heap
        # header(8) block offset(off_size)
        entry = iaddr + 13 + self.off_size + (r * self.width + col) * 8
        addr = f.u(entry, 8)
        if addr == UNDEF:
            # An ID into an unallocated block never comes out of a
            # consistent name index, but NotImplementedError keeps
            # ingest.read_netcdf's xarray-fallback contract: only
            # corruption we can prove is a ValueError.
            raise NotImplementedError(
                "fractal heap object in an unallocated block"
            )
        child_start = istart + self._row_off(r) + col * size_r
        if size_r <= self.max_direct:
            return addr, child_start, size_r
        # nested indirect block covering size_r bytes of linear space
        return self._locate_in(addr, child_start, self._iblock_nrows(size_r), off)

    def _read_huge(self, heap_id: bytes) -> bytes:
        """Huge object: the ID carries a sequence number looked up in
        the header's huge-object v2 B-tree. With the 7/8-byte ID
        lengths dense links/attributes use, IDs are always INDIRECT
        (a direct ID needs 1 + 8 + 8 = 17 bytes) and unfiltered
        (record type 3: address(8) + length(8) + ID); filtered and
        direct record types stay loud."""
        f = self.f
        if self.huge_bt == UNDEF:
            raise ValueError(
                "huge fractal heap ID without a huge-object B-tree"
            )
        rtype = f.u(self.huge_bt + 5, 1)
        if rtype != 3:
            raise NotImplementedError(
                f"huge-object B-tree record type {rtype}: only "
                "indirectly-accessed unfiltered huge objects (type 3) "
                "are in the subset"
            )
        hid = int.from_bytes(heap_id[1 : self.id_len], "little")
        for rec in _btree2_records(f, self.huge_bt, 3):
            if int.from_bytes(rec[16:], "little") == hid:
                addr = int.from_bytes(rec[0:8], "little")
                ln = int.from_bytes(rec[8:16], "little")
                return f.raw(addr, ln)
        raise ValueError(f"huge heap ID {hid} not in the huge-object B-tree")

    def read_object(self, heap_id: bytes) -> bytes:
        vt = heap_id[0]
        if vt & 0xC0:
            raise NotImplementedError(f"fractal heap ID version {vt >> 6}")
        id_type = (vt >> 4) & 0x3
        if id_type == 1:  # huge: past the max-managed-object size
            return self._read_huge(heap_id)
        if id_type:  # tiny (payload inside the ID) never fits a link
            # or attribute body at the 7/8-byte ID lengths
            raise NotImplementedError(
                "tiny fractal heap object: dense group links and "
                "attributes are managed or huge objects"
            )
        off = int.from_bytes(heap_id[1 : 1 + self.off_size], "little")
        ln = int.from_bytes(
            heap_id[1 + self.off_size : 1 + self.off_size + self.len_size],
            "little",
        )
        daddr, doff, dsize = self._locate(off)
        f = self.f
        if f.raw(daddr, 4) != b"FHDB":
            raise ValueError("bad fractal heap direct block signature")
        if not (doff <= off and off + ln <= doff + dsize):
            raise NotImplementedError(
                "fractal heap object crossing a direct-block boundary: "
                "the managed-object allocator never splits objects, so "
                "this shape is outside the subset"
            )
        return f.raw(daddr + (off - doff), ln)


def _dense_group_children(f: "_F", li: bytes) -> list[tuple[str, int]]:
    """Children of a DENSE-storage group (Link Info message 0x0002
    with a defined fractal heap address — what libhdf5 switches to
    past the compact-storage threshold of 8 links, e.g. a netCDF-4
    file with many variables under LIBVER_LATEST): enumerate the
    link-name v2 B-tree's type-5 records (name hash(4) + heap ID)
    and resolve each heap ID through the fractal heap to a
    serialized Link message. The name index iterates in hash order,
    so creation order is restored from the link messages themselves
    when tracked (netCDF-4 groups track it) and by name otherwise."""
    flags = li[1]
    p = 2 + (8 if flags & 0x01 else 0)
    fheap_addr = int.from_bytes(li[p : p + 8], "little")
    name_bt = int.from_bytes(li[p + 8 : p + 16], "little")
    if name_bt == UNDEF:
        raise NotImplementedError(
            "dense group without a link-name index B-tree: "
            "creation-order-only dense indexes are outside the subset"
        )
    heap = _FractalHeap(f, fheap_addr)
    children: list[tuple[int | None, tuple[str, int]]] = []
    for rec in _btree2_records(f, name_bt, 5):
        raw = heap.read_object(rec[4 : 4 + heap.id_len])
        corder = None
        if raw[1] & 0x04:  # creation-order field present
            q = 2 + (1 if raw[1] & 0x08 else 0)
            corder = int.from_bytes(raw[q : q + 8], "little")
        children.append((corder, _link_message(raw)))
    if children and all(c is not None for c, _ in children):
        children.sort(key=lambda t: t[0])
    else:
        children.sort(key=lambda t: t[1][0])
    return [lm for _, lm in children]


def _dense_attributes(f: "_F", ai: bytes) -> list[tuple]:
    """(name, value) pairs from DENSE attribute storage (Attribute
    Info message 0x0015 with a defined fractal heap — what libhdf5
    switches to past the 8-attribute compact threshold; a CF-complete
    netCDF-4 variable or a metadata-rich root group crosses it under
    LIBVER_LATEST). The attribute-name v2 B-tree's type-8 records
    (heap ID(8) + message flags(1) + creation order(4) + name
    hash(4)) resolve through the fractal heap to serialized v3
    attribute message bodies. Ignoring the message would silently
    DROP the attributes — including scale_factor/add_offset/
    DIMENSION_LIST, i.e. wrong data — so this decodes or raises."""
    flags = ai[1]
    p = 2 + (2 if flags & 0x01 else 0)  # max creation index is 2 bytes
    fheap_addr = int.from_bytes(ai[p : p + 8], "little")
    name_bt = int.from_bytes(ai[p + 8 : p + 16], "little")
    if fheap_addr == UNDEF:
        return []  # phase change declared but nothing stored densely
    if name_bt == UNDEF:
        raise NotImplementedError(
            "dense attribute storage without a name index B-tree: "
            "creation-order-only indexes are outside the subset"
        )
    heap = _FractalHeap(f, fheap_addr)
    if heap.id_len > 8:
        raise NotImplementedError(
            "dense attribute heap ID longer than the type-8 record field"
        )
    out = []
    for rec in _btree2_records(f, name_bt, 8):
        if rec[8] & 0x02:  # object-header message flag bit 1: shared
            raise NotImplementedError(
                "shared message in dense attribute storage"
            )
        out.append(_parse_attribute(f, heap.read_object(rec[0 : heap.id_len])))
    return out


def _object_attrs(f: "_F", msgs) -> dict:
    """All attributes of one object: inline v1/v3 attribute messages
    plus dense (fractal-heap) storage when an Attribute Info message
    points at one."""
    attrs: dict = {}
    for t, b in msgs:
        if t == 0x000C:
            k, v = _parse_attribute(f, b)
            attrs[k] = v
        elif t == 0x0015:
            for k, v in _dense_attributes(f, b):
                attrs[k] = v
    return attrs


# ------------------------------------------------------------------- groups


def _local_heap_name(f: _F, heap_addr: int, name_off: int) -> str:
    if f.raw(heap_addr, 4) != b"HEAP":
        raise ValueError("bad local heap signature")
    data_addr = f.u(heap_addr + 24, 8)
    start = data_addr + name_off
    end = f.buf.find(b"\0", start)
    if end < 0:
        raise ValueError("unterminated name in local heap")
    return f.buf[start:end].decode("utf-8")


def _group_children(f: _F, btree_addr: int, heap_addr: int) -> list[tuple[str, int]]:
    """(name, object header address) for every link in an old-style
    group, walking the v1 group B-tree down to SNOD leaves."""
    out: list[tuple[str, int]] = []

    def walk(addr: int) -> None:
        sig = f.raw(addr, 4)
        if sig == b"TREE":
            level = f.u(addr + 5, 1)
            n = f.u(addr + 6, 2)
            # keys/children: key0 child0 key1 child1 ... key_n
            p = addr + 8 + 16  # past sig/type/level/entries + siblings
            p += 8  # key0
            for _ in range(n):
                child = f.u(p, 8)
                walk(child)
                p += 16  # child + next key
            if level > 0:
                return
        elif sig == b"SNOD":
            n = f.u(addr + 6, 2)
            p = addr + 8
            for _ in range(n):
                name_off = f.u(p, 8)
                obj_addr = f.u(p + 8, 8)
                out.append((_local_heap_name(f, heap_addr, name_off), obj_addr))
                p += 40
        else:
            raise ValueError(f"bad group node signature {sig!r}")

    walk(btree_addr)
    return out


# ---------------------------------------------------------------- datatypes


def _parse_datatype(body: bytes) -> dict:
    cls = body[0] & 0x0F
    ver = body[0] >> 4
    bits0, bits8, bits16 = body[1], body[2], body[3]
    size = int.from_bytes(body[4:8], "little")
    if cls == 0:  # fixed-point
        signed = bool(bits0 & 0x08)
        if bits0 & 0x01:
            raise NotImplementedError("big-endian HDF5 integers")
        return {"cls": cls, "size": size, "dtype": np.dtype(f"<{'i' if signed else 'u'}{size}")}
    if cls == 1:  # float
        if bits0 & 0x01:
            raise NotImplementedError("big-endian HDF5 floats")
        if size not in (4, 8):
            raise NotImplementedError(f"{size}-byte HDF5 float")
        return {"cls": cls, "size": size, "dtype": np.dtype(f"<f{size}")}
    if cls == 3:  # fixed string
        return {"cls": cls, "size": size, "dtype": np.dtype(f"S{size}")}
    if cls == 7:  # reference
        return {"cls": cls, "size": size}
    if cls == 9:  # vlen
        base = _parse_datatype(body[8:])
        return {"cls": cls, "size": size, "base": base}
    raise NotImplementedError(
        f"HDF5 datatype class {cls} (version {ver}): the netCDF-4 subset "
        "covers fixed-point, float, fixed string, reference, and vlen"
    )


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    if ver == 1:
        rank, flags = body[1], body[2]
        off = 8  # version, rank, flags, 5 reserved
    elif ver == 2:
        rank, flags = body[1], body[2]
        off = 4  # version, rank, flags, type
    else:
        raise NotImplementedError(f"HDF5 dataspace version {ver}")
    dims = [
        int.from_bytes(body[off + 8 * i : off + 8 * (i + 1)], "little")
        for i in range(rank)
    ]
    return dims


# --------------------------------------------------------------- attributes


def _parse_attribute(f: _F, body: bytes):
    """-> (name, value) for v1 and v3 attribute messages."""
    ver = body[0]
    name_size = int.from_bytes(body[2:4], "little")
    dt_size = int.from_bytes(body[4:6], "little")
    ds_size = int.from_bytes(body[6:8], "little")
    if ver == 1:
        pad = lambda n: (n + 7) // 8 * 8  # noqa: E731
        off = 8
        name = body[off : off + name_size].split(b"\0")[0].decode()
        off += pad(name_size)
        dt = _parse_datatype(body[off : off + dt_size])
        off += pad(dt_size)
        dims = _parse_dataspace(body[off : off + ds_size])
        off += pad(ds_size)
    elif ver == 3:
        off = 9  # +1 name-encoding byte
        name = body[off : off + name_size].split(b"\0")[0].decode()
        off += name_size
        dt = _parse_datatype(body[off : off + dt_size])
        off += dt_size
        dims = _parse_dataspace(body[off : off + ds_size])
        off += ds_size
    else:
        raise NotImplementedError(f"HDF5 attribute message version {ver}")
    n = 1
    for d in dims:
        n *= d
    data = body[off:]
    return name, _attr_value(f, dt, dims, n, data)


def _attr_value(f: _F, dt: dict, dims: list[int], n: int, data: bytes):
    if dt["cls"] == 3:  # fixed string -> python str
        return data[: dt["size"]].split(b"\0")[0].decode("utf-8", "replace")
    if dt["cls"] == 9:  # vlen: n descriptors of (length, gheap addr, index)
        out = []
        for i in range(n):
            d = data[16 * i : 16 * (i + 1)]
            length = int.from_bytes(d[0:4], "little")
            gaddr = int.from_bytes(d[4:12], "little")
            gidx = int.from_bytes(d[12:16], "little")
            payload = _global_heap_object(f, gaddr, gidx)
            base = dt["base"]
            if base["cls"] == 7:  # references -> object header addresses
                out.append(
                    [
                        int.from_bytes(payload[8 * j : 8 * (j + 1)], "little")
                        for j in range(length)
                    ]
                )
            elif "dtype" in base:
                out.append(np.frombuffer(payload, dtype=base["dtype"], count=length))
            else:
                raise NotImplementedError("vlen of unsupported base type")
        return out
    if dt["cls"] == 7:
        return [int.from_bytes(data[8 * j : 8 * (j + 1)], "little") for j in range(n)]
    vals = np.frombuffer(data, dtype=dt["dtype"], count=n)
    return vals[0] if n == 1 else vals


def _global_heap_object(f: _F, collection_addr: int, index: int) -> bytes:
    if f.raw(collection_addr, 4) != b"GCOL":
        raise ValueError("bad global heap signature")
    size = f.u(collection_addr + 8, 8)
    p = collection_addr + 16
    end = collection_addr + size
    while p < end:
        obj_idx = f.u(p, 2)
        obj_size = f.u(p + 8, 8)
        if obj_idx == 0:  # free space terminator
            break
        if obj_idx == index:
            return f.raw(p + 16, obj_size)
        p += 16 + (obj_size + 7) // 8 * 8
    raise ValueError(f"global heap object {index} not found")


# -------------------------------------------------------------- data layout


def _read_data(f: _F, msgs: list[tuple[int, bytes]], dims: list[int], dtype) -> np.ndarray:
    layout = next(b for t, b in msgs if t == 0x0008)
    ver = layout[0]
    if ver == 4:
        return _read_data_v4(f, layout, msgs, dims, dtype)
    if ver != 3:
        raise NotImplementedError(
            f"HDF5 data layout version {ver}: versions 3 and 4 only"
        )
    cls = layout[1]
    n = 1
    for d in dims:
        n *= d
    if cls == 0:
        return _read_compact(layout[2:], dims, dtype, n)
    if cls == 1:  # contiguous
        addr = int.from_bytes(layout[2:10], "little")
        if addr == UNDEF or n == 0:
            return np.zeros(dims, dtype=dtype)
        return (
            np.frombuffer(f.raw(addr, n * dtype.itemsize), dtype=dtype, count=n)
            .reshape(dims)
            .copy()
        )
    if cls == 2:  # chunked
        ndims = layout[2]  # = rank + 1 (element-size pseudo-dim)
        btree = int.from_bytes(layout[3:11], "little")
        chunk_dims = [
            int.from_bytes(layout[11 + 4 * i : 15 + 4 * i], "little")
            for i in range(ndims - 1)
        ]
        filters = _filter_pipeline(msgs)
        out = np.zeros(dims, dtype=dtype)
        if btree != UNDEF:
            for coords, fmask, raw in _chunks(f, btree, ndims):
                # fmask bit i set = filter i was SKIPPED for this chunk
                raw = _apply_filters(raw, filters, fmask, dtype.itemsize)
                chunk = np.frombuffer(raw, dtype=dtype).reshape(chunk_dims)
                sl = tuple(
                    slice(c, min(c + cd, dims[i]))
                    for i, (c, cd) in enumerate(zip(coords, chunk_dims))
                )
                clip = tuple(
                    slice(0, sl[i].stop - sl[i].start) for i in range(len(sl))
                )
                out[sl] = chunk[clip]
        return out
    raise NotImplementedError(
        f"HDF5 data layout class {cls}: compact (0), contiguous (1) "
        "and chunked (2) only"
    )


def _read_compact(body: bytes, dims: list[int], dtype, n: int) -> np.ndarray:
    """Compact layout (class 0, v3 and v4 share the field shape):
    2-byte data size, then the raw element bytes INLINE in the object
    header message — what libhdf5 picks for tiny datasets (< 64 KiB,
    e.g. scalar/short coordinate variables) when asked. No address,
    no filters (the format forbids filtered compact data)."""
    size = int.from_bytes(body[0:2], "little")
    raw = body[2 : 2 + size]
    if len(raw) < size:
        raise ValueError("compact data layout: message shorter than its size field")
    if n == 0:
        return np.zeros(dims, dtype=dtype)
    if size < n * dtype.itemsize:
        raise ValueError(
            f"compact data layout: {size} bytes for a "
            f"{n * dtype.itemsize}-byte dataspace"
        )
    return np.frombuffer(raw, dtype=dtype, count=n).reshape(dims).copy()


def _fletcher32(data: bytes) -> int:
    """libhdf5's H5_checksum_fletcher32: Fletcher-32 over BIG-endian
    16-bit words (an odd trailing byte becomes the high byte of a
    final word), both running sums folded mod 65535, sum2 in the high
    half. The folding maps a nonzero sum that is ≡0 (mod 65535) to
    0xFFFF, never to 0 — only all-zero input checksums to 0 — so the
    modular shortcut below must preserve that. Vectorized because the
    per-chunk input is megabytes; the loop transcription lives in the
    tests as the cross-check."""
    nw = len(data) // 2
    w = np.frombuffer(data, dtype=">u2", count=nw).astype(np.uint64)
    if len(data) % 2:
        w = np.append(w, np.uint64(data[-1] << 8))
    if w.size == 0 or not w.any():
        return 0
    n = w.size
    # sum1 ≡ Σw ; sum2 ≡ Σ prefix-sums = Σ w_i·(n-i)   (mod 65535)
    m1 = int(w.sum() % 65535) or 65535
    coeff = np.arange(n, 0, -1, dtype=np.uint64) % np.uint64(65535)
    m2 = int((w * coeff % np.uint64(65535)).sum() % 65535) or 65535
    # m_k==65535 is only correct when the true sum is nonzero — given
    # some w_i>0, sum1>0 always; sum2>0 because every coeff ≥ 1
    return (m2 << 16) | m1


def _apply_filters(raw: bytes, filters, fmask: int, itemsize: int) -> bytes:
    for i, (fid, _lvl) in reversed(list(enumerate(filters))):
        if fmask & (1 << i):
            continue
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:
            raw = _unshuffle(raw, itemsize)
        elif fid == 3:
            # fletcher32: verify + strip the 4-byte little-endian
            # trailing checksum (H5Zfletcher32.c). Emitted by
            # ``nccopy -F`` and some CDS pipelines; position in the
            # pipeline varies (before or after deflate), which the
            # reversed iteration already handles.
            if len(raw) < 4:
                raise ValueError("fletcher32: chunk shorter than its checksum")
            stored = int.from_bytes(raw[-4:], "little")
            computed = _fletcher32(raw[:-4])
            if stored != computed:
                raise ValueError(
                    f"fletcher32 checksum mismatch: stored 0x{stored:08x}, "
                    f"computed 0x{computed:08x} — corrupt or pre-1.6.3-"
                    "legacy chunk"
                )
            raw = raw[:-4]
        else:
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return raw


def _read_data_v4(f: _F, layout: bytes, msgs, dims: list[int], dtype) -> np.ndarray:
    """Version-4 data layout (LIBVER_LATEST chunked datasets): all
    five chunk indexes — single-chunk (1), implicit (2), fixed-array
    (3, paged and unpaged), extensible-array (4 — one unlimited
    dimension, the appendable netCDF-4 time axis; paged AND unpaged
    data blocks, page-init bitmap from the owning super block), and
    v2 B-tree (5 — multiple unlimited dims; root-leaf AND
    multi-level, with the variable child-pointer widths derived from
    the node size the way libhdf5's H5B2 node_info math does)."""
    cls = layout[1]
    n = 1
    for d in dims:
        n *= d
    if cls == 0:  # compact: same fields as v3
        return _read_compact(layout[2:], dims, dtype, n)
    if cls == 1:  # contiguous: same fields as v3
        addr = int.from_bytes(layout[2:10], "little")
        if addr == UNDEF or n == 0:
            return np.zeros(dims, dtype=dtype)
        return (
            np.frombuffer(f.raw(addr, n * dtype.itemsize), dtype=dtype, count=n)
            .reshape(dims)
            .copy()
        )
    if cls != 2:
        raise NotImplementedError(f"HDF5 v4 layout class {cls}")
    flags = layout[2]
    ndims = layout[3]  # rank + 1 (element-size pseudo-dim)
    enc = layout[4]  # bytes per encoded chunk-dim size
    p = 5
    chunk_dims = [
        int.from_bytes(layout[p + enc * i : p + enc * (i + 1)], "little")
        for i in range(ndims)
    ][: ndims - 1]
    p += enc * ndims
    index_type = layout[p]
    p += 1
    filters = _filter_pipeline(msgs)
    filtered = bool(filters)
    out = np.zeros(dims, dtype=dtype)
    grid = [
        (dims[i] + chunk_dims[i] - 1) // chunk_dims[i] for i in range(len(chunk_dims))
    ]
    n_chunks = 1
    for g in grid:
        n_chunks *= g

    def place(idx: int, raw: bytes, fmask: int) -> None:
        raw = _apply_filters(raw, filters, fmask, dtype.itemsize)
        chunk = np.frombuffer(raw, dtype=dtype).reshape(chunk_dims)
        coords = []
        rem = idx
        for g in reversed(grid):
            coords.append(rem % g)
            rem //= g
        coords = [c * cd for c, cd in zip(reversed(coords), chunk_dims)]
        sl = tuple(
            slice(c, min(c + cd, dims[i]))
            for i, (c, cd) in enumerate(zip(coords, chunk_dims))
        )
        clip = tuple(slice(0, s.stop - s.start) for s in sl)
        out[sl] = chunk[clip]

    if index_type == 1:  # single chunk
        if flags & 0x02:  # filtered single chunk: size + mask in layout
            csize = int.from_bytes(layout[p : p + 8], "little")
            fmask = int.from_bytes(layout[p + 8 : p + 12], "little")
            p += 12
        else:
            csize = dtype.itemsize
            for cd in chunk_dims:
                csize *= cd
            fmask = 0
        addr = int.from_bytes(layout[p : p + 8], "little")
        if addr != UNDEF:
            place(0, f.raw(addr, csize), fmask)
        return out
    if index_type == 2:  # implicit: unfiltered chunks back to back
        addr = int.from_bytes(layout[p : p + 8], "little")
        nbytes = dtype.itemsize
        for cd in chunk_dims:
            nbytes *= cd
        if addr != UNDEF:
            for i in range(n_chunks):
                place(i, f.raw(addr + i * nbytes, nbytes), 0)
        return out
    if index_type == 3:  # fixed array
        # layout carries page-bits(1) then the FAHD header address
        addr = int.from_bytes(layout[p + 1 : p + 9], "little")
        if addr == UNDEF:
            return out
        if f.raw(addr, 4) != b"FAHD":
            raise ValueError("bad fixed-array header signature")
        client = f.u(addr + 5, 1)
        entry_size = f.u(addr + 6, 1)
        page_bits = f.u(addr + 7, 1)
        n_entries = f.u(addr + 8, 8)
        dblock = f.u(addr + 16, 8)
        if f.raw(dblock, 4) != b"FADB":
            raise ValueError("bad fixed-array data block signature")
        page_nelmts = 1 << page_bits
        if n_entries > page_nelmts:
            # Paged data block (very large chunk grids — 100-TB-scale
            # ERA5 archives land here). FADB prefix becomes sig(4)
            # version(1) client(1) header address(8) + page bitmap
            # (one bit per page, MSB-first within each byte the way
            # libhdf5's H5VM_bit_set writes it — bit 0 is the HIGH
            # bit of byte 0, 0x80 >> (bit % 8); set = initialized) +
            # checksum(4); the element pages follow at a FIXED stride
            # of page_nelmts*entry_size + 4 (per-page checksum), the
            # stride libhdf5 uses for page addressing even when the
            # last page holds fewer elements.
            npages = (int(n_entries) + page_nelmts - 1) // page_nelmts
            bitmap = f.raw(dblock + 14, (npages + 7) // 8)
            page0 = dblock + 14 + len(bitmap) + 4
            page_stride = page_nelmts * entry_size + 4

            def elem_bytes(i: int) -> bytes | None:
                pg, j = divmod(i, page_nelmts)
                if not (bitmap[pg // 8] >> (7 - pg % 8)) & 1:
                    return None  # uninitialized page: chunks unwritten
                return f.raw(page0 + pg * page_stride + j * entry_size, entry_size)

        else:
            # FADB: sig(4) version(1) client(1) header address(8),
            # then elements inline (unpaged when all entries fit one
            # page)
            ep = dblock + 14

            def elem_bytes(i: int) -> bytes | None:
                return f.raw(ep + i * entry_size, entry_size)

        nbytes = dtype.itemsize
        for cd in chunk_dims:
            nbytes *= cd
        for i in range(int(n_entries)):
            e = elem_bytes(i)
            if e is None:
                continue
            caddr = int.from_bytes(e[0:8], "little")
            if caddr == UNDEF:
                continue
            if client == 0:  # non-filtered: element = address only
                place(i, f.raw(caddr, nbytes), 0)
            else:  # filtered: address + chunk size + filter mask(4)
                size_len = entry_size - 12
                csize = int.from_bytes(e[8 : 8 + size_len], "little")
                fmask = int.from_bytes(e[8 + size_len : entry_size], "little")
                place(i, f.raw(caddr, csize), fmask)
        return out
    if index_type == 4:  # extensible array (ONE unlimited dimension)
        # The layout message carries the 5 creation parameters then
        # the EAHD address (spec IV.A.2.i "Extensible Array Index");
        # the header repeats the parameters, which we treat as
        # authoritative. This is the index the HDF5 library picks for
        # a dataset with a single unlimited dimension — i.e. every
        # netCDF-4 record variable with an appendable time axis.
        addr = int.from_bytes(layout[p + 5 : p + 13], "little")
        if addr == UNDEF:
            return out
        if f.raw(addr, 4) != b"EAHD":
            raise ValueError("bad extensible-array header signature")
        client = f.u(addr + 5, 1)
        elmt_size = f.u(addr + 6, 1)
        max_nelmts_bits = f.u(addr + 7, 1)
        idx_blk_elmts = f.u(addr + 8, 1)
        data_blk_min_elmts = f.u(addr + 9, 1)
        sup_blk_min_ptrs = f.u(addr + 10, 1)
        page_nelmts = 1 << f.u(addr + 11, 1)
        # 6 length-sized statistics fields precede the index block addr
        iblk_addr = f.u(addr + 12 + 6 * 8, 8)
        if iblk_addr == UNDEF:
            return out
        # Super-block geometry (H5EA design, public HDF5 source):
        # super block u holds 2^(u/2) data blocks of
        # 2^((u+1)/2) * data_blk_min_elmts elements each; the index
        # block directly addresses the data blocks of the first
        # 2*log2(sup_blk_min_ptrs) super blocks — exactly
        # 2*(sup_blk_min_ptrs - 1) of them.
        nsblks = 1 + (max_nelmts_bits - (data_blk_min_elmts.bit_length() - 1)) // 2
        sblk_ndblks = [1 << (u // 2) for u in range(nsblks)]
        sblk_nelmts = [
            (1 << ((u + 1) // 2)) * data_blk_min_elmts for u in range(nsblks)
        ]
        sblk_start_idx, sblk_start_dblk = [], []
        si = sd = 0
        for u in range(nsblks):
            sblk_start_idx.append(si)
            sblk_start_dblk.append(sd)
            si += sblk_ndblks[u] * sblk_nelmts[u]
            sd += sblk_ndblks[u]
        iblk_nsblks = 2 * (sup_blk_min_ptrs.bit_length() - 1)
        ndblk_addrs = 2 * (sup_blk_min_ptrs - 1)
        arr_off_size = (max_nelmts_bits + 7) // 8
        if f.raw(iblk_addr, 4) != b"EAIB":
            raise ValueError("bad extensible-array index block signature")
        q = iblk_addr + 14  # sig(4) version(1) client(1) header addr(8)
        iblk_elems = [
            f.raw(q + i * elmt_size, elmt_size) for i in range(idx_blk_elmts)
        ]
        q += idx_blk_elmts * elmt_size
        dblk_addrs = [f.u(q + i * 8, 8) for i in range(ndblk_addrs)]
        q += ndblk_addrs * 8
        sblk_addrs = [f.u(q + i * 8, 8) for i in range(nsblks - iblk_nsblks)]
        nbytes = dtype.itemsize
        for cd in chunk_dims:
            nbytes *= cd

        def read_elem(e: bytes):
            caddr = int.from_bytes(e[0:8], "little")
            if caddr == UNDEF:
                return None
            if client == 0:  # non-filtered: element = address only
                return caddr, nbytes, 0
            size_len = elmt_size - 12  # address(8) + size + mask(4)
            csize = int.from_bytes(e[8 : 8 + size_len], "little")
            fmask = int.from_bytes(e[8 + size_len : elmt_size], "little")
            return caddr, csize, fmask

        dblk_base: dict[int, int] = {}
        # daddr -> page-init bits for PAGED data blocks (npages-bit
        # int, LSB = page 0), sliced out of the owning super block's
        # page bitmap when the super block is loaded below.
        dblk_page_init: dict[int, int] = {}
        UNSET_ELEM = b"\xff" * 8 + b"\x00" * (elmt_size - 8)

        def dblock_elem(daddr: int, dblk_nelmts: int, j: int) -> bytes:
            paged = dblk_nelmts > page_nelmts
            base = dblk_base.get(daddr)
            if base is None:
                if f.raw(daddr, 4) != b"EADB":
                    raise ValueError(
                        "bad extensible-array data block signature"
                    )
                if paged and daddr not in dblk_page_init:
                    raise NotImplementedError(
                        "paged extensible-array data block addressed "
                        "directly from the index block: only super "
                        "blocks carry a page-init bitmap, and libhdf5's "
                        "creation parameters keep index-block rows far "
                        "below the page threshold"
                    )
                # prefix = sig(4) version(1) client(1) header addr(8)
                # + block offset; a PAGED block stores no elements
                # inline — its 4-byte prefix checksum follows, then
                # the data block pages (spec III.E), each page =
                # page_nelmts * elmt_size + 4-byte page checksum.
                base = daddr + 14 + arr_off_size + (4 if paged else 0)
                dblk_base[daddr] = base
            if not paged:
                return f.raw(base + j * elmt_size, elmt_size)
            pg, j2 = divmod(j, page_nelmts)
            if not (dblk_page_init[daddr] >> pg) & 1:
                return UNSET_ELEM  # uninitialized page: chunks unwritten
            page_stride = page_nelmts * elmt_size + 4
            return f.raw(base + pg * page_stride + j2 * elmt_size, elmt_size)

        sblk_dblks: dict[int, list[int]] = {}

        def sblock_dblk_addr(u: int, k: int) -> int:
            saddr = sblk_addrs[u - iblk_nsblks]
            if saddr == UNDEF:
                return UNDEF
            lst = sblk_dblks.get(saddr)
            if lst is None:
                if f.raw(saddr, 4) != b"EASB":
                    raise ValueError(
                        "bad extensible-array super block signature"
                    )
                base = saddr + 14 + arr_off_size
                npages = 0
                if sblk_nelmts[u] > page_nelmts:
                    # PAGED data blocks: the super block carries the
                    # page-init bitmap (1 bit per page per data
                    # block, dblk-major, MSB-first within each byte —
                    # libhdf5 H5VM_bit_set, bit 0 = high bit of byte
                    # 0) between its block offset and the data block
                    # addresses. sblk element counts are power-of-two
                    # multiples of page_nelmts, so pages divide
                    # evenly.
                    npages = sblk_nelmts[u] // page_nelmts
                    nbits = sblk_ndblks[u] * npages
                    bm = f.raw(base, (nbits + 7) // 8)
                    base += len(bm)
                lst = [f.u(base + i * 8, 8) for i in range(sblk_ndblks[u])]
                sblk_dblks[saddr] = lst
                if npages:
                    for i, a in enumerate(lst):
                        if a == UNDEF:
                            continue
                        bits = 0
                        for pg in range(npages):
                            bit = i * npages + pg
                            bits |= ((bm[bit // 8] >> (7 - bit % 8)) & 1) << pg
                        dblk_page_init[a] = bits
            return lst[k]

        for i in range(n_chunks):
            if i < idx_blk_elmts:
                e = iblk_elems[i]
            else:
                idx = i - idx_blk_elmts
                # sblk index = floor(log2(idx/min_elmts + 1))
                u = ((idx // data_blk_min_elmts) + 1).bit_length() - 1
                if u >= nsblks:
                    raise ValueError(
                        f"chunk {i} addresses super block {u} beyond the "
                        f"extensible array's declared capacity ({nsblks} "
                        "super blocks) — malformed header"
                    )
                k, j = divmod(idx - sblk_start_idx[u], sblk_nelmts[u])
                if u < iblk_nsblks:
                    daddr = dblk_addrs[sblk_start_dblk[u] + k]
                else:
                    daddr = sblock_dblk_addr(u, k)
                if daddr == UNDEF:
                    continue
                e = dblock_elem(daddr, sblk_nelmts[u], j)
            r = read_elem(e)
            if r is None:
                continue
            caddr, csize, fmask = r
            place(i, f.raw(caddr, csize), fmask)
        return out
    if index_type == 5:  # version-2 B-tree (2+ unlimited dimensions)
        # Layout carries node size(4) + split%(1) + merge%(1) then the
        # BTHD address. Record types: 10 = non-filtered chunks
        # (address + scaled offsets), 11 = filtered chunks (address +
        # variable-width chunk size + 4-byte filter mask + scaled
        # offsets); scaled offset = chunk coordinate / chunk dim, one
        # 8-byte word per dataset rank. Both root-leaf trees and
        # multi-level trees decode; the variable child-pointer widths
        # in internal nodes are derived from the header's node size
        # exactly as libhdf5 derives them (H5B2hdr node_info math):
        #   leaf_max      = (node_size - prefix 10) / record_size
        #   max_nrec_size = bytes to encode leaf_max
        #   ptr(d)        = addr 8 + max_nrec_size
        #                   + (cum_nrec_size(d-1) if d > 1 else 0)
        #   int_max(d)    = (node_size - 10 - ptr(d))
        #                   / (record_size + ptr(d))
        #   cum_max(d)    = (int_max(d)+1) * cum_max(d-1) + int_max(d)
        # where prefix 10 = sig(4)+version(1)+type(1)+checksum(4).
        addr = int.from_bytes(layout[p + 6 : p + 14], "little")
        if addr == UNDEF:
            return out
        if f.raw(addr, 4) != b"BTHD":
            raise ValueError("bad v2 B-tree header signature")
        rec_type = f.u(addr + 5, 1)
        if rec_type not in (10, 11):
            raise ValueError(f"v2 B-tree record type {rec_type} is not a chunk index")
        node_size = f.u(addr + 6, 4)
        record_size = f.u(addr + 10, 2)
        depth = f.u(addr + 12, 2)
        root_addr = f.u(addr + 16, 8)
        root_nrec = f.u(addr + 24, 2)
        if root_addr == UNDEF or root_nrec == 0:
            return out
        rank = len(chunk_dims)
        min_rec = (8 + rank * 8) if rec_type == 10 else (13 + rank * 8)
        if record_size < min_rec:
            raise ValueError(
                f"v2 B-tree chunk record size {record_size} is smaller than "
                f"the type-{rec_type} minimum {min_rec} for rank {rank}"
            )
        strides = [1] * rank  # row-major linear chunk index
        for d in range(rank - 2, -1, -1):
            strides[d] = strides[d + 1] * grid[d + 1]
        nbytes = dtype.itemsize
        for cd in chunk_dims:
            nbytes *= cd

        def emit(rec: bytes) -> None:
            caddr = int.from_bytes(rec[0:8], "little")
            if rec_type == 10:
                csize, fmask, off = nbytes, 0, 8
            else:
                size_len = record_size - 8 - 4 - rank * 8
                csize = int.from_bytes(rec[8 : 8 + size_len], "little")
                fmask = int.from_bytes(rec[8 + size_len : 12 + size_len], "little")
                off = 12 + size_len
            coords = [
                int.from_bytes(rec[off + 8 * d : off + 8 * (d + 1)], "little")
                for d in range(rank)
            ]
            if caddr == UNDEF:
                return
            idx = sum(c * s for c, s in zip(coords, strides))
            place(idx, f.raw(caddr, csize), fmask)

        # node_info math (sizes of the per-depth child-pointer fields)
        leaf_max = (node_size - 10) // record_size
        if leaf_max < 1:
            raise ValueError(
                f"v2 B-tree node size {node_size} cannot hold one "
                f"record of size {record_size}"
            )
        max_nrec_size = (leaf_max.bit_length() - 1) // 8 + 1
        cum_max = leaf_max
        cum_size = [0]  # cum_size[d] = bytes encoding a depth-d subtree total
        for d in range(1, depth + 1):
            ptr = 8 + max_nrec_size + cum_size[d - 1]
            int_max = (node_size - 10 - ptr) // (record_size + ptr)
            if int_max < 1:
                raise ValueError(
                    f"v2 B-tree node size {node_size} cannot hold an "
                    f"internal record+pointer at depth {d}"
                )
            cum_max = (int_max + 1) * cum_max + int_max
            cum_size.append((cum_max.bit_length() - 1) // 8 + 1)

        def walk(naddr: int, nrec: int, d: int) -> None:
            if d == 0:
                if f.raw(naddr, 4) != b"BTLF":
                    raise ValueError("bad v2 B-tree leaf signature")
                rp = naddr + 6  # sig(4) version(1) type(1)
                for _ in range(nrec):
                    emit(f.raw(rp, record_size))
                    rp += record_size
                return
            if f.raw(naddr, 4) != b"BTIN":
                raise ValueError("bad v2 B-tree internal node signature")
            rp = naddr + 6
            for _ in range(nrec):
                emit(f.raw(rp, record_size))
                rp += record_size
            # nrec+1 child pointers: address(8) + child nrec
            # (max_nrec_size) + child-subtree total (cum_size[d-1],
            # present only when the children are themselves internal)
            tot_size = cum_size[d - 1] if d > 1 else 0
            for _ in range(nrec + 1):
                caddr = f.u(rp, 8)
                cnrec = f.u(rp + 8, max_nrec_size)
                rp += 8 + max_nrec_size + tot_size
                walk(caddr, cnrec, d - 1)

        walk(root_addr, root_nrec, depth)
        return out
    raise NotImplementedError(
        f"HDF5 v4 chunk index type {index_type}: all five chunk index "
        "types decode (single-chunk, implicit, fixed-array, "
        "extensible-array, root-leaf v2 B-tree); unknown/newer index "
        f"type {index_type} routes to the xarray seam"
    )


def _filter_pipeline(msgs) -> list[tuple[int, int]]:
    body = next((b for t, b in msgs if t == 0x000B), None)
    if body is None:
        return []
    ver, nf = body[0], body[1]
    if ver not in (1, 2):
        raise NotImplementedError(f"HDF5 filter pipeline version {ver}")
    out = []
    p = 8 if ver == 1 else 2  # v1 has 6 reserved bytes after nfilters
    for _ in range(nf):
        fid = int.from_bytes(body[p : p + 2], "little")
        p += 2
        # v2 drops the name-length field for built-in filters (<256)
        if ver == 1 or fid >= 256:
            name_len = int.from_bytes(body[p : p + 2], "little")
            p += 2
        else:
            name_len = 0
        ncv = int.from_bytes(body[p + 2 : p + 4], "little")
        p += 4 + name_len
        level = int.from_bytes(body[p : p + 4], "little") if ncv else 0
        p += 4 * ncv
        if ver == 1 and ncv % 2:
            p += 4  # v1 pads client values to an even count
        out.append((fid, level))
    return out


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    n = len(raw) // itemsize
    a = np.frombuffer(raw, dtype=np.uint8).reshape(itemsize, n)
    return a.T.tobytes()


def _chunks(f: _F, btree_addr: int, ndims: int):
    """Yield (chunk start coords, raw bytes) from a v1 chunk B-tree."""
    sig = f.raw(btree_addr, 4)
    if sig != b"TREE":
        raise ValueError(f"bad chunk B-tree signature {sig!r}")
    node_type = f.u(btree_addr + 4, 1)
    if node_type != 1:
        raise ValueError("chunk B-tree node type must be 1")
    level = f.u(btree_addr + 5, 1)
    n = f.u(btree_addr + 6, 2)
    key_size = 8 + 8 * ndims  # chunk size(4) + filter mask(4) + offsets
    p = btree_addr + 24  # past sig/type/level/entries + 2 siblings
    for _ in range(n):
        chunk_bytes = f.u(p, 4)
        fmask = f.u(p + 4, 4)
        coords = [f.u(p + 8 + 8 * i, 8) for i in range(ndims - 1)]
        child = f.u(p + key_size, 8)
        if level > 0:
            yield from _chunks(f, child, ndims)
        else:
            yield coords, fmask, f.raw(child, chunk_bytes)
        p += key_size + 8


# ---------------------------------------------------------- netCDF-4 layer

_NC_DIM_SENTINEL = "This is a netCDF dimension but not a netCDF variable"


def parse_netcdf4(buf: bytes):
    """-> (dims, global_attrs, varlist) in netcdf_classic's shapes."""
    f = _F(buf)
    sb = _superblock(f)
    root_msgs = _messages(f, sb["root_header"])
    st = next((b for t, b in root_msgs if t == 0x0011), None)
    if st is not None:
        # old-style group: symbol-table message -> B-tree + local heap
        btree = int.from_bytes(st[0:8], "little")
        heap = int.from_bytes(st[8:16], "little")
        children = _group_children(f, btree, heap)
    else:
        # new-style group (LIBVER_LATEST): COMPACT storage keeps one
        # Link message per member inline; DENSE storage (signalled
        # by a defined fractal heap address in Link Info) moves the
        # serialized link messages into a fractal heap indexed by a
        # link-name v2 B-tree — what libhdf5 switches to past the
        # 8-link compact threshold, i.e. any netCDF-4 file with more
        # than a handful of variables under LIBVER_LATEST.
        li = next((b for t, b in root_msgs if t == 0x0002), None)
        children = None
        if li is not None:
            flags = li[1]
            p = 2 + (8 if flags & 0x01 else 0)
            fheap = int.from_bytes(li[p : p + 8], "little")
            if fheap != UNDEF:
                children = _dense_group_children(f, li)
        if children is None:
            children = [_link_message(b) for t, b in root_msgs if t == 0x0006]
        if not children:
            raise NotImplementedError(
                "HDF5 root group has neither a symbol-table message "
                "nor link messages"
            )
    gattrs = _object_attrs(f, root_msgs)
    objects = {}
    for name, addr in children:
        msgs = _messages(f, addr)
        attrs = _object_attrs(f, msgs)
        dt_body = next((b for t, b in msgs if t == 0x0003), None)
        ds_body = next((b for t, b in msgs if t == 0x0001), None)
        if dt_body is None or ds_body is None:
            if any(t in (0x0011, 0x0002, 0x0006) for t, _ in msgs):
                # a GROUP child: silently skipping it would drop every
                # variable under it — loud seam, not silent data loss.
                # (Flat classic-model files — all real ERA5 exports —
                # have no sub-groups; hierarchical files fall back to
                # the xarray seam via ingest.)
                raise NotImplementedError(
                    f"sub-group {name!r}: hierarchical netCDF-4 groups "
                    "are outside the flat classic-model subset"
                )
            # named datatype / other metadata object: carries no data,
            # safe to skip (variables USING an exotic type still fail
            # loudly in the datatype parser)
            continue
        dt = _parse_datatype(dt_body)
        shape = _parse_dataspace(ds_body)
        objects[addr] = {
            "name": name,
            "attrs": attrs,
            "dt": dt,
            "shape": shape,
            "msgs": msgs,
        }

    # Dimensions: CLASS == DIMENSION_SCALE, ordered by _Netcdf4Dimid
    # when present (else file order).
    dim_objs = [
        (addr, o)
        for addr, o in objects.items()
        if o["attrs"].get("CLASS") == "DIMENSION_SCALE"
    ]
    dim_objs.sort(
        key=lambda ao: (
            int(ao[1]["attrs"].get("_Netcdf4Dimid", 2**31)),
            ao[1]["name"],
        )
    )
    dims: list[tuple[str, int]] = []
    dim_index: dict[int, int] = {}  # object header addr -> dim id
    varlist: list[_Var] = []
    for addr, o in dim_objs:
        dim_index[addr] = len(dims)
        dims.append((o["name"], o["shape"][0] if o["shape"] else 1))
        is_pure = _NC_DIM_SENTINEL in str(o["attrs"].get("NAME", ""))
        if not is_pure and "dtype" in o["dt"]:
            # coordinate variable: the scale carries real values
            data = _read_data(f, o["msgs"], o["shape"], o["dt"]["dtype"])
            varlist.append(
                _Var(o["name"], [dim_index[addr]], o["attrs"], _nc_type_of(o["dt"]), 0, 0, data=data)
            )

    for addr, o in objects.items():
        if addr in dim_index:
            continue
        dl = o["attrs"].get("DIMENSION_LIST")
        if dl is None:
            if len(o["shape"]) == 0:
                dimids: list[int] = []
            else:
                raise NotImplementedError(
                    f"dataset {o['name']!r} has no DIMENSION_LIST: plain "
                    "HDF5 (non-netCDF-4) files are outside the subset"
                )
        else:
            dimids = []
            for refs in dl:  # one vlen element (ref list) per axis
                ref = refs[0] if isinstance(refs, list) else int(refs)
                if ref not in dim_index:
                    raise ValueError(
                        f"dataset {o['name']!r} references a non-dimension object"
                    )
                dimids.append(dim_index[ref])
        if "dtype" not in o["dt"]:
            raise NotImplementedError(
                f"dataset {o['name']!r} has a non-scalar datatype class"
            )
        data = _read_data(f, o["msgs"], o["shape"], o["dt"]["dtype"])
        varlist.append(
            _Var(o["name"], dimids, o["attrs"], _nc_type_of(o["dt"]), 0, 0, data=data)
        )
    return dims, gattrs, varlist


def _nc_type_of(dt: dict) -> int:
    # assemble_dataframe only branches on char (2) vs numeric; HDF5
    # fixed strings behave like classic char arrays after a byte view.
    return 2 if dt["cls"] == 3 else 6


def decode_netcdf4_bytes(buf: bytes) -> pd.DataFrame:
    """bytes (HDF5/netCDF-4) -> the same xarray-shaped frame as
    netcdf_classic.decode_netcdf_bytes."""
    dims, _gattrs, varlist = parse_netcdf4(buf)
    for v in varlist:
        if v.nc_type == 2 and v.data.dtype.kind == "S":
            # fixed S-strings -> an extra char axis so the shared
            # char-to-str path (last dim = string length) applies
            w = v.data.dtype.itemsize
            v.data = v.data.view("S1").reshape(*v.data.shape, w)
            v.dimids = list(v.dimids) + [len(dims)]
            dims = dims + [(f"__strlen_{v.name}", w)]
    return assemble_dataframe(dims, varlist)
