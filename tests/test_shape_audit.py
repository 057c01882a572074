"""The HDF5 shape-audit instrument (scripts/hdf5_shape_audit.py,
VERDICT r13 ask #2) must keep classifying containers and reading
structural facts correctly — it is the committed evidence tool for
the next implement-or-bound call, so it gets its own regression
coverage like any operator."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from hdf5_shape_audit import audit_hdf5, audit_lfs_pointer, classify
from test_hdf5_min import build_nc4


def test_classify_containers():
    stub = (
        b"version https://git-lfs.github.com/spec/v1\n"
        b"oid sha256:" + b"0" * 64 + b"\nsize 370011193\n"
    )
    assert classify(stub)[0] == "git-lfs-pointer"
    assert audit_lfs_pointer(stub)["lfs"]["size"] == "370011193"
    assert classify(b"CDF\x01" + b"\0" * 16)[0] == "netcdf-classic-cdf1"
    assert classify(build_nc4()) == ("hdf5", 0)
    assert classify(b"not a known container")[0] == "unknown"


def test_audit_reads_structural_facts():
    rec = audit_hdf5(
        build_nc4(chunked_t2m=True, shuffle=True, fletcher="post"), deep=True
    )
    assert rec["superblock_version"] == 0
    assert rec["root_header"] == "v1"
    assert rec["root_group_storage"] == "symbol-table"
    assert rec["outside_subset"] == []
    t2m = next(d for d in rec["datasets"] if d["name"] == "t2m")
    assert t2m["layout_version"] == 3
    assert t2m["layout_class"] == "chunked"
    assert t2m["chunk_index"] == "btree-v1"
    assert t2m["filters"] == ["shuffle", "deflate", "fletcher32"]
    assert t2m["datatype"] == "fixed-point"
    assert rec["deep_decode"].startswith("ok:")


def test_audit_reads_v4_index_kinds():
    rng = np.random.RandomState(11)
    t2m = rng.randint(-2000, 2000, size=(14, 2, 3)).astype("<i2")
    rec = audit_hdf5(build_nc4(modern=True, layout4="fixed_paged", t2m=t2m))
    assert rec["superblock_version"] == 2
    assert rec["root_header"] == "OHDR-v2"
    t2m_d = next(d for d in rec["datasets"] if d["name"] == "t2m")
    assert t2m_d["layout_version"] == 4
    assert t2m_d["chunk_index"] == "fixed-array"


def test_audit_flags_outside_subset_features():
    """A filter id outside {deflate, shuffle, fletcher32} must be
    FLAGGED by the inventory (not crash it): patch the fixture's
    pipeline message to claim szip (id 4)."""
    buf = bytearray(build_nc4(chunked_t2m=True))
    # filter pipeline v1 message body: ver(1) nf(1) pad(6) then
    # fid(2) — locate it via the deflate id right after the 6-pad
    sig = bytes([1, 1, 0, 0, 0, 0, 0, 0, 1, 0])
    i = bytes(buf).find(sig)
    assert i > 0, "fixture pipeline message not found"
    buf[i + 8] = 4  # deflate -> szip
    rec = audit_hdf5(bytes(buf))
    assert any("filter szip" in o for o in rec["outside_subset"]), rec
