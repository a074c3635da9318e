"""ZIP archive pins (functions/zip_stream — r11, PKWARE APPNOTE).
CPython's ``zipfile`` is the independent reference in both
directions; EOCD comment scanning, CRC tampering, cross-check
failures, and unsupported-feature rejection are pinned by hand."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from data_warehouse_migration_spark.functions.zip_stream import (
    zip_members,
    zip_pack,
)

MEMBERS = [
    ("a.txt", b"hello zip " * 50),
    ("dir/b.bin", bytes(range(256)) * 4),
    ("empty", b""),
]


@pytest.mark.parametrize("method", ["stored", "fixed", "dynamic"])
def test_ours_read_by_stdlib(method):
    blob = zip_pack(MEMBERS, method)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS
    assert zf.testzip() is None  # stdlib's own CRC sweep


@pytest.mark.parametrize(
    "comp", [zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED]
)
def test_stdlib_read_by_ours(comp):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", comp) as w:
        for name, data in MEMBERS:
            w.writestr(name, data)
    assert zip_members(buf.getvalue()) == MEMBERS


def test_roundtrip_and_determinism():
    blob = zip_pack(MEMBERS, "dynamic")
    assert zip_members(blob) == MEMBERS
    assert blob == zip_pack(MEMBERS, "dynamic")


def test_stored_length_formula():
    # the gate's closed form: Σ(30+nlen+size) + Σ(46+nlen) + 22
    blob = zip_pack(MEMBERS, "stored")
    nlens = sum(len(n.encode()) for n, _ in MEMBERS)
    sizes = sum(len(d) for _, d in MEMBERS)
    assert len(blob) == 3 * 30 + nlens + sizes + 3 * 46 + nlens + 22


def test_archive_comment_scanned_past():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as w:
        w.writestr("x", b"y")
        w.comment = b"comment with PK\x05\x06 inside"  # adversarial
    assert zip_members(buf.getvalue()) == [("x", b"y")]


def test_crc_tamper_detected():
    blob = bytearray(zip_pack([("f", b"payload-bytes")], "stored"))
    at = blob.index(b"payload-bytes")
    blob[at] ^= 1
    with pytest.raises(ValueError, match="CRC-32"):
        zip_members(bytes(blob))


def test_missing_eocd_and_bad_local_header():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        zip_members(b"not a zip at all")
    blob = bytearray(zip_pack([("f", b"d")], "stored"))
    blob[0] = 0  # corrupt the local signature; central still points there
    with pytest.raises(ValueError, match="local header"):
        zip_members(bytes(blob))


def test_unsupported_features_rejected():
    # hand-flip the encryption bit in the central directory entry
    blob = bytearray(zip_pack([("f", b"d")], "stored"))
    at = blob.index(b"PK\x01\x02")
    flags_at = at + 8
    blob[flags_at] |= 0x1
    with pytest.raises(ValueError, match="encrypted"):
        zip_members(bytes(blob))
    # data-descriptor flag (bit 3) is FINE via the central directory
    blob[flags_at] = 0x8
    assert zip_members(bytes(blob)) == [("f", b"d")]
    # unknown compression method
    blob2 = bytearray(zip_pack([("f", b"d")], "stored"))
    at2 = blob2.index(b"PK\x01\x02")
    struct.pack_into("<H", blob2, at2 + 10, 99)
    with pytest.raises(ValueError, match="method 99"):
        zip_members(bytes(blob2))


REAL_JARS = [
    # Java jars are zips written by streaming writers (data
    # descriptors, deflate) — real-world interop pins
    "/opt/spark/jars/spire-platform_2.13-0.18.0.jar",
    "/opt/spark/jars/netty-codec-4.2.7.Final.jar",
]


@pytest.mark.parametrize("path", REAL_JARS)
def test_real_world_jars(path):
    import os

    if not os.path.exists(path):
        pytest.skip(f"{path} not in this container")
    data = open(path, "rb").read()
    ours = dict(zip_members(data))
    zf = zipfile.ZipFile(io.BytesIO(data))
    theirs = {i.filename: zf.read(i) for i in zf.infolist()}
    assert set(theirs) <= set(ours)
    for name, payload in theirs.items():
        assert ours[name] == payload, name


def test_utf8_names():
    members = [("日本語/файл.txt", b"x")]
    blob = zip_pack(members, "stored")
    assert zip_members(blob) == members
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.namelist() == [members[0][0]]


def test_zip64_both_directions_adjudicated_by_stdlib():
    """ZIP64 (r14, NEW SIBLINGS — the attested classic reader keeps
    its honest-raise contract): `zip_pack64` forces the >4 GiB
    layout (saturated fields, 0x0001 extras, ZIP64 EOCD record +
    locator) so the structures are testable without 4 GiB fixtures;
    `zip_members64` reads classic AND zip64 archives through the
    central-directory authority. CPython zipfile adjudicates both
    directions."""
    import io
    import struct
    import zipfile

    import pytest

    from data_warehouse_migration_spark.functions.zip_stream import (
        zip_members,
        zip_members64,
        zip_pack,
        zip_pack64,
    )

    members = [
        ("a.txt", b"hello zip64 " * 100),
        ("dir/b.bin", bytes(range(256)) * 10),
        ("c", b""),
    ]
    for method in ("dynamic", "stored", "fixed"):
        blob = zip_pack64(members, method=method)
        assert zip_members64(blob) == members, method
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
    # the classic reader refuses the sentinels rather than misreading
    with pytest.raises(ValueError):
        zip_members(zip_pack64(members))
    # stdlib's forced-zip64 output reads back through the new reader
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, d in members:
            with w.open(zipfile.ZipInfo(n), "w", force_zip64=True) as f:
                f.write(d)
    assert zip_members64(buf.getvalue()) == members
    # classic archives read identically through the new reader
    assert zip_members64(zip_pack(members)) == members
    # hostile: sentinel fields with no locator / truncated z64 EOCD
    blob = bytearray(zip_pack64(members))
    no_loc = blob[: len(blob) - 42] + blob[len(blob) - 22 :]
    with pytest.raises(ValueError, match="locator|signature|missing"):
        zip_members64(bytes(no_loc))
    bad = bytearray(zip_pack64(members))
    struct.pack_into("<Q", bad, len(bad) - 38, 1 << 40)  # locator offset
    with pytest.raises(ValueError, match="ZIP64|missing"):
        zip_members64(bytes(bad))
    # absurd entry count bounded before the walk
    bad2 = bytearray(zip_pack64(members))
    # n_entries lives in the z64 EOCD record (offsets from its start)
    z64_off = len(bad2) - 22 - 20 - 56
    assert bytes(bad2[z64_off : z64_off + 4]) == b"PK\x06\x06"
    struct.pack_into("<Q", bad2, z64_off + 4 + 20 + 8, 1 << 50)
    with pytest.raises(ValueError):
        zip_members64(bytes(bad2))


def test_classic_65535_entries_not_mistaken_for_zip64():
    """ADVICE r14: the 0xFFFF EOCD entry count has ZIP64 meaning only
    when the locator/extra is present — a real 65535-entry classic
    archive is legal per APPNOTE, so zip_members64 walks the central
    directory's declared span instead of raising."""
    from data_warehouse_migration_spark.functions.zip_stream import (
        zip_members64,
    )

    members = [(f"{i:05d}", b"") for i in range(65535)]
    blob = zip_pack(members, "stored")
    back = zip_members64(blob)
    assert len(back) == 65535
    assert back[0] == ("00000", b"")
    assert back[-1] == ("65534", b"")
    # the classic reader and CPython agree on the same archive
    assert len(zip_members(blob)) == 65535
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert len(z.namelist()) == 65535
    # a genuinely saturated cd_offset without a locator still raises
    bad = bytearray(zip_pack(MEMBERS, "stored"))
    struct.pack_into("<I", bad, len(bad) - 6, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="locator"):
        zip_members64(bytes(bad))
