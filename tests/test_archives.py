"""Zip/tar container tests.

Mirrors the reference's archive test strategy (SURVEY §4):
test_ziparchives_read.nim (extractAll vs system unzip, concatenated-zip
walk), test_tarballs_read.nim (extractAll vs system tar, symlinks),
validate_tarballs.nim (writer output re-read by third party). CPython
zipfile/tarfile and system unzip/tar are the ground truth here.
"""

import io
import os
import pathlib
import subprocess
import tarfile
import zipfile

import pytest

import zippy_tpu
from zippy_tpu import tarballs, tarballs_v1, ziparchives, ziparchives_v1
from zippy_tpu.common import ZippyError

DATA = pathlib.Path("/root/reference/tests/data")
BAGNON = DATA / "ziparchives" / "Bagnon-10.2.31.zip"
CAT = DATA / "ziparchives" / "cat.jpg"
LIBRESSL = DATA / "tarballs" / "libressl-3.4.2.tar.gz"


def _tree_files(root: pathlib.Path) -> dict[str, bytes]:
    out = {}
    for p in sorted(root.rglob("*")):
        rel = str(p.relative_to(root))
        if p.is_symlink():
            out[rel] = b"SYMLINK:" + os.readlink(p).encode()
        elif p.is_file():
            out[rel] = p.read_bytes()
    return out


# ---------------------------------------------------------------------------
# Zip reader (v2)
# ---------------------------------------------------------------------------


def test_zip_extract_all_matches_system_unzip(tmp_path):
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    ziparchives.extract_all(BAGNON, ours)
    theirs.mkdir()
    subprocess.run(
        ["unzip", "-qq", str(BAGNON), "-d", str(theirs)], check=True
    )
    a, b = _tree_files(ours), _tree_files(theirs)
    assert a == b and len(a) > 0


def test_zip_walk_files_and_extract_file():
    with ziparchives.open_zip_archive(BAGNON) as reader:
        files = list(reader.walk_files())
        assert len(files) > 0
        data = reader.extract_file(files[0])
        with zipfile.ZipFile(BAGNON) as zf:
            assert data == zf.read(files[0])


def test_concatenated_zip_walk():
    # cat.jpg is a jpg with a zip archive appended (reference
    # test_ziparchives_read.nim:40-48).
    with ziparchives.open_zip_archive(CAT) as reader:
        files = list(reader.walk_files())
        assert len(files) > 0
        for f in files:
            reader.extract_file(f)


def test_zip_missing_record_raises():
    with ziparchives.open_zip_archive(BAGNON) as reader:
        with pytest.raises(ZippyError):
            reader.extract_file("no/such/file.txt")


def test_zip_extract_all_dest_exists(tmp_path):
    with pytest.raises(ZippyError):
        ziparchives.extract_all(BAGNON, tmp_path)


# ---------------------------------------------------------------------------
# Zip writer (v2): always-zip64 in-memory archive
# ---------------------------------------------------------------------------


def test_create_zip_archive_read_by_zipfile():
    entries = {
        "readme.txt": b"hello zip",
        "dir/data.bin": bytes(range(256)) * 100,
        "empty.txt": b"",
        "unicode-é中.txt": "text contents",
    }
    blob = zippy_tpu.create_zip_archive(entries)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert set(zf.namelist()) == set(entries)
        for name, contents in entries.items():
            want = contents.encode() if isinstance(contents, str) else contents
            assert zf.read(name) == want


def test_create_zip_archive_roundtrip_own_reader(tmp_path):
    entries = {f"f{i}.bin": os.urandom(1000 + i) for i in range(20)}
    blob = zippy_tpu.create_zip_archive(entries)
    p = tmp_path / "a.zip"
    p.write_bytes(blob)
    with ziparchives.open_zip_archive(p) as reader:
        assert sorted(reader.walk_files()) == sorted(entries)
        for name, contents in entries.items():
            assert reader.extract_file(name) == contents


def test_create_zip_archive_rejects_bad_names():
    with pytest.raises(ZippyError):
        zippy_tpu.create_zip_archive({"": b"x"})
    with pytest.raises(ZippyError):
        zippy_tpu.create_zip_archive({"/abs/path": b"x"})


def test_zip_slip_defense(tmp_path):
    # An archive whose entry path escapes the destination must be rejected
    # before anything is written (reference ziparchives.nim:417-419).
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("../evil.txt", b"pwned")
    p = tmp_path / "evil.zip"
    p.write_bytes(buf.getvalue())
    dest = tmp_path / "out"
    with pytest.raises(ZippyError):
        ziparchives.extract_all(p, dest)
    assert not dest.exists()


# ---------------------------------------------------------------------------
# Zip v1 (legacy in-memory API)
# ---------------------------------------------------------------------------


def test_zip_v1_open_zipfile_written(tmp_path):
    p = tmp_path / "t.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", b"alpha")
        zf.writestr("sub/b.txt", b"beta" * 1000)
    archive = ziparchives_v1.ZipArchive()
    archive.open(p)
    assert archive.contents["a.txt"].contents == b"alpha"
    assert archive.contents["sub/b.txt"].contents == b"beta" * 1000


def test_zip_v1_write_read_by_unzip(tmp_path):
    src = tmp_path / "src"
    (src / "nested").mkdir(parents=True)
    (src / "one.txt").write_bytes(b"one contents")
    (src / "nested" / "two.bin").write_bytes(os.urandom(5000))
    out = tmp_path / "out.zip"
    ziparchives_v1.create_zip_archive(str(src), str(out))
    dest = tmp_path / "unzipped"
    dest.mkdir()
    subprocess.run(["unzip", "-qq", str(out), "-d", str(dest)], check=True)
    assert (dest / "src" / "one.txt").read_bytes() == b"one contents"
    assert (dest / "src" / "nested" / "two.bin").read_bytes() == (
        (src / "nested" / "two.bin").read_bytes()
    )


def test_zip_v1_extract_all(tmp_path):
    archive = ziparchives_v1.ZipArchive()
    archive.contents["x/y.txt"] = ziparchives_v1.ArchiveEntry(
        kind="file", contents=b"zed", permissions=0o644
    )
    dest = tmp_path / "v1out"
    archive.extract_all(str(dest))
    assert (dest / "x" / "y.txt").read_bytes() == b"zed"


def test_zip_v1_rejects_data_descriptor(tmp_path):
    # General purpose bit 3 (data descriptor) unsupported
    # (reference ziparchives_v1.nim:138-142).
    blob = bytearray()
    import struct

    blob += struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0b100, 0, 0, 0, 0, 0,
                        0, 1, 0)
    blob += b"a"
    archive = ziparchives_v1.ZipArchive()
    with pytest.raises(ZippyError):
        archive.open(bytes(blob))


# ---------------------------------------------------------------------------
# Tarballs (v2 extract)
# ---------------------------------------------------------------------------


def test_tar_extract_all_matches_system_tar(tmp_path):
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    tarballs.extract_all(LIBRESSL, ours)
    theirs.mkdir()
    subprocess.run(["tar", "-xf", str(LIBRESSL), "-C", str(theirs)],
                   check=True)
    a, b = _tree_files(ours), _tree_files(theirs)
    assert a == b and len(a) > 100


def test_tar_extract_dest_exists(tmp_path):
    with pytest.raises(ZippyError):
        tarballs.extract_all(LIBRESSL, tmp_path)


def test_tar_slip_defense(tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("../evil.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"pwned"))
    p = tmp_path / "evil.tar"
    p.write_bytes(buf.getvalue())
    dest = tmp_path / "tarout"
    with pytest.raises(ZippyError):
        tarballs.extract_all(p, dest)
    assert not dest.exists()


# ---------------------------------------------------------------------------
# Tarballs v1 (in-memory API + writer)
# ---------------------------------------------------------------------------


def test_tarball_v1_write_read_by_tarfile(tmp_path):
    src = tmp_path / "proj"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"file a")
    (src / "sub" / "b.txt").write_bytes(b"file b" * 500)
    for ext in (".tar", ".tar.gz", ".tgz"):
        out = tmp_path / f"out{ext}"
        tarballs_v1.create_tarball(str(src), str(out))
        with tarfile.open(out) as tf:
            names = tf.getnames()
            assert any(n.endswith("a.txt") for n in names)
            member = [n for n in names if n.endswith("b.txt")][0]
            assert tf.extractfile(member).read() == b"file b" * 500


def test_tarball_v1_write_read_by_system_tar(tmp_path):
    src = tmp_path / "proj2"
    src.mkdir()
    (src / "hello.txt").write_bytes(b"hello tar")
    out = tmp_path / "t.tar.gz"
    tarballs_v1.create_tarball(str(src), str(out))
    dest = tmp_path / "x"
    dest.mkdir()
    subprocess.run(["tar", "-xf", str(out), "-C", str(dest)], check=True)
    assert (dest / "proj2" / "hello.txt").read_bytes() == b"hello tar"


def test_tarball_v1_open_roundtrip(tmp_path):
    t = tarballs_v1.Tarball()
    t.contents["data.bin"] = tarballs_v1.TarballEntry(
        kind="0", contents=os.urandom(2000), last_modified=1600000000.0
    )
    t.contents["d/"] = tarballs_v1.TarballEntry(kind="5")
    out = tmp_path / "rt.tar"
    t.write_tarball(str(out))
    t2 = tarballs_v1.Tarball()
    t2.open(out)
    assert t2.contents["data.bin"].contents == t.contents["data.bin"].contents

    # gzip detect path
    out_gz = tmp_path / "rt.tar.gz"
    t.write_tarball(str(out_gz))
    t3 = tarballs_v1.Tarball()
    t3.open(out_gz)
    assert t3.contents["data.bin"].contents == t.contents["data.bin"].contents


def test_tarball_v1_name_limits(tmp_path):
    t = tarballs_v1.Tarball()
    t.contents["x" * 100] = tarballs_v1.TarballEntry(kind="0", contents=b"a")
    with pytest.raises(ZippyError):
        t.write_tarball(str(tmp_path / "b.tar"))


def test_tarball_v1_empty_write(tmp_path):
    t = tarballs_v1.Tarball()
    with pytest.raises(ZippyError):
        t.write_tarball(str(tmp_path / "e.tar"))
