"""Zip archive reader/writer (current API).

Parity reference: /root/reference/src/zippy/ziparchives.nim —
memory-mapped reader with backwards EOCD scan (:157-167), zip64 EOCD +
locator (:199-235), central-directory walk (:274-387) with zip64 extra-field
sizes (:320-356), CP437→UTF-8 filename fixup (:117-155), concatenated-zip
offset recovery (:169-184, :258-267), per-file extractFile with crc check
(:39-93), extractAll with path-safety pre-pass (:417-419) and
cleanup-on-error (:443-451), MS-DOS timestamps (:98-115); createZipArchive
always-zip64 writer (:455-634).

Departure from the reference: createZipArchive compresses entries on a
thread pool (entries are independent — the fan-out seam in SURVEY §3.5; the
native deflate releases the GIL during the call).
"""

from __future__ import annotations

import mmap
import os
import struct
import time as _time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime

from . import engine
from .common import ZippyError

FILE_HEADER_LEN = 30
FILE_HEADER_SIG = 0x04034B50
CENTRAL_DIR_SIG = 0x02014B50
EOCD_SIG = 0x06054B50
ZIP64_EOCD_SIG = 0x06064B50
ZIP64_EOCD_LOCATOR_SIG = 0x07064B50
ZIP64_EXTRA_FIELD_ID = 1

S_IFDIR = 0o040000


def verify_path_is_safe_to_extract(path: str) -> None:
    """Zip-slip defense (reference internal.nim:294-302)."""
    if os.path.isabs(path) or (len(path) > 1 and path[1] == ":"):
        raise ZippyError(f"Absolute path not allowed {path}")
    if path.startswith("../") or path.startswith("..\\"):
        raise ZippyError(f"Path ../ not allowed {path}")
    if "/../" in path or "\\..\\" in path:
        raise ZippyError(f"Path /../ not allowed {path}")


def parse_ms_dos_datetime(time_v: int, date_v: int) -> float | None:
    """MS-DOS timestamp -> epoch seconds, local time (ziparchives.nim:98-115)."""
    seconds = (time_v & 0b11111) * 2
    minutes = (time_v >> 5) & 0b111111
    hours = (time_v >> 11) & 0b11111
    days = date_v & 0b11111
    months = (date_v >> 5) & 0b1111
    years = (date_v >> 9) & 0b1111111
    if seconds <= 59 and minutes <= 59 and hours <= 23:
        try:
            return datetime(
                years + 1980, months, days, hours, minutes, seconds
            ).timestamp()
        except ValueError:
            return None
    return None


def to_ms_dos(epoch: float) -> tuple[int, int]:
    dt = datetime.fromtimestamp(epoch)
    t = (dt.second // 2) | (dt.minute << 5) | (dt.hour << 11)
    d = dt.day | (dt.month << 5) | (max(0, dt.year - 1980) << 9)
    return t, d


def utf8ify(file_name: bytes) -> str:
    """Decode a zip filename: UTF-8 if valid, else CP437 (OEM/DOS)."""
    try:
        return file_name.decode("utf-8")
    except UnicodeDecodeError:
        return file_name.decode("cp437")


@dataclass
class ZipArchiveRecord:
    kind: str  # "file" | "directory"
    file_header_offset: int
    path: str
    uncompressed_crc32: int
    compressed_size: int
    uncompressed_size: int
    permissions: int  # unix mode bits (0 = unset)


class ZipArchiveReader:
    """Memory-mapped zip reader (reference ZipArchiveReader)."""

    def __init__(self, zip_path: str | os.PathLike):
        self._file = open(zip_path, "rb")
        try:
            self._mem = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:
            self._file.close()
            raise ZippyError("Invalid zip archive (empty file)") from None
        self.records: dict[str, ZipArchiveRecord] = {}
        try:
            self._parse_central_directory()
        except Exception:
            self.close()
            raise

    # -- context manager -----------------------------------------------------
    def __enter__(self) -> "ZipArchiveReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if self._mem is not None:
            self._mem.close()
            self._mem = None
        if self._file is not None:
            self._file.close()
            self._file = None

    # -- parsing -------------------------------------------------------------
    def _find_eocd(self) -> int:
        """Backwards scan for the EOCD signature (ziparchives.nim:157-167)."""
        src = self._mem
        pos = len(src) - 22
        sig = struct.pack("<I", EOCD_SIG)
        while pos >= 0:
            hit = src.rfind(sig, 0, pos + 4)
            if hit < 0:
                break
            return hit
        raise ZippyError("Attempted to read past end of file")

    def _find_socd(self, start: int, num_records: int) -> int:
        """Backwards scan counting CD headers (ziparchives.nim:169-184)."""
        src = self._mem
        sig = struct.pack("<I", CENTRAL_DIR_SIG)
        pos = start
        found = 0
        while pos >= 0:
            hit = src.rfind(sig, 0, pos + 4)
            if hit < 0:
                raise ZippyError("Attempted to read past end of file")
            found += 1
            if found == num_records:
                return hit
            pos = hit - 1
        raise ZippyError("Attempted to read past end of file")

    def _parse_central_directory(self) -> None:
        src = self._mem
        size = len(src)
        eocd = self._find_eocd()
        if eocd + 22 > size:
            raise ZippyError("Attempted to read past end of file")

        zip64 = (
            eocd - 20 >= 0
            and struct.unpack_from("<I", src, eocd - 20)[0]
            == ZIP64_EOCD_LOCATOR_SIG
        )

        if zip64:
            z64_disk, z64_start, num_disks = struct.unpack_from(
                "<IQI", src, eocd - 20 + 4
            )
            if z64_disk != 0:
                raise ZippyError("Unsupported archive, disk number")
            if num_disks != 1:
                raise ZippyError("Unsupported archive, num disks")
            pos = z64_start
            if pos + 64 > size:
                raise ZippyError("Attempted to read past end of file")
            if struct.unpack_from("<I", src, pos)[0] != ZIP64_EOCD_SIG:
                raise ZippyError("Invalid central directory file header")
            disk_number, start_disk = struct.unpack_from("<II", src, pos + 16)
            n_disk, n_total, cd_size, cd_start = struct.unpack_from(
                "<QQQQ", src, pos + 24
            )
        else:
            disk_number, start_disk, n_disk, n_total, cd_size, cd_start = (
                struct.unpack_from("<HHHHII", src, eocd + 4)
            )

        if disk_number != 0:
            raise ZippyError("Unsupported archive, disk number")
        if start_disk != 0:
            raise ZippyError("Unsupported archive, start disk")
        if n_disk != n_total:
            raise ZippyError("Unsupported archive, record number")

        # Concatenated-zip support: locate the CD relative to the file end
        # (ziparchives.nim:258-267).
        try:
            socd = self._find_socd(eocd, n_total) if n_total else cd_start
        except ZippyError:
            socd = cd_start
        socd_offset = socd - cd_start

        pos = socd_offset + cd_start
        for _ in range(n_total):
            if pos + 46 > size:
                raise ZippyError("Attempted to read past end of file")
            (sig, _vmb, _mve, gp_flag, method, mtime, mdate, crc,
             compressed_size, uncompressed_size, name_len, extra_len,
             comment_len, file_disk, _iattr, eattr, header_off) = (
                struct.unpack_from("<IHHHHHHIIIHHHHHII", src, pos)
            )
            if sig != CENTRAL_DIR_SIG:
                raise ZippyError("Invalid central directory file header")
            if method not in (0, 8):
                raise ZippyError("Unsupported archive, compression method")
            if file_disk != 0:
                raise ZippyError("Invalid file disk number")

            pos += 46
            if pos + name_len > size:
                raise ZippyError("Attempted to read past end of file")
            raw_name = src[pos : pos + name_len]
            pos += name_len

            # zip64 extra fields (ziparchives.nim:320-356)
            ef_pos, ef_end = pos, pos + extra_len
            while ef_pos + 4 <= ef_end:
                field_id, field_len = struct.unpack_from("<HH", src, ef_pos)
                ef_pos += 4
                if field_id != ZIP64_EXTRA_FIELD_ID:
                    ef_pos += field_len
                    continue
                z = ef_pos
                if uncompressed_size == 0xFFFFFFFF:
                    if z + 8 > ef_pos + field_len:
                        raise ZippyError("Attempted to read past end of file")
                    uncompressed_size = struct.unpack_from("<Q", src, z)[0]
                    z += 8
                if compressed_size == 0xFFFFFFFF:
                    if z + 8 > ef_pos + field_len:
                        raise ZippyError("Attempted to read past end of file")
                    compressed_size = struct.unpack_from("<Q", src, z)[0]
                    z += 8
                if header_off == 0xFFFFFFFF:
                    if z + 8 > ef_pos + field_len:
                        raise ZippyError("Attempted to read past end of file")
                    header_off = struct.unpack_from("<Q", src, z)[0]
                    z += 8
                break
            pos = ef_end + comment_len

            if pos > socd_offset + cd_start + cd_size:
                raise ZippyError("Invalid central directory size")

            if gp_flag & (1 << 11):  # EFS: name is UTF-8
                name = raw_name.decode("utf-8", errors="replace")
            else:
                name = utf8ify(raw_name)

            if name in self.records:
                raise ZippyError("Unsupported archive, duplicate entry")

            dos_dir = (eattr & 0x10) != 0
            unix_dir = (eattr & (S_IFDIR << 16)) != 0
            kind = (
                "directory"
                if dos_dir or unix_dir or name.endswith("/")
                else "file"
            )
            self.records[name] = ZipArchiveRecord(
                kind=kind,
                file_header_offset=header_off + socd_offset,
                path=name,
                uncompressed_crc32=crc,
                compressed_size=compressed_size,
                uncompressed_size=uncompressed_size,
                permissions=(eattr >> 16) & 0o7777,
            )

    # -- access --------------------------------------------------------------
    def walk_files(self):
        """Yields file (not directory) paths in archive order."""
        for record in self.records.values():
            if record.kind == "file":
                yield record.path

    def extract_file(self, path: str) -> bytes:
        """Decompress one entry and verify its CRC (ziparchives.nim:39-93)."""
        record = self.records.get(path)
        if record is None:
            raise ZippyError(f"No file record found for {path}")
        src = self._mem
        pos = record.file_header_offset
        if pos + FILE_HEADER_LEN > len(src):
            raise ZippyError("Attempted to read past end of file")
        sig, _mve, _gp, method = struct.unpack_from("<IHHH", src, pos)
        if sig != FILE_HEADER_SIG:
            raise ZippyError("Invalid file header")
        name_len, extra_len = struct.unpack_from("<HH", src, pos + 26)
        pos += FILE_HEADER_LEN + name_len + extra_len
        if pos + record.compressed_size > len(src):
            raise ZippyError("Attempted to read past end of file")
        if record.kind != "file":
            raise ZippyError(f"No file record found for {path}")
        payload = src[pos : pos + record.compressed_size]
        if method == 0:
            result = bytes(payload)
        elif method == 8:
            result, _ = engine.inflate(payload)
        else:
            raise ZippyError("Unsupported archive, compression method")
        if engine.crc32(result) != record.uncompressed_crc32:
            raise ZippyError("Verifying crc32 failed")
        return result

    def _record_mtime(self, record: ZipArchiveRecord) -> float | None:
        t, d = struct.unpack_from("<HH", self._mem,
                                  record.file_header_offset + 10)
        return parse_ms_dos_datetime(t, d)


def open_zip_archive(zip_path: str | os.PathLike) -> ZipArchiveReader:
    return ZipArchiveReader(zip_path)


def extract_all(zip_path: str | os.PathLike, dest: str | os.PathLike) -> None:
    """Extract to `dest` (must not exist; parent must). ziparchives.nim:398."""
    dest = os.fspath(dest)
    if dest == "" or os.path.isdir(dest):
        raise ZippyError(f"Destination {dest} already exists")
    head = os.path.dirname(dest.rstrip("/"))
    if head and not os.path.isdir(head):
        raise ZippyError(f"Path to {dest} does not exist")

    with open_zip_archive(zip_path) as reader:
        for record in reader.records.values():
            verify_path_is_safe_to_extract(record.path)
        try:
            # Directories first (so parallel file writes never race mkdir),
            # then files decode+write on a thread pool — entries are
            # independent and the native decoder releases the GIL (the
            # reference extracts serially, ziparchives.nim:429).
            files = []
            for record in reader.records.values():
                target = os.path.join(dest, record.path)
                if record.kind == "directory":
                    os.makedirs(target, exist_ok=True)
                else:
                    os.makedirs(os.path.dirname(target) or dest, exist_ok=True)
                    files.append((record, target))

            def _extract_one(item):
                record, target = item
                with open(target, "wb") as f:
                    f.write(reader.extract_file(record.path))
                if record.permissions:
                    os.chmod(target, record.permissions)

            if len(files) > 1:
                with ThreadPoolExecutor(
                    max_workers=min(8, os.cpu_count() or 1)
                ) as ex:
                    list(ex.map(_extract_one, files))
            elif files:
                _extract_one(files[0])
            # Second pass for mtimes (ziparchives.nim:432-439).
            for record in reader.records.values():
                mtime = reader._record_mtime(record)
                if mtime is not None:
                    target = os.path.join(dest, record.path)
                    os.utime(target, (mtime, mtime))
        except Exception:
            import shutil

            shutil.rmtree(dest, ignore_errors=True)
            raise


@dataclass
class _WrittenEntry:
    file_header_offset: int
    uncompressed_len: int
    compressed_len: int
    compression_method: int
    uncompressed_crc32: int
    name: bytes = field(default=b"")


def create_zip_archive(entries: dict[str, bytes | str]) -> bytes:
    """In-memory zip from {path: contents}; always zip64, entries compressed
    at BestSpeed (reference ziparchives.nim:455-634)."""
    lm_time, lm_date = to_ms_dos(_time.time())

    items: list[tuple[str, bytes]] = []
    for file_name, contents in entries.items():
        if file_name == "":
            raise ZippyError("Invalid empty file name")
        if file_name[0] == "/":
            raise ZippyError("File paths must be relative")
        if len(file_name.encode()) > 0xFFFF:
            raise ZippyError("File name len > uint16.high")
        if isinstance(contents, str):
            contents = contents.encode("utf-8")
        items.append((file_name, contents))

    def _compress_one(contents: bytes) -> tuple[bytes, int, int]:
        crc = engine.crc32(contents)
        if contents == b"":
            return b"", 0, crc
        return engine.deflate(contents, 1), 8, crc

    if len(items) > 1:
        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            compressed = list(ex.map(lambda it: _compress_one(it[1]), items))
    else:
        compressed = [_compress_one(c) for _, c in items]

    out = bytearray()
    records: list[_WrittenEntry] = []
    for (file_name, contents), (comp, method, crc) in zip(items, compressed):
        name_b = file_name.encode("utf-8")
        records.append(_WrittenEntry(
            file_header_offset=len(out),
            uncompressed_len=len(contents),
            compressed_len=len(comp),
            compression_method=method,
            uncompressed_crc32=crc,
            name=name_b,
        ))
        out += struct.pack(
            "<IHHHHHIIIHH", FILE_HEADER_SIG, 45, 1 << 11, method,
            lm_time, lm_date, crc, 0xFFFFFFFF, 0xFFFFFFFF, len(name_b), 20,
        )
        out += name_b
        out += struct.pack("<HHQQ", ZIP64_EXTRA_FIELD_ID, 16,
                           len(contents), len(comp))
        out += comp

    cd_start = len(out)
    for r in records:
        out += struct.pack(
            "<IHHHHHHIIIHHHHHII", CENTRAL_DIR_SIG, 45, 45, 1 << 11,
            r.compression_method, lm_time, lm_date, r.uncompressed_crc32,
            0xFFFFFFFF, 0xFFFFFFFF, len(r.name), 28, 0, 0, 0, 0, 0xFFFFFFFF,
        )
        out += r.name
        out += struct.pack("<HHQQQ", ZIP64_EXTRA_FIELD_ID, 24,
                           r.uncompressed_len, r.compressed_len,
                           r.file_header_offset)
    cd_end = len(out)

    out += struct.pack("<IQHHIIQQQQ", ZIP64_EOCD_SIG, 44, 45, 45, 0, 0,
                       len(records), len(records), cd_end - cd_start, cd_start)
    out += struct.pack("<IIQI", ZIP64_EOCD_LOCATOR_SIG, 0, cd_end, 1)
    out += struct.pack("<IHHHHIIH", EOCD_SIG, 0, 0, 0xFFFF, 0xFFFF,
                       0xFFFFFFFF, 0xFFFFFFFF, 0)
    return bytes(out)
