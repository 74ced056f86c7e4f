"""Compound File Binary (OLE2) container — pure-stdlib reader/writer.

The storage layer under every legacy Office format (.doc/.xls/.ppt),
[MS-CFB]. The reader walks the DIFAT → FAT → directory chain and
serves streams from either the FAT (≥ cutoff, 512-byte sectors) or the
mini FAT (< cutoff, 64-byte minisectors inside the root's ministream).
The writer emits the smallest valid v3 layout (512-byte sectors,
header-resident DIFAT) with a deterministic sector order so fixture
bytes are reproducible.

Used by :mod:`.doc_binary` for Word 97-2003 text extraction; no
reference counterpart (the reference's Tika path consumed these
transparently, runner.py:36-115).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Sequence, Tuple

__all__ = ["CfbReader", "make_cfb"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_SECT = 512
_MINISECT = 64


class CfbReader:
    """Parse an OLE2 container; ``streams`` maps name → bytes.

    Storage nesting is flattened: entries are keyed by name alone
    (Word's WordDocument/0Table/1Table all live in the root storage,
    which is the only layout this consumer needs; a name collision
    across storages keeps the first entry).
    """

    def __init__(self, data: bytes) -> None:
        if data[:8] != _MAGIC:
            raise ValueError("not an OLE2 compound file")
        (
            major,
            _order,
            ssz,
            mssz,
        ) = struct.unpack("<H H H H", data[26:34])
        if ssz not in (9, 12) or (1 << ssz) > len(data):
            raise ValueError(f"CFB bad sector shift {ssz}")
        self._sect = 1 << ssz
        self._mini = 1 << mssz
        (n_fat,) = struct.unpack("<I", data[44:48])
        (first_dir,) = struct.unpack("<I", data[48:52])
        (self._cutoff,) = struct.unpack("<I", data[56:60])
        (first_minifat,) = struct.unpack("<I", data[60:64])
        (n_minifat,) = struct.unpack("<I", data[64:68])
        (first_difat,) = struct.unpack("<I", data[68:72])
        (n_difat,) = struct.unpack("<I", data[72:76])
        self._data = data

        difat = list(struct.unpack("<109I", data[76:512]))
        sec = first_difat
        for _ in range(n_difat):
            if sec >= _FATSECT:
                break
            body = self._sector(sec)
            more = struct.unpack(f"<{self._sect // 4}I", body)
            difat.extend(more[:-1])
            sec = more[-1]
        fat_sectors = [s for s in difat if s != _FREE][:n_fat]
        fat: List[int] = []
        for s in fat_sectors:
            fat.extend(struct.unpack(f"<{self._sect // 4}I", self._sector(s)))
        self._fat = fat

        dir_data = self._read_chain(first_dir)
        self.streams: Dict[str, bytes] = {}
        root_start = root_size = None
        entries = []
        for off in range(0, len(dir_data), 128):
            e = dir_data[off : off + 128]
            if len(e) < 128:
                break
            (nlen,) = struct.unpack("<H", e[64:66])
            if not 2 <= nlen <= 64:
                continue
            name = e[: nlen - 2].decode("utf-16-le", "replace")
            otype = e[66]
            (start,) = struct.unpack("<I", e[116:120])
            (size,) = struct.unpack("<Q", e[120:128])
            if otype == 5:  # root: its chain is the ministream
                root_start, root_size = start, size
            elif otype == 2:
                entries.append((name, start, size))

        minifat: List[int] = []
        if n_minifat:
            mf = self._read_chain(first_minifat)
            minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))
        ministream = (
            self._read_chain(root_start)[:root_size]
            if root_start is not None and root_start != _ENDOFCHAIN
            else b""
        )

        for name, start, size in entries:
            if size >= self._cutoff:
                self.streams.setdefault(name, self._read_chain(start)[:size])
            else:
                out = bytearray()
                sec = start
                guard = 0
                while sec < _FATSECT and size > len(out):
                    off = sec * self._mini
                    out += ministream[off : off + self._mini]
                    if sec >= len(minifat):
                        raise ValueError("CFB mini chain out of range")
                    sec = minifat[sec]
                    guard += 1
                    if guard > len(minifat) + 1:
                        raise ValueError("CFB mini chain cycle")
                self.streams.setdefault(name, bytes(out[:size]))

    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self._sect
        body = self._data[off : off + self._sect]
        if len(body) < self._sect:
            raise ValueError(f"CFB sector {n} out of range")
        return body

    def _read_chain(self, start: int) -> bytes:
        out = bytearray()
        sec = start
        guard = 0
        while sec < _FATSECT:
            out += self._sector(sec)
            if sec >= len(self._fat):
                raise ValueError("CFB FAT chain out of range")
            sec = self._fat[sec]
            guard += 1
            if guard > len(self._fat) + 1:
                raise ValueError("CFB FAT chain cycle")
        return bytes(out)


def _pad(b: bytes, size: int, fill: bytes = b"\x00") -> bytes:
    return b + fill * (size - len(b) % size if len(b) % size else 0)


def make_cfb(streams: Sequence[Tuple[str, bytes]]) -> bytes:
    """Minimal valid v3 container with the given root-storage streams.

    Streams < 4096 bytes go through the ministream/mini FAT (the layout
    real Word files use for small streams — exercising the reader's
    mini path); larger ones through the FAT. Deterministic layout:
    directory, mini FAT, ministream, then large streams, then the FAT
    maps itself at the end.
    """
    small = [(n, b) for n, b in streams if len(b) < 4096]
    large = [(n, b) for n, b in streams if len(b) >= 4096]

    # ministream + mini FAT
    ministream = bytearray()
    minifat: List[int] = []
    mini_start: Dict[str, int] = {}
    for name, body in small:
        first = len(minifat)
        mini_start[name] = first if body else _ENDOFCHAIN
        n_chunks = (len(body) + _MINISECT - 1) // _MINISECT
        for i in range(n_chunks):
            minifat.append(first + i + 1 if i + 1 < n_chunks else _ENDOFCHAIN)
        ministream += _pad(body, _MINISECT)
    minifat_bytes = _pad(
        b"".join(struct.pack("<I", v) for v in minifat) or b"", _SECT, b"\xff"
    ) if minifat else b""

    # sector plan (indices before the FAT is appended):
    #   [dir sectors][minifat sectors][ministream sectors][large streams]
    sectors: List[bytes] = []

    def add(data: bytes) -> Tuple[int, int]:
        """Append padded data; return (first sector, sector count)."""
        if not data:
            return _ENDOFCHAIN, 0
        first = len(sectors)
        padded = _pad(data, _SECT)
        for i in range(0, len(padded), _SECT):
            sectors.append(padded[i : i + _SECT])
        return first, len(padded) // _SECT

    # directory needs sector numbers, so reserve its slot first and
    # backfill: compute all layout positions in two passes
    n_dir_entries = 1 + len(small) + len(large)
    n_dir_sects = (n_dir_entries * 128 + _SECT - 1) // _SECT
    dir_first = 0
    minifat_first, n_minifat_sects = (
        (n_dir_sects, len(minifat_bytes) // _SECT)
        if minifat_bytes
        else (_ENDOFCHAIN, 0)
    )
    mini_first = n_dir_sects + n_minifat_sects
    n_mini_sects = (len(ministream) + _SECT - 1) // _SECT

    large_first: Dict[str, int] = {}
    cursor = mini_first + n_mini_sects
    for name, body in large:
        large_first[name] = cursor
        cursor += (len(body) + _SECT - 1) // _SECT
    n_data_sects = cursor  # sectors before the FAT

    def dir_entry(
        name: str,
        otype: int,
        start: int,
        size: int,
        child: int = _FREE,
        right: int = _FREE,
    ) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = otype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREE, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    n_streams = len(small) + len(large)
    entries = [
        dir_entry(
            "Root Entry",
            5,
            mini_first if ministream else _ENDOFCHAIN,
            len(ministream),
            child=1 if n_streams else _FREE,
        )
    ]
    # degenerate right-sibling chain — parseable by any tree walker
    all_streams = [(n, mini_start[n], len(b)) for n, b in small] + [
        (n, large_first[n], len(b)) for n, b in large
    ]
    for i, (name, start, size) in enumerate(all_streams):
        right = i + 2 if i + 1 < n_streams else _FREE
        entries.append(dir_entry(name, 2, start, size, right=right))
    dir_bytes = _pad(b"".join(entries), _SECT)

    add(dir_bytes)
    if minifat_bytes:
        add(minifat_bytes)
    add(bytes(ministream))
    for _, body in large:
        add(body)
    assert len(sectors) == n_data_sects

    # FAT: chains for everything above + the FAT sectors themselves
    def fat_count(total_data: int) -> int:
        n = 0
        while True:
            cap = (total_data + n) <= n * (_SECT // 4)
            if cap:
                return n
            n += 1

    n_fat = fat_count(n_data_sects)
    fat = [_FREE] * (n_fat * (_SECT // 4))

    def chain(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = first + i + 1 if i + 1 < count else _ENDOFCHAIN

    chain(dir_first, n_dir_sects)
    if minifat_bytes:
        chain(minifat_first, n_minifat_sects)
    chain(mini_first, n_mini_sects)
    for name, body in large:
        chain(large_first[name], (len(body) + _SECT - 1) // _SECT)
    for i in range(n_fat):
        fat[n_data_sects + i] = _FATSECT
    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    for i in range(n_fat):
        sectors.append(fat_bytes[i * _SECT : (i + 1) * _SECT])

    difat = [n_data_sects + i for i in range(n_fat)] + [_FREE] * (109 - n_fat)
    header = bytearray(512)
    header[:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x3E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte minisectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_first)
    struct.pack_into("<I", header, 56, 4096)  # ministream cutoff
    struct.pack_into(
        "<I", header, 60, minifat_first if minifat_bytes else _ENDOFCHAIN
    )
    struct.pack_into("<I", header, 64, n_minifat_sects)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)
