"""From-scratch LZ4 codec (stdlib-only): block format, frame format,
and the xxHash32 the frame checksums require.

Kafka record batches with attributes codec 3 carry an LZ4 FRAME
(lz4/lz4 `lz4_Frame_format.md`, a public format): magic 0x184D2204,
a frame descriptor (FLG/BD[/content size], xxh32-derived header
checksum byte), data blocks — each a 4-byte little-endian size whose
high bit marks a stored-uncompressed block, optionally followed by a
block checksum — an all-zero end mark, and an optional content
checksum. Inside each block the LZ4 block format
(`lz4_Block_format.md`) is a sequence stream: token high nibble =
literal length (15 = extended by 255-saturated bytes), literals,
2-byte little-endian match offset, token low nibble + 4 = match
length (same extension). Matches may overlap their own output; with
block independence OFF they may also reach back into the previous
blocks' decompressed bytes (the decoder threads a 64 KiB history
prefix). The final sequence is literals-only.

The compressor is the standard greedy 4-byte-hash matcher honoring
the spec's end-of-block restrictions (last match starts >= 12 bytes
from the end; last 5 bytes are literals), with incompressible blocks
stored raw per frame spec. Parity is pinned by round-trip tests plus
hand-built spec vectors — every element type, overlap copies, length
extensions, stored blocks, checksum failures — independent of the
compressor, the same discipline as functions/snappy_codec.py.

Used by sources/kafka_wire.py for record-batch codec 3 (message
format v2 frames lz4 correctly; the v0/v1 legacy header-checksum
interop bug predates format v2 and stays out of scope); zstd (codec
4) is covered by the sibling functions/zstd_codec.py.

xxHash32 (Cyan4973/xxHash `xxhash_spec.md`) is implemented here
because the frame's header/block/content checksums are defined over
it; pinned by the spec's published test vectors.
"""

from __future__ import annotations

_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 per the published spec (stripes of 4 lanes, 4-byte
    tail words, byte tail, avalanche)."""
    i, n = 0, len(data)
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            v1 = (
                _rotl((v1 + int.from_bytes(data[i : i + 4], "little") * _P2) & _M32, 13)
                * _P1
            ) & _M32
            v2 = (
                _rotl((v2 + int.from_bytes(data[i + 4 : i + 8], "little") * _P2) & _M32, 13)
                * _P1
            ) & _M32
            v3 = (
                _rotl((v3 + int.from_bytes(data[i + 8 : i + 12], "little") * _P2) & _M32, 13)
                * _P1
            ) & _M32
            v4 = (
                _rotl((v4 + int.from_bytes(data[i + 12 : i + 16], "little") * _P2) & _M32, 13)
                * _P1
            ) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (
            _rotl((h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M32, 17)
            * _P4
        ) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def lz4_block_decompress(data: bytes, prefix: bytes = b"") -> bytes:
    """One LZ4 block -> bytes; ``prefix`` is the decompressed history
    a dependent block may copy from (empty for independent blocks).
    Raises ValueError on malformed input."""
    out = bytearray(prefix)
    base = len(prefix)
    i, n = 0, len(data)
    if n == 0:
        raise ValueError("lz4: empty block")
    while True:
        if i >= n:
            raise ValueError("lz4: truncated sequence token")
        token = data[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > n:
            raise ValueError("lz4: truncated literals")
        out += data[i : i + ll]
        i += ll
        if i == n:
            break  # final sequence is literals-only
        if i + 2 > n:
            raise ValueError("lz4: truncated match offset")
        off = int.from_bytes(data[i : i + 2], "little")
        i += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4: match offset out of range")
        ml = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[i]
                i += 1
                ml += b
                if b != 255:
                    break
        start = len(out) - off
        if off >= ml:  # disjoint: one slice
            out += out[start : start + ml]
        else:  # overlapping run: materialize in offset-sized steps
            while ml > 0:
                chunk = out[start : start + min(off, ml)]
                out += chunk
                start += len(chunk)
                ml -= len(chunk)
    return bytes(out[base:])


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compressor: 4-byte hash table, 2-byte-offset
    matches, spec end restrictions honored (matches start >= 12 bytes
    before the end, last 5 bytes stay literals). Always emits a VALID
    stream (worst case ~= input + extension-byte overhead)."""
    out = bytearray()
    n = len(data)

    def emit(lit_s: int, lit_e: int, off: int | None = None, mlen: int = 0):
        ll = lit_e - lit_s
        m = mlen - 4 if off is not None else 0
        out.append((min(ll, 15) << 4) | min(m, 15))
        if ll >= 15:
            rem = ll - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(data[lit_s:lit_e])
        if off is not None:
            out.extend(off.to_bytes(2, "little"))
            if m >= 15:
                rem = m - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    table: dict[bytes, int] = {}
    i = 0
    lit = 0
    while i + 12 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            ln = 4
            limit = n - 5  # the last 5 bytes must remain literals
            while i + ln < limit and data[cand + ln] == data[i + ln]:
                ln += 1
            emit(lit, i, i - cand, ln)
            i += ln
            lit = i
        else:
            i += 1
    emit(lit, n)
    return bytes(out)


_LZ4_MAGIC = 0x184D2204
_LZ4_BLOCK = 65536  # BD max-size code 4


def lz4_frame_compress(
    data: bytes,
    block_checksum: bool = False,
    content_checksum: bool = True,
    content_size: bool = False,
) -> bytes:
    """bytes -> one LZ4 frame (64 KiB independent blocks, version 01
    descriptor, xxh32 header-checksum byte, optional block/content
    checksums and content-size field). Incompressible blocks are
    stored raw with the high size bit per frame spec."""
    flg = (
        (1 << 6)  # version 01
        | (1 << 5)  # block independence
        | (int(block_checksum) << 4)
        | (int(content_size) << 3)
        | (int(content_checksum) << 2)
    )
    desc = bytes([flg, 4 << 4])  # BD: 64 KiB max block size
    if content_size:
        desc += len(data).to_bytes(8, "little")
    out = bytearray(_LZ4_MAGIC.to_bytes(4, "little"))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for s in range(0, len(data), _LZ4_BLOCK):
        chunk = data[s : s + _LZ4_BLOCK]
        comp = lz4_block_compress(chunk)
        if len(comp) >= len(chunk):
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            payload = chunk
        else:
            out += len(comp).to_bytes(4, "little")
            payload = comp
        out += payload
        if block_checksum:
            out += xxh32(payload).to_bytes(4, "little")
    out += b"\x00\x00\x00\x00"  # EndMark
    if content_checksum:
        out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    """One (or more concatenated/skippable) LZ4 frame(s) -> bytes;
    verifies the header-checksum byte and any block/content checksums;
    raises ValueError on malformed input and NotImplementedError at
    the declared dictionary boundary."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 4 > n:
            raise ValueError("lz4: truncated frame magic")
        magic = int.from_bytes(data[i : i + 4], "little")
        i += 4
        if 0x184D2A50 <= magic <= 0x184D2A5F:  # skippable frame
            if i + 4 > n:
                raise ValueError("lz4: truncated skippable frame size")
            skip = int.from_bytes(data[i : i + 4], "little")
            i += 4 + skip
            if i > n:
                raise ValueError("lz4: truncated skippable frame")
            continue
        if magic != _LZ4_MAGIC:
            raise ValueError(f"lz4: bad frame magic 0x{magic:08x}")
        desc_start = i
        if i + 2 > n:
            raise ValueError("lz4: truncated frame descriptor")
        flg, bd = data[i], data[i + 1]
        i += 2
        if flg >> 6 != 1:
            raise ValueError(f"lz4: unsupported frame version {flg >> 6}")
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        if flg & 0x01:
            raise NotImplementedError("lz4: dictionary frames unsupported")
        indep = bool(flg & 0x20)
        b_csum = bool(flg & 0x10)
        c_size = bool(flg & 0x08)
        c_csum = bool(flg & 0x04)
        if bd & 0x8F or not 4 <= (bd >> 4 & 0x07) <= 7:
            raise ValueError(f"lz4: invalid BD byte 0x{bd:02x}")
        expect_len = None
        if c_size:
            if i + 8 > n:
                raise ValueError("lz4: truncated content size")
            expect_len = int.from_bytes(data[i : i + 8], "little")
            i += 8
        if i >= n:
            raise ValueError("lz4: truncated header checksum")
        hc = (xxh32(data[desc_start:i]) >> 8) & 0xFF
        if data[i] != hc:
            raise ValueError(
                f"lz4: header checksum mismatch (got 0x{data[i]:02x}, "
                f"want 0x{hc:02x})"
            )
        i += 1
        frame_out = bytearray()
        while True:
            if i + 4 > n:
                raise ValueError("lz4: truncated block size")
            bsize = int.from_bytes(data[i : i + 4], "little")
            i += 4
            if bsize == 0:  # EndMark
                break
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if i + bsize > n:
                raise ValueError("lz4: truncated block")
            payload = data[i : i + bsize]
            i += bsize
            if b_csum:
                if i + 4 > n:
                    raise ValueError("lz4: truncated block checksum")
                want = int.from_bytes(data[i : i + 4], "little")
                i += 4
                if xxh32(payload) != want:
                    raise ValueError("lz4: block checksum mismatch")
            if stored:
                frame_out += payload
            else:
                hist = b"" if indep else bytes(frame_out[-_LZ4_BLOCK:])
                frame_out += lz4_block_decompress(payload, prefix=hist)
        if c_csum:
            if i + 4 > n:
                raise ValueError("lz4: truncated content checksum")
            want = int.from_bytes(data[i : i + 4], "little")
            i += 4
            if xxh32(bytes(frame_out)) != want:
                raise ValueError("lz4: content checksum mismatch")
        if expect_len is not None and len(frame_out) != expect_len:
            raise ValueError(
                f"lz4: content size mismatch (header {expect_len}, "
                f"got {len(frame_out)})"
            )
        out += frame_out
    return bytes(out)
