"""From-scratch snappy block codec (stdlib-only).

Kafka record batches with attributes codec 2 carry a RAW snappy block
(google/snappy `format_description.txt`, a public format): a
little-endian base-128 varint preamble with the uncompressed length,
then a stream of elements whose tag byte's low two bits select

- ``00`` literal — length-1 in tag bits 2..7 (values 60..63 mean the
  length-1 follows in 1..4 little-endian bytes),
- ``01`` copy, 1-byte offset — length 4..11 in tag bits 2..4, offset
  11 bits = tag bits 5..7 << 8 | next byte,
- ``10`` copy, 2-byte little-endian offset — length 1..64,
- ``11`` copy, 4-byte little-endian offset — length 1..64.

Copies may overlap their own output (offset < length is the classic
LZ77 run) — the decoder must materialize byte-ranges in order.

The compressor here is the standard greedy 4-byte-hash matcher:
correct, genuinely compressing on repetitive input, and intentionally
simple — parity is pinned by round-trip tests plus hand-built spec
vectors that exercise every element type (including overlapping
copies) independently of the compressor, the same discipline as the
JPEG/Kafka hand-built frames.

Used by sources/kafka_wire.py for record-batch codec 2; gzip (codec
1) stays on the stdlib; lz4 and zstd are covered by the sibling
functions/lz4_codec.py and functions/zstd_codec.py — the protocol
codec set is closed.
"""

from __future__ import annotations


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block -> bytes; raises ValueError on malformed
    input (bad copy offsets, truncated elements, length mismatch)."""
    n = shift = 0
    i = 0
    while True:
        if i >= len(data):
            raise ValueError("snappy: truncated preamble")
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 31:
            raise ValueError("snappy: preamble varint too long")
    out = bytearray()
    while i < len(data):
        tag = data[i]
        i += 1
        t = tag & 3
        if t == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60
                if i + nb > len(data):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[i : i + nb], "little") + 1
                i += nb
            if i + ln > len(data):
                raise ValueError("snappy: truncated literal")
            out += data[i : i + ln]
            i += ln
            continue
        if t == 1:  # copy, 1-byte offset
            if i >= len(data):
                raise ValueError("snappy: truncated copy")
            ln = 4 + ((tag >> 2) & 0x07)
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif t == 2:  # copy, 2-byte offset
            if i + 2 > len(data):
                raise ValueError("snappy: truncated copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            if i + 4 > len(data):
                raise ValueError("snappy: truncated copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        if off >= ln:  # disjoint: one slice
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping run: materialize in offset-sized steps
            start = len(out) - off
            while ln > 0:
                chunk = out[start : start + min(off, ln)]
                out += chunk
                start += len(chunk)
                ln -= len(chunk)
    if len(out) != n:
        raise ValueError(
            f"snappy: length mismatch (preamble {n}, got {len(out)})"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy snappy compressor: 4-byte rolling hash table, 2-byte-
    offset copies in <=64-byte chunks, literals for everything else.
    Always emits a VALID stream (worst case ~= input + overhead)."""
    out = bytearray(_uvarint(len(data)))

    def emit_literal(s: int, e: int) -> None:
        while s < e:
            ln = min(e - s, 1 << 16)  # 2-byte length element cap
            if ln <= 60:
                out.append((ln - 1) << 2)
            elif ln <= 256:
                out.append(60 << 2)
                out.append(ln - 1)
            else:
                out.append(61 << 2)
                out.extend((ln - 1).to_bytes(2, "little"))
            out.extend(data[s : s + ln])
            s += ln

    table: dict[bytes, int] = {}
    i = 0
    lit = 0
    n = len(data)
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend the match
            ln = 4
            while i + ln < n and data[cand + ln] == data[i + ln]:
                ln += 1
            emit_literal(lit, i)
            off = i - cand
            rem = ln
            while rem > 0:
                # the 2-byte-offset form carries lengths 1..64, so any
                # chunk size is legal
                step = min(rem, 64)
                out.append(((step - 1) << 2) | 2)
                out.extend(off.to_bytes(2, "little"))
                rem -= step
            i += ln
            lit = i
        else:
            i += 1
    emit_literal(lit, n)
    return bytes(out)
