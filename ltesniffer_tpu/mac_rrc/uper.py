"""Unaligned-PER (UPER, X.691) bit stream reader/writer for the RRC codec.

Implements the encoding primitives the 36.331 rel-8 grammar subset needs:
constrained whole numbers, extensible enumerations/choices (normally-small
numbers), unconstrained length determinants, octet strings.
"""
from __future__ import annotations


def _bits_for(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits_left(self) -> int:
        return 8 * len(self.data) - self.pos

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise IndexError("bit stream exhausted")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v

    def read_bytes(self, n: int) -> bytes:
        return bytes(self.read(8) for _ in range(n))

    # -- X.691 primitives -------------------------------------------------
    def read_constrained(self, lo: int, hi: int) -> int:
        """Constrained whole number (11.5): lo..hi in ceil(log2(range)) bits."""
        if hi == lo:
            return lo
        return lo + self.read(_bits_for(hi - lo + 1))

    def read_length(self) -> int:
        """Unconstrained length determinant (10.9, fragmentation unsupported)."""
        b = self.read(8)
        if b < 0x80:
            return b
        if b < 0xC0:
            return ((b & 0x3F) << 8) | self.read(8)
        raise ValueError("fragmented length not supported")

    def read_normally_small(self) -> int:
        """Normally-small non-negative number (10.6): extension indices."""
        if self.read(1) == 0:
            return self.read(6)
        n = self.read_length()
        return self.read(8 * n)

    def read_enum(self, n_root: int, extensible: bool = False) -> int:
        """Enumerated value index (13); extension values return n_root."""
        if extensible and self.read(1):
            self.read_normally_small()
            return n_root          # unknown extension value marker
        return self.read(_bits_for(n_root))

    def read_choice(self, n_root: int, extensible: bool = False) -> int:
        """CHOICE index (23); extension alternatives are SKIPPED (their open
        type value is consumed) and n_root is returned."""
        if extensible and self.read(1):
            self.read_normally_small()
            n = self.read_length()
            self.read_bytes(n)
            return n_root
        if n_root == 1:
            return 0
        return self.read(_bits_for(n_root))

    def read_octet_string(self, lo: int | None = None,
                          hi: int | None = None) -> bytes:
        """OCTET STRING; fixed size if lo==hi, else length-determined."""
        if lo is not None and lo == hi:
            return self.read_bytes(lo)
        if lo is not None and hi is not None:
            return self.read_bytes(self.read_constrained(lo, hi))
        return self.read_bytes(self.read_length())

    def skip_open_type(self):
        """Extension addition / open type: length determinant + octets."""
        n = self.read_length()
        self.read_bytes(n)


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_bytes(self, b: bytes):
        for x in b:
            self.write(x, 8)

    # -- X.691 primitives -------------------------------------------------
    def write_constrained(self, v: int, lo: int, hi: int):
        if hi == lo:
            return
        self.write(v - lo, _bits_for(hi - lo + 1))

    def write_length(self, n: int):
        if n < 0x80:
            self.write(n, 8)
        elif n < 0x4000:
            self.write(0x8000 | n, 16)
        else:
            raise ValueError("fragmented length not supported")

    def write_enum(self, idx: int, n_root: int, extensible: bool = False):
        if extensible:
            self.write(0, 1)
        self.write(idx, _bits_for(n_root))

    def write_choice(self, idx: int, n_root: int, extensible: bool = False):
        if extensible:
            self.write(0, 1)
        if n_root > 1:
            self.write(idx, _bits_for(n_root))

    def write_octet_string(self, b: bytes, lo: int | None = None,
                           hi: int | None = None):
        if lo is not None and lo == hi:
            self.write_bytes(b)
            return
        if lo is not None and hi is not None:
            self.write_constrained(len(b), lo, hi)
            self.write_bytes(b)
            return
        self.write_length(len(b))
        self.write_bytes(b)

    def to_bytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)
