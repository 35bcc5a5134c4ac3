"""Minimal unaligned-PER (UPER) bit stream reader/writer for the RRC subset."""
from __future__ import annotations


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits_left(self) -> int:
        return 8 * len(self.data) - self.pos

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v

    def read_bytes(self, n: int) -> bytes:
        return bytes(self.read(8) for _ in range(n))


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_bytes(self, b: bytes):
        for x in b:
            self.write(x, 8)

    def to_bytes(self) -> bytes:
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)
