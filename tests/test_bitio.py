"""Bit cursor unit tests.

The five reference tests from ``tmc2-rs src/bitstream.rs:345-438`` ported
as the conformance floor, plus writer/reader roundtrip coverage.
"""

import pytest

from tpu_vpcc.bitio import Bitstream, BitstreamError, BitWriter


def test_bitstream_read():
    bs = Bitstream(bytes([0b10101010, 0b11110000, 0b11001001, 0b00110011]))
    assert bs.read(1) == 0b1
    assert bs.read(3) == 0b010
    assert bs.read(7) == 0b1010111
    assert bs.read(11) == 0b10000110010
    assert bs.read(4) == 0b0100
    assert bs.read(6) == 0b110011
    bs.reset()
    assert bs.read(8) == 0b10101010


def test_bitstream_peek():
    bs = Bitstream(bytes([0b10101010]))
    assert bs.peek(1) == 0b1
    assert bs.peek(1) == 0b1
    assert bs.peek(3) == 0b101
    assert bs.peek(3) == 0b101


def test_bitstream_read_uvlc():
    bs = Bitstream(
        bytes(
            [
                0b10100110, 0b01000010, 0b10011000, 0b11100010, 0b00000100,
                0b10001010, 0b00010110, 0b00110000, 0b01101000, 0b11100001,
                0b11100000,
            ]
        )
    )
    for expected in range(15):
        assert bs.read_uvlc() == expected


def test_bitstream_read_svlc():
    bs = Bitstream(
        bytes(
            [
                0b10100110, 0b01000010, 0b10011000, 0b11100010, 0b00000100,
                0b10001010, 0b00010110, 0b00110000, 0b01101000, 0b11100001,
                0b11100000,
            ]
        )
    )
    expected = [0, 1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 6, -6, 7, -7]
    for e in expected:
        assert bs.read_svlc() == e


def test_read_past_end_raises():
    bs = Bitstream(bytes([0xFF]))
    bs.read(8)
    with pytest.raises(BitstreamError):
        bs.read(1)


def test_read_over_32_raises():
    with pytest.raises(BitstreamError):
        Bitstream(b"\x00" * 8).read(33)


def test_byte_align_quirk():
    # byte_align consumes ONE bit, then skips to the boundary.
    bs = Bitstream(bytes([0b10000000, 0xAB]))
    bs.read(3)
    bs.byte_align()
    assert bs.tell() == (1, 0)
    assert bs.read(8) == 0xAB
    # aligned case: consumes exactly one bit then skips the rest of the byte
    bs = Bitstream(bytes([0x80, 0xCD]))
    bs.byte_align()
    assert bs.tell() == (1, 0)


def test_writer_roundtrip_bits():
    w = BitWriter()
    fields = [(1, 1), (0b010, 3), (0b1010111, 7), (0b10000110010, 11), (4, 4), (51, 6)]
    for value, bits in fields:
        w.write(value, bits)
    bs = Bitstream(w.getvalue())
    for value, bits in fields:
        assert bs.read(bits) == value


def test_writer_roundtrip_uvlc_svlc():
    w = BitWriter()
    for v in range(50):
        w.write_uvlc(v)
    for v in range(-25, 26):
        w.write_svlc(v)
    w.byte_align()
    bs = Bitstream(w.getvalue())
    for v in range(50):
        assert bs.read_uvlc() == v
    for v in range(-25, 26):
        assert bs.read_svlc() == v


def test_writer_byte_align_matches_reader():
    for prefix_bits in range(8):
        w = BitWriter()
        if prefix_bits:
            w.write((1 << prefix_bits) - 1, prefix_bits)
        w.byte_align()
        w.write(0x5A, 8)
        bs = Bitstream(w.getvalue())
        if prefix_bits:
            bs.read(prefix_bits)
        bs.byte_align()
        assert bs.read(8) == 0x5A
