"""Pure-Python LZ4 frame codec (vofod_tpu/io/lz4_lite.py).

The decoder is exercised three ways: hand-crafted byte sequences written
straight from the LZ4 block/frame specs (so a self-consistent
encoder+decoder bug cannot hide), round-trips through the greedy encoder,
and the rosbag chunk path ("lz4"-compressed bags with no lz4 package
installed — the capability this codec exists for; ref bags are recorded
with ``rosbag record --lz4``, SURVEY.md §4 rosbag replay)."""

import struct

import numpy as np
import pytest

from vofod_tpu.io import lz4_lite
from vofod_tpu.io.lz4_lite import (
    compress,
    compress_block,
    decompress,
    decompress_block,
    xxh32,
)


class TestXxh32:
    def test_known_vectors(self):
        # published reference values (xxHash repo / ports' test suites)
        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"abc") == 0x32D153FF

    def test_seed_changes_hash(self):
        assert xxh32(b"abc", seed=1) != xxh32(b"abc")

    def test_all_length_paths(self):
        # <16 (no lane loop), 16..19 (lane loop + tail), long
        data = bytes(range(256)) * 5
        seen = {xxh32(data[:n]) for n in (0, 3, 4, 15, 16, 17, 31, 32, 1280)}
        assert len(seen) == 9  # all distinct — every code path produced output


class TestBlockDecode:
    """Byte sequences written from the LZ4 block spec, not from the encoder."""

    def test_literals_only(self):
        out = bytearray()
        decompress_block(bytes([0x50]) + b"hello", out)
        assert out == b"hello"

    def test_overlapping_match(self):
        # 3 literals "abc", then match offset=3 len=8 -> "abcabcabcab"
        out = bytearray()
        decompress_block(bytes([0x34]) + b"abc" + struct.pack("<H", 3), out)
        assert out == b"abcabcabcab"

    def test_rle_offset_one(self):
        # 1 literal "x", match offset=1 len=10 -> "x" * 11
        out = bytearray()
        decompress_block(bytes([0x16]) + b"x" + struct.pack("<H", 1), out)
        assert out == b"x" * 11

    def test_extended_literal_and_match_lengths(self):
        lit = (bytes(range(256)) * 2)[:270]  # needs 15 + 255 + 0 encoding
        seq = bytes([0xFF]) + bytes([255, 0]) + lit  # token: ll=15, ml=15+4
        seq += struct.pack("<H", 270) + bytes([10])  # match len 4+15+10 = 29
        out = bytearray()
        decompress_block(seq, out)
        want = lit + (lit * 2)[:29]
        assert out == want

    def test_zero_offset_rejected(self):
        with pytest.raises(ValueError, match="zero match offset"):
            decompress_block(
                bytes([0x14]) + b"x" + struct.pack("<H", 0), bytearray()
            )

    def test_offset_past_start_rejected(self):
        with pytest.raises(ValueError, match="before the window"):
            decompress_block(
                bytes([0x14]) + b"x" + struct.pack("<H", 7), bytearray()
            )

    def test_history_for_dependent_blocks(self):
        # out already holds "abcdefgh"; block is one match reaching into it
        # (token 0x00: no literals, match len 4)
        out = bytearray(b"abcdefgh")
        decompress_block(bytes([0x00]) + struct.pack("<H", 8), out)
        assert out == b"abcdefghabcd"


def _frame(
    blocks,
    *,
    independent=True,
    block_checksum=False,
    content_checksum=False,
    content=b"",
):
    """Hand-assemble an LZ4 frame from (data, stored) block tuples."""
    flg = 0x40 | (0x20 if independent else 0)
    flg |= (0x10 if block_checksum else 0) | (0x04 if content_checksum else 0)
    desc = bytes([flg, 0x40])  # block max size id 4 (64 KB)
    out = struct.pack("<I", lz4_lite.MAGIC) + desc
    out += bytes([(xxh32(desc) >> 8) & 0xFF])
    for data, stored in blocks:
        out += struct.pack("<I", len(data) | (0x80000000 if stored else 0))
        out += data
        if block_checksum:
            out += struct.pack("<I", xxh32(data))
    out += struct.pack("<I", 0)
    if content_checksum:
        out += struct.pack("<I", xxh32(content))
    return out


class TestFrameDecode:
    def test_stored_blocks(self):
        buf = _frame([(b"hello ", True), (b"world", True)])
        assert decompress(buf) == b"hello world"

    def test_block_dependent_frame(self):
        # roslz4 writes dependent blocks: block 2's match reaches into
        # block 1's output (offset 8 at position 0 of block 2)
        b1 = bytes([0x80]) + b"abcdefgh"
        b2 = bytes([0x00]) + struct.pack("<H", 8)
        buf = _frame([(b1, False), (b2, False)], independent=False)
        assert decompress(buf) == b"abcdefghabcd"

    def test_checksums_verified(self):
        content = b"hello " + b"world"
        buf = _frame(
            [(b"hello ", True), (b"world", True)],
            block_checksum=True,
            content_checksum=True,
            content=content,
        )
        assert decompress(buf) == content
        # corrupt one payload byte -> block checksum must catch it
        bad = bytearray(buf)
        bad[11] ^= 0xFF  # first byte of first block's data
        with pytest.raises(ValueError, match="checksum"):
            decompress(bytes(bad))

    def test_header_checksum_verified(self):
        buf = bytearray(_frame([(b"x", True)]))
        buf[6] ^= 0xFF  # the HC byte
        with pytest.raises(ValueError, match="header checksum"):
            decompress(bytes(buf))

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="bad magic"):
            decompress(struct.pack("<I", 0xDEADBEEF) + b"\x00" * 8)

    def test_skippable_frame_ignored(self):
        skip = struct.pack("<II", 0x184D2A50, 4) + b"junk"
        buf = skip + _frame([(b"data", True)])
        assert decompress(buf) == b"data"

    def test_concatenated_frames(self):
        buf = _frame([(b"one", True)]) + _frame([(b"two", True)])
        assert decompress(buf) == b"onetwo"

    def test_content_size_field_skipped(self):
        desc = bytes([0x68, 0x40]) + struct.pack("<Q", 4)  # C.Size flag set
        buf = struct.pack("<I", lz4_lite.MAGIC) + desc
        buf += bytes([(xxh32(desc) >> 8) & 0xFF])
        buf += struct.pack("<I", 4 | 0x80000000) + b"data"
        buf += struct.pack("<I", 0)
        assert decompress(buf) == b"data"


class TestRoundTrip:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"short",
            b"a" * 100_000,  # extreme RLE
            bytes(range(256)) * 512,  # structured, repetitive
            np.random.default_rng(0).bytes(100_000),  # incompressible
            b"the quick brown fox jumps over the lazy dog " * 2048,
        ],
        ids=["empty", "short", "rle", "structured", "random", "text"],
    )
    def test_frame_roundtrip(self, data):
        assert decompress(compress(data)) == data

    def test_empty_input_emits_no_data_block(self):
        """The spec reserves Block_Size 0 for the EndMark, so an empty input
        must be header + EndMark only — a zero-size stored block (size word
        0x80000000) would be rejected by strict liblz4 decoders."""
        buf = compress(b"")
        assert len(buf) == 4 + 2 + 1 + 4  # magic, FLG+BD, HC, EndMark
        assert buf[-4:] == b"\x00\x00\x00\x00"
        assert decompress(buf) == b""

    def test_compression_actually_compresses(self):
        data = b"abcdefgh" * 10_000
        assert len(compress(data)) < len(data) // 10

    def test_block_spec_end_conditions(self):
        """Greedy encoder must keep the last 5 bytes literal and start no
        match in the final 12 bytes (LZ4 block spec)."""
        rng = np.random.default_rng(1)
        for n in (12, 13, 14, 20, 64, 1000):
            base = rng.bytes(max(n // 2, 6))
            data = (base * (n // len(base) + 2))[:n]
            out = bytearray()
            decompress_block(compress_block(data), out)
            assert out == data, f"n={n}"

    def test_multiblock_frame(self, monkeypatch):
        monkeypatch.setattr(lz4_lite, "_BLOCK_SIZE", 1024)
        data = bytes(range(256)) * 40  # 10240 bytes -> 10 blocks
        buf = compress(data)
        monkeypatch.undo()
        assert decompress(buf) == data


class TestRosbagLz4:
    def test_lz4_bag_roundtrip(self, tmp_path):
        """A bag written with lz4 chunks reads back with no lz4 package
        installed (the capability gap this codec closes)."""
        from vofod_tpu.io.rosbag_lite import BagWriter, read_bag

        path = str(tmp_path / "test_lz4.bag")
        w = BagWriter(path, compression="lz4")
        r = (np.arange(64, dtype=np.uint32) * 100).reshape(8, 8)
        w.write_pointcloud2(
            "/points", 1.5, frame_id="os_sensor", height=8, width=8,
            fields=[("range", 0, 6, 1)], point_step=4,
            data=r.astype("<u4").tobytes(),
        )
        w.write_tf("/tf", 1.4, [dict(
            stamp=1.4, parent="world", child="os_sensor",
            txyz=(1.0, 2.0, 3.0), quat=(0.0, 0.0, 0.0, 1.0),
        )])
        w.close()
        msgs = list(read_bag(path))
        assert {m.topic for m in msgs} == {"/points", "/tf"}
        cloud = next(m for m in msgs if m.topic == "/points").msg
        got = cloud.extract(("range",))["range"].reshape(8, 8)
        np.testing.assert_array_equal(got, r)
