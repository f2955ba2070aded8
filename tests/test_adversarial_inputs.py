"""Adversarial-input tests for the pure-Python ingest decoders (round-3
verdict weak #4): io/lz4_lite and io/rosbag_lite face real-world, possibly
truncated or corrupt files — every malformed input must raise a clean
ValueError (never IndexError / struct.error, never a hang, never a silent
overread into unrelated bytes).

Plus a randomized round-trip property fuzz (compressible, incompressible and
empty payloads; multi-block frames via a shrunken block size) for the LZ4
codec and the bag writer/reader pair.
"""

import struct

import numpy as np
import pytest

from vofod_tpu.io import lz4_lite, rosbag_lite
from vofod_tpu.io.lz4_lite import MAGIC, compress, decompress, xxh32
from vofod_tpu.io.rosbag_lite import (
    BagWriter,
    _read_record,
    deserialize_pointcloud2,
    read_bag,
)


def frame(
    blocks,
    *,
    flg_extra=0x00,
    independent=True,
    content_size=None,
    content_checksum=None,
    end_mark=True,
):
    """Hand-assemble an LZ4 frame from (stored: bool, payload: bytes) blocks
    so corrupt variants of every descriptor field can be authored."""
    flg = 0x40 | (0x20 if independent else 0x00) | flg_extra
    desc = bytearray([flg, 0x70])
    if content_size is not None:
        desc[0] |= 0x08
        desc += struct.pack("<Q", content_size)
    out = bytearray(struct.pack("<I", MAGIC))
    out += desc
    out.append((xxh32(bytes(desc)) >> 8) & 0xFF)
    for stored, payload in blocks:
        word = len(payload) | (0x80000000 if stored else 0)
        out += struct.pack("<I", word)
        out += payload
        if flg_extra & 0x10:  # block checksum present
            out += struct.pack("<I", xxh32(payload))
    if end_mark:
        out += struct.pack("<I", 0)
    if content_checksum is not None:
        desc_flg_pos = 4
        out[desc_flg_pos] |= 0x04
        # re-stamp the header checksum for the changed FLG
        desc_len = len(desc)
        out[4 + desc_len] = (xxh32(bytes(out[4 : 4 + desc_len])) >> 8) & 0xFF
        out += struct.pack("<I", content_checksum)
    return bytes(out)


class TestLz4Corrupt:
    PAYLOAD = b"the quick brown fox jumps over the lazy dog " * 40

    def test_truncated_everywhere(self):
        """Cutting a valid frame at EVERY byte boundary raises ValueError —
        no truncation point may hang, overread or return silently.  (Cut 0 —
        empty input — decodes to b"", the empty concatenation of frames.)"""
        buf = compress(self.PAYLOAD)
        assert decompress(buf) == self.PAYLOAD
        assert decompress(b"") == b""
        for cut in range(1, len(buf) - 1):
            with pytest.raises(ValueError):
                decompress(buf[:cut])

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="bad magic"):
            decompress(struct.pack("<I", 0xDEADBEEF) + b"\x00" * 8)

    def test_unsupported_version(self):
        buf = bytearray(compress(b"x" * 100))
        buf[4] = (buf[4] & 0x3F) | 0x80  # version 10
        # version check fires before the (now stale) header checksum
        with pytest.raises(ValueError, match="version"):
            decompress(bytes(buf))

    def test_bad_block_size_id(self):
        desc = bytes([0x60, 0x00])  # bd id 0 is reserved
        buf = struct.pack("<I", MAGIC) + desc + bytes(
            [(xxh32(desc) >> 8) & 0xFF]
        )
        with pytest.raises(ValueError, match="block-size id"):
            decompress(buf + struct.pack("<I", 0))

    def test_header_checksum_mismatch(self):
        buf = bytearray(compress(b"x" * 100))
        buf[6] ^= 0xFF  # the HC byte
        with pytest.raises(ValueError, match="header checksum"):
            decompress(bytes(buf))

    def test_block_checksum_mismatch(self):
        good = frame([(True, b"stored-payload")], flg_extra=0x10)
        assert decompress(good) == b"stored-payload"
        bad = bytearray(good)
        bad[-5] ^= 0x01  # flip a bit in the trailing block checksum
        with pytest.raises(ValueError, match="block checksum"):
            decompress(bytes(bad))

    def test_content_checksum_mismatch(self):
        data = b"payload-under-checksum"
        good = frame([(True, data)], content_checksum=xxh32(data))
        assert decompress(good) == data
        bad = frame([(True, data)], content_checksum=xxh32(data) ^ 1)
        with pytest.raises(ValueError, match="content checksum"):
            decompress(bad)

    def test_lying_content_size(self):
        data = b"sized-payload"
        good = frame([(True, data)], content_size=len(data))
        assert decompress(good) == data
        for lie in (0, len(data) - 1, len(data) + 1, 1 << 40):
            bad = frame([(True, data)], content_size=lie)
            with pytest.raises(ValueError, match="content size"):
                decompress(bad)

    # a compressed block: 4 literals b"WXYZ", then a 4-byte match at offset 8
    # (reaches 4 bytes BEFORE this block's own output start)
    CROSS_BLOCK = bytes([0x40]) + b"WXYZ" + struct.pack("<H", 8)

    def test_match_before_window_independent(self):
        """In a block-INDEPENDENT frame a match may not reach into earlier
        blocks' output — corrupt offsets must raise, not copy history."""
        buf = frame(
            [(True, b"abcdefgh"), (False, self.CROSS_BLOCK)], independent=True
        )
        with pytest.raises(ValueError, match="before the window"):
            decompress(buf)

    def test_match_into_history_dependent(self):
        """The SAME bytes in a block-DEPENDENT frame are legal: the match
        copies from the previous block (how roslz4 chains blocks)."""
        buf = frame(
            [(True, b"abcdefgh"), (False, self.CROSS_BLOCK)], independent=False
        )
        assert decompress(buf) == b"abcdefghWXYZefgh"

    def test_match_before_output_start(self):
        buf = frame([(False, self.CROSS_BLOCK)], independent=False)
        with pytest.raises(ValueError, match="before the window"):
            decompress(buf)

    def test_zero_match_offset(self):
        blk = bytes([0x40]) + b"WXYZ" + struct.pack("<H", 0)
        with pytest.raises(ValueError, match="zero match offset"):
            decompress(frame([(False, blk)]))

    def test_literal_run_past_block_end(self):
        blk = bytes([0xF0, 0xFF])  # 15+255+... literal length, then nothing
        with pytest.raises(ValueError, match="literal"):
            decompress(frame([(False, blk)]))
        blk = bytes([0x50]) + b"ab"  # declares 5 literals, provides 2
        with pytest.raises(ValueError, match="literal run past end"):
            decompress(frame([(False, blk)]))

    def test_truncated_match_fields(self):
        # one offset byte where two are needed (a bare trailing token is the
        # legal literals-only last sequence, so the cut must land mid-offset)
        blk = bytes([0x04, 0x08])
        with pytest.raises(ValueError, match="truncated match offset"):
            decompress(frame([(False, blk)]))
        # offset ok, but the 15+ match-length extension never terminates
        blk = bytes([0x0F]) + struct.pack("<H", 1) + bytes([0xFF])
        with pytest.raises(ValueError, match="truncated match length"):
            decompress(frame([(False, blk)]))

    def test_skippable_frames(self):
        data = b"after-skippable"
        skip = struct.pack("<II", 0x184D2A50, 6) + b"ABCDEF"
        assert decompress(skip + frame([(True, data)])) == data
        with pytest.raises(ValueError, match="truncated skippable"):
            decompress(struct.pack("<II", 0x184D2A50, 100) + b"short")

    def test_lying_block_size(self):
        buf = frame([(True, b"abc")])
        # inflate the block-size word so it overruns the buffer
        bad = bytearray(buf)
        struct.pack_into("<I", bad, 7, 1000 | 0x80000000)
        with pytest.raises(ValueError, match="truncated block"):
            decompress(bytes(bad))


class TestLz4RoundTripFuzz:
    def test_round_trip_property(self):
        """compressible / incompressible / empty / structured payloads,
        plus multi-block frames (block size shrunk to make >1 block cheap)."""
        rng = np.random.default_rng(20260819)
        payloads = [b"", b"a", b"ab" * 7, bytes(rng.integers(0, 4, 10_000, dtype=np.uint8))]
        for n in (13, 100, 5_000, 60_000):
            payloads.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
            payloads.append(bytes(rng.integers(0, 3, n, dtype=np.uint8)))
            base = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
            payloads.append((base * (n // 64 + 1))[:n])
        for p in payloads:
            assert decompress(compress(p)) == p, f"round-trip failed n={len(p)}"

    def test_multi_block_round_trip(self, monkeypatch):
        monkeypatch.setattr(lz4_lite, "_BLOCK_SIZE", 1024)
        rng = np.random.default_rng(7)
        for kind in ("compressible", "incompressible"):
            hi = 4 if kind == "compressible" else 256
            p = bytes(rng.integers(0, hi, 10_000, dtype=np.uint8))
            buf = lz4_lite.compress(p)
            assert decompress(buf) == p


def _valid_bag(tmp_path, compression="none"):
    path = str(tmp_path / f"fixture_{compression}.bag")
    with BagWriter(path, compression=compression) as w:
        pts = np.arange(12, dtype=np.float32).tobytes()
        w.write_pointcloud2(
            "/os_cloud_node/points",
            1.0,
            frame_id="os_sensor",
            height=2,
            width=3,
            fields=[("x", 0, 7, 1), ("y", 4, 7, 1)],
            point_step=8,
            data=pts[: 8 * 6],
        )
        w.write_tf(
            "/tf",
            1.0,
            [dict(stamp=1.0, parent="world", child="os_sensor",
                  txyz=(0.0, 0.0, 1.0), quat=(0.0, 0.0, 0.0, 1.0))],
        )
    with open(path, "rb") as f:
        return path, f.read()


class TestRosbagCorrupt:
    def test_not_a_bag(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"#NOTABAG\n" + b"\x00" * 64)
        with pytest.raises(ValueError, match="not a rosbag"):
            list(read_bag(str(p)))

    def test_truncated_at_every_record_boundary(self, tmp_path):
        """Truncate the bag at a sweep of byte offsets: each either raises
        ValueError or yields a clean prefix of the messages — never
        struct.error / IndexError / a hang."""
        path, buf = _valid_bag(tmp_path)
        n_msgs = len(list(read_bag(path)))
        assert n_msgs == 2
        p = tmp_path / "cut.bag"
        for cut in range(len(rosbag_lite.MAGIC) + 1, len(buf), 7):
            p.write_bytes(buf[:cut])
            try:
                msgs = list(read_bag(str(p)))
                assert len(msgs) <= n_msgs
            except ValueError:
                pass

    def test_lying_record_data_length(self, tmp_path):
        path, buf = _valid_bag(tmp_path)
        i = len(rosbag_lite.MAGIC)
        (hl,) = struct.unpack_from("<I", buf, i)
        bad = bytearray(buf)
        struct.pack_into("<I", bad, i + 4 + hl, 1 << 30)  # data length lies
        p = tmp_path / "lie.bag"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="overruns"):
            list(read_bag(str(p)))

    def test_corrupt_header_field_length(self, tmp_path):
        path, buf = _valid_bag(tmp_path)
        i = len(rosbag_lite.MAGIC)
        bad = bytearray(buf)
        struct.pack_into("<I", bad, i + 4, 0xFFFF)  # first field length lies
        p = tmp_path / "field.bag"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="field length|overruns"):
            list(read_bag(str(p)))

    def _find_chunk(self, buf):
        """Offset of the chunk record (scan the top-level records)."""
        i = len(rosbag_lite.MAGIC)
        while i < len(buf):
            header, data, nxt = _read_record(buf, i)
            if header.get("op", b"\x00")[0] == rosbag_lite.OP_CHUNK:
                return i, header, data, nxt
            i = nxt
        raise AssertionError("no chunk record found")

    def test_lying_chunk_size_field(self, tmp_path):
        path, buf = _valid_bag(tmp_path)
        i, header, data, _ = self._find_chunk(buf)
        # the size field value sits inside the header fields; rewrite it
        pos = buf.index(b"size=", i) + len(b"size=")
        bad = bytearray(buf)
        struct.pack_into("<I", bad, pos, len(data) + 13)
        p = tmp_path / "chunk.bag"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="chunk size"):
            list(read_bag(str(p)))

    def test_corrupt_lz4_chunk(self, tmp_path):
        path, buf = _valid_bag(tmp_path, compression="lz4")
        assert len(list(read_bag(path))) == 2
        i, header, data, _ = self._find_chunk(buf)
        bad = bytearray(buf)
        # corrupt the lz4 frame's header-checksum byte (frame byte 6): the
        # codec must reject the chunk cleanly, not feed garbage downstream
        off = buf.index(data, i) + 6
        bad[off] ^= 0xFF
        p = tmp_path / "lz4.bag"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="header checksum"):
            list(read_bag(str(p)))

    def test_truncated_message_payload(self):
        pts = np.arange(12, dtype=np.float32).tobytes()
        good = rosbag_lite.serialize_pointcloud2(
            stamp=1.0, frame_id="s", height=2, width=3,
            fields=[("x", 0, 7, 1)], point_step=8, data=pts[:48],
        )
        assert deserialize_pointcloud2(good).width == 3
        for cut in range(len(good) - 1):
            with pytest.raises(ValueError):
                deserialize_pointcloud2(good[:cut])

    def test_message_missing_time(self, tmp_path):
        path, buf = _valid_bag(tmp_path)
        bad = bytearray(buf)
        # corrupt the 'time' key of the first message record inside the chunk
        pos = buf.index(b"time=")
        bad[pos : pos + 4] = b"tome"
        p = tmp_path / "time.bag"
        p.write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="time"):
            list(read_bag(str(p)))

    def test_round_trip_still_green(self, tmp_path):
        """The hardening must not reject valid bags (all three codecs)."""
        for comp in ("none", "bz2", "lz4"):
            path, _ = _valid_bag(tmp_path, compression=comp)
            msgs = list(read_bag(path))
            assert [m.msg_type for m in msgs] == [
                rosbag_lite.PC2_TYPE, rosbag_lite.TF_TYPE
            ]
            pc = msgs[0].msg
            cols = pc.extract(("x", "y"))
            assert cols["x"].shape == (6,)
