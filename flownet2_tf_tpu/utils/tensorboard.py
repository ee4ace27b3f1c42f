"""Minimal TensorBoard event writer (no TensorFlow dependency).

The reference's only observability was TensorBoard scalar + image
summaries via slim (reference ``src/net.py`` train() summaries). This
module writes the same artifact — ``events.out.tfevents.*`` files —
using the framework's own protobuf wire-format and TFRecord framing
helpers (data/tfrecord.py): Event{wall_time, step, summary{value{tag,
simple_value | image}}}. Readable by any stock TensorBoard.
"""

from __future__ import annotations

import os
import socket
import struct
import time
import zlib

import numpy as np

from flownet2_tf_tpu.data.tfrecord import (
    _field_header,
    _length_delimited,
    _masked_crc,
    _write_varint,
)


def _double_field(field: int, value: float) -> bytes:
    return _field_header(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _field_header(field, 5) + struct.pack("<f", value)


def _varint_field(field: int, value: int) -> bytes:
    return _field_header(field, 0) + _write_varint(value)


def encode_png8(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 -> PNG bytes (filter 0, zlib)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


class SummaryWriter:
    """Append-only TensorBoard event-file writer."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}"
        )
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "ab")
        # header event: wall_time + file_version
        header = _double_field(1, time.time()) + _length_delimited(
            3, b"brain.Event:2"
        )
        self._write_record(header)

    def _write_record(self, payload: bytes):
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def _event(self, step: int, summary: bytes):
        event = (
            _double_field(1, time.time())
            + _varint_field(2, int(step))
            + _length_delimited(5, summary)
        )
        self._write_record(event)

    def scalar(self, tag: str, value: float, step: int):
        val = _length_delimited(1, tag.encode()) + _float_field(
            2, float(value)
        )
        self._event(step, _length_delimited(1, val))

    def scalars(self, metrics: dict, step: int):
        summary = b""
        for tag, value in metrics.items():
            val = _length_delimited(1, tag.encode()) + _float_field(
                2, float(value)
            )
            summary += _length_delimited(1, val)
        self._event(step, summary)

    def image(self, tag: str, array: np.ndarray, step: int):
        """array: (H, W, 3) uint8 (e.g. flowlib.flow_to_image output)."""
        png = encode_png8(array)
        image_proto = (
            _varint_field(1, array.shape[0])
            + _varint_field(2, array.shape[1])
            + _varint_field(3, 3)
            + _length_delimited(4, png)
        )
        val = _length_delimited(1, tag.encode()) + _length_delimited(
            4, image_proto
        )
        self._event(step, _length_delimited(1, val))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()
