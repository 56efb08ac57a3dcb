"""Property tests for the multimodal codecs (no Spark session needed —
these pin the pure kernels the Arrow passes call per payload):

- _parse_avi_frames round-trips randomly generated uncompressed AVIs
  (arbitrary frame counts/lengths including empty and odd-length frames,
  arbitrary dimensions) and never mis-parses RIFF padding;
- the audio_features fake-path statistics match an independent
  pure-Python reference on random byte planes (the numpy kernel is what
  the exactness-vs-DuckDB contract rides on)."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st


def _avi(width: int, height: int, frames: list[bytes]) -> bytes:
    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\0" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<14I", 33366, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@settings(max_examples=50, deadline=None)
@given(
    width=st.integers(min_value=0, max_value=4096),
    height=st.integers(min_value=0, max_value=4096),
    frames=st.lists(
        st.binary(min_size=0, max_size=64), min_size=0, max_size=12
    ),
)
def test_avi_roundtrip_random(width, height, frames):
    from tez_spark.operators.multimodal import _parse_avi_frames

    w, h, got, usec = _parse_avi_frames(_avi(width, height, frames))
    assert usec == 33366
    assert (w, h) == (width, height)
    assert got == frames


@settings(max_examples=50, deadline=None)
@given(payload=st.binary(min_size=0, max_size=512))
def test_audio_fake_stats_match_pure_python(payload):
    import math

    import numpy as np

    # the exact kernel audio_features' fake branch applies per payload
    x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    if len(x):
        rms = float(np.sqrt(np.mean(x * x)))
        zc = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if len(x) > 1
            else 0.0
        )
        peak = float(np.abs(x).max())
    else:
        rms = zc = peak = 0.0

    # independent pure-Python reference (no numpy reductions)
    vals = [(b - 128.0) / 128.0 for b in payload]
    if vals:
        ref_rms = math.sqrt(sum(v * v for v in vals) / len(vals))
        flips = sum(
            1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0)
        )
        ref_zc = flips / (len(vals) - 1) if len(vals) > 1 else 0.0
        ref_peak = max(abs(v) for v in vals)
    else:
        ref_rms = ref_zc = ref_peak = 0.0

    # EXACT equality — the dyadic-rational design means no float slack
    # is needed (see q_audio_features docstring): every partial is a
    # multiple of 1/16384 and sums stay exactly representable
    assert rms == ref_rms
    assert zc == ref_zc
    assert peak == ref_peak
