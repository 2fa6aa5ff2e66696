"""The multimodal decode hooks are feature-detected: REAL
Pillow/soundfile decode when importable, a clear NotImplementedError
when not. Both directions are tested — in this container the
libraries are absent, so the error branch runs; on a machine with
Pillow the real branch decodes and resizes an actual PNG. Either
way, the registered q_multimodal* queries never touch these hooks
(their synthetic path is oracle-checked independently)."""

from __future__ import annotations

import importlib.util

import pytest

from streamz_postgres_spark.operators.multimodal import (
    _RESIZE_H,
    _RESIZE_W,
    decode_audio,
    decode_image,
    resize_frame,
)

_HAS_PIL = importlib.util.find_spec("PIL") is not None
_HAS_SF = importlib.util.find_spec("soundfile") is not None


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: error branch n/a")
def test_decode_image_clear_error_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError):
        resize_frame(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(_HAS_SF, reason="soundfile installed: error branch n/a")
def test_decode_audio_clear_error_without_soundfile():
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"RIFF")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_decode_and_resize_real_png():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 6), (10, 20, 30)).save(buf, format="PNG")
    payload = buf.getvalue()

    img = decode_image(payload)
    assert img.size == (8, 6)
    raw = resize_frame(payload)
    assert len(raw) == _RESIZE_W * _RESIZE_H * 3


@pytest.mark.skipif(not _HAS_SF, reason="soundfile not installed")
def test_decode_real_wav():
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600, dtype="float32"), 16000, format="WAV")
    data, rate = decode_audio(buf.getvalue())
    assert rate == 16000 and len(data) == 1600


def test_stdlib_wav_decode_without_soundfile():
    """The WAV path must be a REAL decoder with zero dependencies:
    encode known 16-bit PCM with the stdlib wave module, decode
    through decode_audio, and get the samples and rate back exactly
    (soundfile, when present, takes the same payload through its own
    path — either way the contract holds)."""
    import io
    import wave

    import numpy as np

    samples = np.array([0, 1000, -1000, 32767, -32768, 7], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())

    got, rate = decode_audio(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(np.asarray(got).ravel().astype("i2"), samples)


@pytest.mark.skipif(_HAS_SF, reason="soundfile installed: ladder n/a")
def test_non_wav_payload_still_raises_without_soundfile():
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"\x00\x01\x02\x03 not riff")


def test_stdlib_bmp_roundtrip_exact():
    """encode_bmp/decode_bmp must be exact inverses for every row
    padding case (width % 4 in {0,1,2,3} gives pad 0..3 bytes), and
    the decoder must reject non-BMP payloads."""
    from streamz_postgres_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for w in (3, 4, 5, 6):
        h = 3
        rgb = bytes((i * 7 + w) % 256 for i in range(w * h * 3))
        payload = encode_bmp(w, h, rgb)
        assert payload[:2] == b"BM"
        gw, gh, grgb = decode_bmp(payload)
        assert (gw, gh) == (w, h)
        assert grgb == rgb, f"width {w}: decode is not the inverse"
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_stdlib_bmp_agrees_with_pillow():
    """When Pillow IS present, its independent BMP decoder must read
    our encoder's output back to the same pixels — third-party
    confirmation the stdlib codec writes genuine BMPs."""
    import io

    from PIL import Image

    from streamz_postgres_spark.operators.multimodal import encode_bmp

    w, h = 5, 4
    rgb = bytes((i * 11) % 256 for i in range(w * h * 3))
    img = Image.open(io.BytesIO(encode_bmp(w, h, rgb)))
    assert img.size == (w, h)
    assert img.convert("RGB").tobytes() == rgb


def test_stdlib_wav_stereo_matches_soundfile_shape():
    """Round-7 review find: the stdlib WAV path must return
    (n_frames, channels) for multichannel audio like soundfile does,
    not a flat interleaved array twice as long."""
    import io
    import wave

    import numpy as np

    left = np.array([100, 200, 300], dtype="<i2")
    right = np.array([-1, -2, -3], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    got, rate = decode_audio(buf.getvalue())
    arr = np.asarray(got)
    assert rate == 8000
    assert arr.shape == (3, 2)
    assert np.array_equal(arr[:, 0].astype("i2"), left)
    assert np.array_equal(arr[:, 1].astype("i2"), right)
