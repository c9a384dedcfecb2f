"""RIFF-WAV / NIST-SPHERE reader tests: round-trips, G.711, headers,
resampling — the raw-corpus ingestion path (SURVEY.md C12/C13)."""
import os
import struct

import numpy as np
import pytest

from tpu_ctc.data import audio_io


def tone(n=8000, rate=16000, hz=440.0, amp=0.5):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


class TestWav:
    def test_pcm16_roundtrip(self, tmp_path):
        x = tone()
        p = str(tmp_path / "a.wav")
        audio_io.write_wav(p, x, 16000)
        y, rate = audio_io.read_wav(p)
        assert rate == 16000 and len(y) == len(x)
        assert np.max(np.abs(y - x)) < 2.0 / 32768

    def test_pcm_bit_depths(self, tmp_path):
        x = tone(n=400)
        for bits, encode in [
            (8, lambda v: ((v * 127 + 128).astype(np.uint8)).tobytes()),
            (24, lambda v: b"".join(
                int(s).to_bytes(3, "little", signed=True)
                for s in np.round(v * ((1 << 23) - 1)).astype(np.int64))),
            (32, lambda v: (v * ((1 << 31) - 1)).astype("<i4").tobytes()),
        ]:
            p = str(tmp_path / f"pcm{bits}.wav")
            data = encode(x)
            _write_raw_wav(p, data, fmt_tag=1, bits=bits, rate=8000)
            y, rate = audio_io.read_wav(p)
            assert rate == 8000
            tol = {8: 2 / 100, 24: 1e-6, 32: 1e-6}[bits]
            assert np.max(np.abs(y - x)) < tol, bits

    def test_float32(self, tmp_path):
        x = tone(n=300)
        p = str(tmp_path / "f32.wav")
        _write_raw_wav(p, x.astype("<f4").tobytes(), fmt_tag=3, bits=32)
        y, _ = audio_io.read_wav(p)
        np.testing.assert_allclose(y, x, atol=1e-7)

    def test_stereo_to_mono(self, tmp_path):
        left, right = tone(n=200, hz=300), tone(n=200, hz=600)
        inter = np.stack([left, right], axis=1).reshape(-1)
        p = str(tmp_path / "st.wav")
        _write_raw_wav(p, (inter * 32767).astype("<i2").tobytes(),
                       fmt_tag=1, bits=16, channels=2)
        y, _ = audio_io.read_wav(p)
        assert len(y) == 200
        np.testing.assert_allclose(y, (left + right) / 2, atol=1e-3)
        y0, _ = audio_io.read_wav(p, channel=0)
        np.testing.assert_allclose(y0, left, atol=1e-3)

    def test_extensible_and_extra_chunks(self, tmp_path):
        # WAVE_FORMAT_EXTENSIBLE with a LIST chunk before fmt/data.
        x = (tone(n=150) * 32767).astype("<i2")
        fmt = struct.pack("<HHIIHHH", 0xFFFE, 1, 16000, 32000, 2, 16, 22)
        fmt += struct.pack("<HI", 16, 3) + struct.pack("<H", 1) + b"\x00" * 14
        chunks = (struct.pack("<4sI", b"LIST", 4) + b"INFO"
                  + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
                  + struct.pack("<4sI", b"data", len(x.tobytes()))
                  + x.tobytes())
        p = str(tmp_path / "ext.wav")
        with open(p, "wb") as f:
            f.write(struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE"))
            f.write(chunks)
        y, rate = audio_io.read_wav(p)
        assert rate == 16000 and len(y) == 150

    def test_mulaw_wav(self, tmp_path):
        x = tone(n=240, amp=0.3)
        codes = _mulaw_encode(x)
        p = str(tmp_path / "mu.wav")
        _write_raw_wav(p, codes.tobytes(), fmt_tag=7, bits=8, rate=8000)
        y, _ = audio_io.read_wav(p)
        assert np.max(np.abs(y - x)) < 0.02  # G.711 quantization noise

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.wav")
        open(p, "wb").write(b"garbagegarbage")
        with pytest.raises(ValueError):
            audio_io.read_wav(p)


class TestSphere:
    def test_pcm16_roundtrip(self, tmp_path):
        x = tone()
        p = str(tmp_path / "a.sph")
        audio_io.write_sphere(p, x, 16000)
        y, rate = audio_io.read_sphere(p)
        assert rate == 16000 and len(y) == len(x)
        assert np.max(np.abs(y - x)) < 2.0 / 32768

    def test_ulaw_roundtrip(self, tmp_path):
        x = tone(n=4000, rate=8000, amp=0.4)
        p = str(tmp_path / "u.sph")
        audio_io.write_sphere(p, x, 8000, coding="ulaw")
        y, rate = audio_io.read_sphere(p)
        assert rate == 8000
        assert np.max(np.abs(y - x)) < 0.02

    def test_big_endian_pcm(self, tmp_path):
        x = tone(n=500)
        pcm = (x * 32767).astype(">i2")
        header = (b"NIST_1A\n   1024\n"
                  b"channel_count -i 1\n"
                  b"sample_count -i 500\n"
                  b"sample_rate -i 16000\n"
                  b"sample_n_bytes -i 2\n"
                  b"sample_byte_format -s2 10\n"
                  b"sample_coding -s3 pcm\nend_head\n")
        p = str(tmp_path / "be.sph")
        with open(p, "wb") as f:
            f.write(header.ljust(1024, b" "))
            f.write(pcm.tobytes())
        y, _ = audio_io.read_sphere(p)
        assert np.max(np.abs(y - x)) < 2.0 / 32768

    def test_shorten_rejected(self, tmp_path):
        header = (b"NIST_1A\n   1024\n"
                  b"sample_coding -s20 pcm,embedded-shorten\nend_head\n")
        p = str(tmp_path / "sh.sph")
        with open(p, "wb") as f:
            f.write(header.ljust(1024, b" ") + b"\x00" * 64)
        with pytest.raises(ValueError, match="shorten"):
            audio_io.read_sphere(p)


class TestDispatchAndInfo:
    def test_read_audio_dispatch(self, tmp_path):
        x = tone(n=1000)
        wav, sph, npy = (str(tmp_path / n) for n in ("a.bin", "b.bin", "c.bin"))
        audio_io.write_wav(wav, x, 16000)
        audio_io.write_sphere(sph, x, 16000)
        np.save(open(npy, "wb"), x)
        for p in (wav, sph, npy):
            y, rate = audio_io.read_audio(p, target_rate=16000)
            assert rate == 16000 and len(y) == 1000

    def test_audio_info_header_only(self, tmp_path):
        x = tone(n=777, rate=8000)
        wav = str(tmp_path / "a.wav")
        sph = str(tmp_path / "a.sph")
        audio_io.write_wav(wav, x, 8000)
        audio_io.write_sphere(sph, x, 8000, coding="ulaw")
        assert audio_io.audio_info(wav) == (777, 8000)
        assert audio_io.audio_info(sph) == (777, 8000)
        # target-rate conversion matches the actual resampled length
        n16 = audio_io.num_samples(wav, target_rate=16000)
        y, _ = audio_io.read_audio(wav, target_rate=16000)
        assert n16 == len(y)

    def test_resample_preserves_tone(self):
        rate_in, rate_out, hz = 8000, 16000, 440.0
        x = tone(n=4000, rate=rate_in, hz=hz)
        y = audio_io.resample(x, rate_in, rate_out)
        assert len(y) == 8000
        # The upsampled signal should match the directly synthesized tone
        # away from the edges.
        ref = tone(n=8000, rate=rate_out, hz=hz)
        core = slice(200, -200)
        assert np.max(np.abs(y[core] - ref[core])) < 5e-3

    def test_resample_downsample_antialias(self):
        # A 7 kHz tone at 16 kHz must vanish after resampling to 8 kHz
        # (above the 4 kHz Nyquist) instead of aliasing into band.
        x = tone(n=4000, rate=16000, hz=7000.0)
        y = audio_io.resample(x, 16000, 8000)
        assert np.sqrt(np.mean(y[100:-100] ** 2)) < 0.02


def _write_raw_wav(path, data, fmt_tag, bits, rate=16000, channels=1):
    block = channels * max(1, bits // 8)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE"))
        f.write(struct.pack("<4sI", b"fmt ", 16))
        f.write(struct.pack("<HHIIHH", fmt_tag, channels, rate,
                            rate * block, block, bits))
        f.write(struct.pack("<4sI", b"data", len(data)))
        f.write(data)
        if len(data) & 1:
            f.write(b"\x00")


def _mulaw_encode(x):
    order = np.argsort(audio_io._MULAW)
    idx = np.searchsorted(audio_io._MULAW[order], x).clip(1, 255)
    left, right = order[idx - 1], order[idx]
    pick = np.where(
        np.abs(audio_io._MULAW[left] - x) <= np.abs(audio_io._MULAW[right] - x),
        left, right)
    return pick.astype(np.uint8)
