"""Native FLAC decoder: differential tests against a pure-Python encoder.

The environment ships no FLAC tooling, so the fixtures are produced by a
minimal spec-correct encoder below (RFC 9639 subset: constant / verbatim /
fixed-order subframes, rice residuals, left-side & mid-side stereo). The
decoder under test is `native/flac/flac.cpp` via the ctypes binding; the
end-to-end tests prove a .flac file rides the int16 PCM device path
token-exactly vs the same audio as WAV (reference contract: AVAudioFile
decodes flac transparently inside `Shared/AudioConverter.swift:60-124`).
"""

from __future__ import annotations

import numpy as np
import pytest

from fluidaudio_tpu.native.flac import FlacError, decode_flac, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libfluidaudio_native.so not built"
)


# --------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def write_rice(self, v: int, k: int) -> None:
        u = 2 * v if v >= 0 else -2 * v - 1
        self.write_unary(u >> k)
        if k:
            self.write(u & ((1 << k) - 1), k)


def _utf8_number(bw: _BitWriter, n: int) -> None:
    if n < 0x80:
        bw.write(n, 8)
    else:  # 2-byte form covers every fixture here
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def _subframe_verbatim(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)  # no wasted bits
    for v in x:
        bw.write(int(v), bps)


def _subframe_constant(bw: _BitWriter, v: int, bps: int) -> None:
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(int(v), bps)


def _subframe_fixed(bw: _BitWriter, x: np.ndarray, bps: int, order: int,
                    k: int = 6) -> None:
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for i in range(order):
        bw.write(int(x[i]), bps)
    res = np.asarray(x, np.int64).copy()
    for _ in range(order):  # order-n fixed predictor = n-fold difference
        res = np.diff(res)
    bw.write(0, 2)   # rice method 0 (4-bit params)
    bw.write(0, 4)   # partition order 0
    bw.write(k, 4)
    for v in res:
        bw.write_rice(int(v), k)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 16_000,
    bps: int = 16,
    block: int = 256,
    subframe: str = "verbatim",
    stereo: str = "independent",
    total_in_streaminfo: bool = True,
) -> bytes:
    """Encode int PCM [n] or [n, ch] into a FLAC stream (test fixture)."""
    x = np.asarray(pcm, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape

    bw = _BitWriter()
    bw.bytes += b"fLaC"
    # STREAMINFO (last metadata block, type 0, length 34)
    bw.write(1, 1); bw.write(0, 7); bw.write(34, 24)
    bw.write(block, 16); bw.write(block, 16)
    bw.write(0, 24); bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(ch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(n if total_in_streaminfo else 0, 36)
    bw.write(0, 128)  # md5 unverified

    for fi, start in enumerate(range(0, n, block)):
        blk = x[start : start + block]
        bs = blk.shape[0]
        bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
        if bs == block and block == 256:
            bw.write(0b1000, 4)
            bs_tail = None
        else:
            bw.write(6, 4)  # 8-bit block-size-1 follows the coded number
            bs_tail = bs - 1
        bw.write(0, 4)  # sample rate from STREAMINFO
        if ch == 2 and stereo == "left-side":
            bw.write(8, 4)
        elif ch == 2 and stereo == "mid-side":
            bw.write(10, 4)
        else:
            bw.write(ch - 1, 4)
        bw.write(0b100 if bps == 16 else 0, 3)  # 16-bit or from STREAMINFO
        bw.write(0, 1)
        _utf8_number(bw, fi)
        if bs_tail is not None:
            bw.write(bs_tail, 8)
        bw.write(0, 8)  # header CRC-8 (decoder does not verify)

        if ch == 2 and stereo in ("left-side", "mid-side"):
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            first = left if stereo == "left-side" else (left + right) >> 1
            _subframe_verbatim(bw, first, bps)
            _subframe_verbatim(bw, side, bps + 1)
        else:
            for c in range(ch):
                col = blk[:, c]
                if subframe == "constant":
                    _subframe_constant(bw, col[0], bps)
                elif subframe.startswith("fixed"):
                    _subframe_fixed(bw, col, bps, order=int(subframe[-1]))
                else:
                    _subframe_verbatim(bw, col, bps)
        bw.align()
        bw.write(0, 16)  # frame CRC-16 (decoder does not verify)
    return bytes(bw.bytes)


def _pcm16(seed: int, n: int, ch: int = 1) -> np.ndarray:
    rng = np.random.RandomState(seed)
    shape = (n,) if ch == 1 else (n, ch)
    return (np.clip(rng.randn(*shape) * 0.1, -1, 1) * 32767.0).astype(np.int16)


# --------------------------------------------------------------- decode
def test_verbatim_mono_roundtrip():
    pcm = _pcm16(0, 1000)
    out, rate = decode_flac(encode_flac(pcm))
    assert rate == 16_000 and out.dtype == np.int16
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_partial_final_block_and_no_streaminfo_total():
    pcm = _pcm16(1, 777)  # 3 full blocks of 256 + 9-sample tail
    for total in (True, False):
        out, _ = decode_flac(encode_flac(pcm, total_in_streaminfo=total))
        np.testing.assert_array_equal(out[:, 0], pcm)


def test_constant_subframe():
    pcm = np.full(512, -12345, np.int16)
    out, _ = decode_flac(encode_flac(pcm, subframe="constant"))
    np.testing.assert_array_equal(out[:, 0], pcm)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_rice_residual(order):
    # smooth signal so higher-order residuals stay small
    t = np.arange(1500, dtype=np.float64)
    pcm = (3000 * np.sin(t * 0.02) + 500 * np.sin(t * 0.11)).astype(np.int16)
    out, _ = decode_flac(encode_flac(pcm, subframe=f"fixed{order}"))
    np.testing.assert_array_equal(out[:, 0], pcm)


@pytest.mark.parametrize("stereo", ["independent", "left-side", "mid-side"])
def test_stereo_decorrelation(stereo):
    pcm = _pcm16(2, 600, ch=2)
    pcm[:, 1] = (pcm[:, 0] * 0.7).astype(np.int16)  # correlated channels
    out, _ = decode_flac(encode_flac(pcm, stereo=stereo))
    assert out.shape == (600, 2)
    np.testing.assert_array_equal(out, pcm)


def test_24bit_rounds_down_to_16():
    rng = np.random.RandomState(3)
    pcm24 = rng.randint(-(1 << 23), 1 << 23, size=400, dtype=np.int64)
    out, _ = decode_flac(encode_flac(pcm24, bps=24))
    np.testing.assert_array_equal(out[:, 0], (pcm24 >> 8).astype(np.int16))


def test_error_paths():
    with pytest.raises(FlacError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE" + b"\x00" * 64)
    good = encode_flac(_pcm16(4, 300))
    with pytest.raises(FlacError):
        decode_flac(good[: len(good) // 2])  # truncated mid-frame


# ------------------------------------------------- framework integration
def test_read_audio_raw_dispatches_flac(tmp_path):
    from fluidaudio_tpu.utils.audio_io import read_audio_raw

    pcm = _pcm16(5, 2000)
    path = tmp_path / "a.flac"
    path.write_bytes(encode_flac(pcm))
    raw, rate = read_audio_raw(path)
    assert rate == 16_000 and raw.dtype == np.int16
    np.testing.assert_array_equal(raw[:, 0], pcm)


def test_make_audio_source_flac_int16_fast_path(tmp_path):
    from fluidaudio_tpu.utils.audio_source import make_audio_source

    pcm = _pcm16(6, 20_000)
    path = tmp_path / "b.flac"
    path.write_bytes(encode_flac(pcm))
    src = make_audio_source(path)
    assert src.copy_samples_raw(0, 8).dtype == np.int16
    np.testing.assert_array_equal(src.copy_samples_raw(0, 20_000), pcm)


def test_converter_resamples_non16k_flac(tmp_path):
    from fluidaudio_tpu.utils.converter import AudioConverter

    pcm = _pcm16(7, 8000)
    path = tmp_path / "c.flac"
    path.write_bytes(encode_flac(pcm, sample_rate=8000))
    out = AudioConverter(16_000).resample_file(path)
    assert out.dtype == np.float32
    assert abs(out.size - 16_000) <= 2  # 0.5 s at 8 kHz -> ~1 s at 16 kHz


def test_transcribe_flac_token_exact_vs_wav(tmp_path):
    from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.utils.audio_io import write_wav

    pcm = _pcm16(8, 24_000)
    flac_path = tmp_path / "d.flac"
    flac_path.write_bytes(encode_flac(pcm))
    wav_path = tmp_path / "d.wav"
    write_wav(wav_path, pcm, 16_000, dtype="int16")

    models = AsrModels.load("test-tiny", allow_random_init=True)
    manager = AsrManager(
        models, ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=128))
    )
    r_flac = manager.transcribe(flac_path)
    r_wav = manager.transcribe(wav_path)
    assert r_flac.text == r_wav.text
