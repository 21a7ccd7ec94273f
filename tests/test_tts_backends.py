"""StyleTTS2 + Supertonic3 backends + TTS->ASR round-trip harness."""

import numpy as np
import pytest

from fluidaudio_tpu.models.styletts2 import STYLETTS2_TEST
from fluidaudio_tpu.models.supertonic3 import (
    LATENT_CH,
    SAMPLES_PER_LATENT,
    SUPERTONIC3_TEST,
    latent_len_for_duration,
    sample_noisy_latent,
)
from fluidaudio_tpu.tts.styletts2_manager import (
    StyleTTS2Manager,
    text_cleaner_encode,
)
from fluidaudio_tpu.tts.supertonic_manager import (
    Supertonic3Manager,
    chunk_text,
    preprocess_text,
)


@pytest.fixture(scope="module")
def styletts2():
    return StyleTTS2Manager(STYLETTS2_TEST)


@pytest.fixture(scope="module")
def supertonic():
    return Supertonic3Manager(SUPERTONIC3_TEST, total_steps=2)


def test_styletts2_default_style(styletts2):
    r = styletts2.synthesize("hello world")
    assert r.sample_rate == 24_000
    assert r.samples.size > 0 and np.all(np.isfinite(r.samples))


def test_styletts2_reference_style_changes_output(styletts2):
    rng = np.random.RandomState(0)
    ref = (rng.randn(24_000) * 0.1).astype(np.float32)
    a = styletts2.synthesize("same words", reference_audio=ref)
    b = styletts2.synthesize("same words")
    assert a.samples.size > 0
    assert a.samples.shape != b.samples.shape or not np.array_equal(a.samples, b.samples)


def test_styletts2_text_cleaner_table():
    # pad + punctuation + letters + IPA = 178 symbols (ref vocab size)
    from fluidaudio_tpu.tts.styletts2_manager import SYMBOLS

    assert len(SYMBOLS) == 178
    ids = text_cleaner_encode("ab c!")
    assert ids[0] == 0  # leading pad insertion
    assert all(0 <= i < 178 for i in ids)
    # unknown chars silently dropped
    assert len(text_cleaner_encode("a☃b")) == 3  # pad + a + b


def test_supertonic_synthesize(supertonic):
    r = supertonic.synthesize("forty four kilohertz output", voice="m1")
    assert r.sample_rate == 44_100
    assert r.samples.size > 0 and np.abs(r.samples).max() <= 1.0
    assert r.duration > 0
    with pytest.raises(KeyError):
        supertonic.synthesize("x", voice="nobody")
    with pytest.raises(ValueError):
        supertonic.synthesize("x", language="xx")


def test_supertonic_chunking():
    text = "One. " * 40
    chunks = chunk_text(text, 30)
    assert len(chunks) > 1
    assert all(len(c) <= 35 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_supertonic_preprocess_parity():
    # lang wrap + appended period
    assert preprocess_text("hello world", "en") == "<en>hello world.</en>"
    # NFKD + symbol replacement + abbreviation expansion
    out = preprocess_text("a—b @ c", "de")
    assert out == "<de>a-b at c.</de>"
    # existing terminal punctuation is preserved
    assert preprocess_text("done!", "en") == "<en>done!</en>"
    # emoji stripped
    assert preprocess_text("hi \U0001F600there", "en") == "<en>hi there.</en>"


def test_supertonic_latent_sampler_math():
    # latent_len = ceil(dur * sr / 3072) (Supertonic3LatentSampler.swift)
    assert latent_len_for_duration(0.0) == 0
    assert latent_len_for_duration(1.0) == (44_100 + 3071) // 3072
    rng = np.random.RandomState(0)
    z, mask, true_len = sample_noisy_latent(np.array([0.5, 1.0]), 32, rng)
    assert z.shape == (2, LATENT_CH, 32) and mask.shape == (2, 1, 32)
    l0 = latent_len_for_duration(0.5)
    assert mask[0, 0, :l0].all() and not mask[0, 0, l0:].any()
    # masked positions are zeroed in the latent
    assert np.all(z[0, :, l0:] == 0)
    assert true_len == latent_len_for_duration(1.0)


def test_supertonic_estimator_feedback_contract(supertonic):
    """vector_estimator returns x + dt*v — calling with current_step k and
    feeding back matches the reference's loop contract; a zero-init out_proj
    at seed init means the first call changes nothing but shapes hold."""
    import jax.numpy as jnp

    cfg = supertonic.cfg
    z = jnp.asarray(np.random.RandomState(0).randn(1, LATENT_CH, cfg.max_latent)
                    .astype(np.float32))
    te = jnp.zeros((1, 256, cfg.text_t))
    ttl = jnp.zeros((1, 50, 256))
    lm = jnp.ones((1, 1, cfg.max_latent))
    tm = jnp.ones((1, 1, cfg.text_t))
    out = supertonic.estimator.apply(
        supertonic.params["vector_estimator"], z, te, ttl, lm, tm,
        jnp.zeros((1,)), jnp.full((1,), 8.0),
    )
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_roundtrip_harness(supertonic):
    """Round-trip runs end-to-end and reports a WER (random weights => high)."""
    from fluidaudio_tpu.asr.config import ASRConfig, TdtConfig
    from fluidaudio_tpu.asr.manager import AsrManager
    from fluidaudio_tpu.models.zoo import AsrModels
    from fluidaudio_tpu.tts.roundtrip import tts_asr_roundtrip

    asr = AsrManager(
        AsrModels.load("test-tiny", allow_random_init=True),
        ASRConfig(tdt=TdtConfig(max_tokens_per_chunk=64)),
    )
    result = tts_asr_roundtrip(supertonic, asr, "testing round trip", voice="m1")
    assert 0.0 <= result.wer <= 2.0
    assert result.audio_seconds > 0
    assert isinstance(result.transcript, str)


def test_phoneme_chunker_reference_semantics():
    from fluidaudio_tpu.tts.phoneme_chunker import chunk_phonemes

    assert chunk_phonemes("", 10) == []
    assert chunk_phonemes("  abc  ", 10) == ["abc"]
    # break at the latest whitespace inside the window
    assert chunk_phonemes("aaa bbb ccc", 7) == ["aaa bbb", "ccc"]
    # pause punctuation stays attached to the preceding chunk
    assert chunk_phonemes("aaa, bbb ccc", 6) == ["aaa,", "bbb", "ccc"]
    # no boundary at all: hard split at the cap
    assert chunk_phonemes("abcdefghij", 4) == ["abcd", "efgh", "ij"]


def test_styletts2_long_input_chunks(styletts2):
    short = styletts2.synthesize("one two")
    long_text = " ".join(["chunky synthesis input"] * 30)
    result = styletts2.synthesize(long_text)
    assert result.samples.size > short.samples.size
    assert result.sample_rate == short.sample_rate


# --------------------------------------------------------------------------
# StyleTTS2 glue-op scenarios (StyleTTS2GlueOpsTests.swift:10-161,
# StyleTTS2DiffusionScheduleTests noise determinism is in scenario_parity)
# --------------------------------------------------------------------------


def test_round_durations_clamps_at_least_one():
    from fluidaudio_tpu.models.styletts2 import round_durations

    # large-negative logits -> sigmoid sums ~0 -> still 1 frame per token
    out = round_durations(np.full((3, 8), -50.0, np.float32), 3)
    assert list(out) == [1, 1, 1]


def test_round_durations_sums_sigmoid_across_bins():
    from fluidaudio_tpu.models.styletts2 import round_durations

    # one token, 4 bins at logit 0 -> sum(sigmoid)=2.0 -> rounds to 2
    out = round_durations(np.zeros((1, 4), np.float32), 1)
    assert list(out) == [2]
    # half-away-from-zero: sum = 2.5 -> 3
    logits = np.full((1, 5), 0.0, np.float32)
    assert list(round_durations(logits, 1)) == [3]


def test_expand_durations_matches_alignment_matrix_semantics():
    """frame_idx gather == the reference's one-hot alignment matmul
    (`buildAlignmentMatrix([2,1,3])` -> frames [0,0,1,2,2,2])."""
    from fluidaudio_tpu.models.kokoro import expand_durations

    idx, total = expand_durations(np.array([2.0, 1.0, 3.0]), max_frames=8)
    assert total == 6
    assert list(idx[:6]) == [0, 0, 1, 2, 2, 2]
    assert list(idx[6:]) == [0, 0]  # padding maps to token 0, masked later

    # gather expands features exactly like matmulAligned
    features = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])  # [C=2, K=3]
    out = features[:, idx[:total]]
    np.testing.assert_array_equal(out, [[1, 1, 2, 3, 3, 3], [4, 4, 5, 6, 6, 6]])


def test_expand_durations_caps_total_at_max_frames():
    from fluidaudio_tpu.models.kokoro import expand_durations

    idx, total = expand_durations(np.full(10, 20.0), max_frames=50)
    assert total <= 50
    assert np.all(idx[:total] >= 0) and np.all(idx[:total] < 10)
    # every token keeps at least one frame after rescaling
    assert len(set(idx[:total].tolist())) == 10


def test_blend_style_convex_combination():
    from fluidaudio_tpu.models.styletts2 import blend_style

    s_pred = np.concatenate([np.full((1, 128), 1.0), np.full((1, 128), 7.0)], axis=1)
    ref_s = np.concatenate([np.full((1, 128), 3.0), np.full((1, 128), 9.0)], axis=1)
    ref, s = blend_style(s_pred, ref_s, alpha=0.25, beta=0.75)
    # ref = 0.25*1 + 0.75*3 = 2.5 ; s = 0.75*7 + 0.25*9 = 7.5
    np.testing.assert_allclose(ref, 2.5)
    np.testing.assert_allclose(s, 7.5)


def test_blend_style_alpha_one_returns_pred_ref_half():
    from fluidaudio_tpu.models.styletts2 import blend_style

    rng = np.random.RandomState(0)
    s_pred = rng.randn(1, 256).astype(np.float32)
    ref_s = rng.randn(1, 256).astype(np.float32)
    ref, s = blend_style(s_pred, ref_s, alpha=1.0, beta=0.0)
    np.testing.assert_allclose(ref, s_pred[:, :128], atol=1e-7)
    np.testing.assert_allclose(s, ref_s[:, 128:], atol=1e-7)


def test_generator_output_length_matches_conv_arithmetic():
    from fluidaudio_tpu.models.styletts2 import STYLETTS2_TEST, generator_output_length

    cfg = STYLETTS2_TEST
    L = 10
    expect = L
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        p = (k - r) // 2
        expect = (expect - 1) * r - 2 * p + k
    assert generator_output_length(cfg, L) == expect + 1


def test_supertonic_latent_sampler_edge_scenarios():
    """Supertonic3LatentSamplerTests.swift:18-87 — clamping, determinism,
    empty input."""
    # length clamped at the bucket
    z, mask, true_len = sample_noisy_latent(
        np.array([1000.0]), 16, np.random.RandomState(1)
    )
    assert true_len == 16
    assert mask[0, 0].all()

    # same seed -> identical tensors; different seed diverges
    a = sample_noisy_latent(np.array([0.7]), 32, np.random.RandomState(7))
    b = sample_noisy_latent(np.array([0.7]), 32, np.random.RandomState(7))
    c = sample_noisy_latent(np.array([0.7]), 32, np.random.RandomState(8))
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])

    # empty durations -> empty batch
    z, mask, true_len = sample_noisy_latent(
        np.array([]), 32, np.random.RandomState(0)
    )
    assert z.shape[0] == 0 and mask.shape[0] == 0 and true_len == 0


class TestSupertonic3VoiceCatalog:
    """Supertonic3VoiceTests.swift:10-52 + voice-style JSON decoding
    (Supertonic3Types.swift:161-250)."""

    def test_has_ten_voices(self):
        from fluidaudio_tpu.tts.supertonic_manager import SUPERTONIC3_VOICES

        assert SUPERTONIC3_VOICES == (
            "F1", "F2", "F3", "F4", "F5", "M1", "M2", "M3", "M4", "M5"
        )

    def test_default_is_m1(self):
        from fluidaudio_tpu.tts.supertonic_manager import DEFAULT_VOICE

        assert DEFAULT_VOICE == "M1"

    def test_file_name_mapping(self):
        from fluidaudio_tpu.tts.supertonic_manager import (
            SUPERTONIC3_VOICES,
            voice_style_filename,
        )

        assert voice_style_filename("F3") == "voice_styles/F3.json"
        for v in SUPERTONIC3_VOICES:
            assert voice_style_filename(v) == f"voice_styles/{v}.json"

    def test_name_parsing_is_case_insensitive(self):
        from fluidaudio_tpu.tts.supertonic_manager import parse_voice

        assert parse_voice("F3") == "F3"
        assert parse_voice("f3") == "F3"
        assert parse_voice("m1") == "M1"
        assert parse_voice("M5") == "M5"

    def test_name_parsing_rejects_unknown(self):
        from fluidaudio_tpu.tts.supertonic_manager import parse_voice

        assert parse_voice("xyz") is None
        assert parse_voice("") is None
        assert parse_voice("F6") is None
        # Kokoro-style default must not parse, so callers can fall back
        assert parse_voice("af_heart") is None

    def test_manager_catalog_covers_all_builtin_voices(self, supertonic):
        from fluidaudio_tpu.tts.supertonic_manager import SUPERTONIC3_VOICES

        assert set(SUPERTONIC3_VOICES) <= set(supertonic.available_voices)

    def test_load_voice_style_validates_dims(self, tmp_path):
        import json as _json

        from fluidaudio_tpu.models.supertonic3 import (
            DP_STYLE_DIM,
            DP_STYLE_TOKENS,
            TTL_STYLE_DIM,
            TTL_STYLE_TOKENS,
        )
        from fluidaudio_tpu.tts.supertonic_manager import load_voice_style

        good = {
            "style_ttl": {
                "data": [[[0.5] * TTL_STYLE_DIM] * TTL_STYLE_TOKENS],
                "dims": [1, TTL_STYLE_TOKENS, TTL_STYLE_DIM],
                "type": "float32",
            },
            "style_dp": {
                "data": [[[0.25] * DP_STYLE_DIM] * DP_STYLE_TOKENS],
                "dims": [1, DP_STYLE_TOKENS, DP_STYLE_DIM],
                "type": "float32",
            },
        }
        p = tmp_path / "M1.json"
        p.write_text(_json.dumps(good))
        style = load_voice_style(p)
        assert style["ttl"].shape == (TTL_STYLE_TOKENS, TTL_STYLE_DIM)
        assert style["dp"].shape == (DP_STYLE_TOKENS, DP_STYLE_DIM)
        assert float(style["ttl"][0, 0]) == 0.5

        bad = dict(good)
        bad["style_dp"] = {**good["style_dp"], "dims": [1, 4, 4]}
        q = tmp_path / "bad.json"
        q.write_text(_json.dumps(bad))
        with pytest.raises(ValueError, match="shape mismatch"):
            load_voice_style(q)
