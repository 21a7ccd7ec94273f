"""AMI NXT corpus parsing + Kaldi split construction.

Ports AMIParserTests.swift, AMIKaldiDataTests.swift, and AMIRTTMTests.swift
(reference Tests/FluidAudioTests/CLI/) with the same XML fixtures.
"""

import numpy as np
import pytest

from fluidaudio_tpu.metrics import ami_corpus as ac
from fluidaudio_tpu.utils.audio_io import write_wav

MEETINGS_XML = """\
<meetings>
  <meeting observation="{meeting}">
    <speaker nxt_agent="A" global_name="SpeakerA"/>
    <speaker nxt_agent="B" global_name="SpeakerB"/>
    <speaker nxt_agent="C" global_name="SpeakerC"/>
    <speaker nxt_agent="D" global_name="SpeakerD"/>
  </meeting>
</meetings>
"""

SPEAKER_A_WORDS = """\
<nite:root xmlns:nite="http://nite.sourceforge.net/">
  <w nite:id="a1" starttime="0.10" endtime="0.40">hello</w>
  <w nite:id="a2" starttime="0.45" endtime="0.70">world</w>
  <w nite:id="a3" starttime="0.71" endtime="1.00" punc="true">.</w>
  <pause starttime="1.00" endtime="1.20"/>
</nite:root>
"""

SPEAKER_B_WORDS = """\
<nite:root xmlns:nite="http://nite.sourceforge.net/">
  <w nite:id="b1" starttime="1.50" endtime="1.70">second</w>
  <w nite:id="b2" starttime="1.71" endtime="1.90">speaker</w>
</nite:root>
"""

SPEAKER_A_SEGMENTS = """\
<nite:root xmlns:nite="http://nite.sourceforge.net/">
  <segment nite:id="a1" transcriber_start="0.004" transcriber_end="0.126"/>
  <segment nite:id="a2" transcriber_start="0.129" transcriber_end="0.254"/>
  <segment nite:id="a3" transcriber_start="0.601" transcriber_end="0.799"/>
</nite:root>
"""

SPEAKER_B_SEGMENTS = """\
<nite:root xmlns:nite="http://nite.sourceforge.net/">
  <segment nite:id="b1" transcriber_start="1.001" transcriber_end="1.019"/>
</nite:root>
"""

EMPTY_ROOT = '<nite:root xmlns:nite="http://nite.sourceforge.net/"/>'


def make_ami_fixture(root, meeting="ES2004a", with_words=True):
    (root / "corpusResources").mkdir(parents=True)
    (root / "corpusResources" / "meetings.xml").write_text(
        MEETINGS_XML.format(meeting=meeting)
    )
    seg = root / "segments"
    seg.mkdir()
    (seg / f"{meeting}.A.segments.xml").write_text(SPEAKER_A_SEGMENTS)
    (seg / f"{meeting}.B.segments.xml").write_text(SPEAKER_B_SEGMENTS)
    (seg / f"{meeting}.C.segments.xml").write_text(EMPTY_ROOT)
    (seg / f"{meeting}.D.segments.xml").write_text(EMPTY_ROOT)
    if with_words:
        words = root / "words"
        words.mkdir()
        (words / f"{meeting}.A.words.xml").write_text(SPEAKER_A_WORDS)
        (words / f"{meeting}.B.words.xml").write_text(SPEAKER_B_WORDS)
        (words / f"{meeting}.C.words.xml").write_text(EMPTY_ROOT)
        (words / f"{meeting}.D.words.xml").write_text(EMPTY_ROOT)
    return root


class TestAmiParser:
    """AMIParserTests.swift:9-71."""

    def test_word_aligned_ground_truth_parses_and_merges_words(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        segments = ac.load_word_aligned_ground_truth("ES2004a", fixture)

        assert len(segments) == 2
        assert segments[0].speaker_id == "SpeakerA"
        assert segments[0].start_time == pytest.approx(0.1, abs=1e-4)
        assert segments[0].end_time == pytest.approx(0.7, abs=1e-4)
        assert segments[1].speaker_id == "SpeakerB"
        assert segments[1].start_time == pytest.approx(1.5, abs=1e-4)
        assert segments[1].end_time == pytest.approx(1.9, abs=1e-4)

    def test_word_aligned_der_reference_uses_mapped_participant_ids(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        segments = ac.load_word_aligned_der_reference("ES2004a", fixture)
        assert [s.speaker_id for s in segments] == ["SpeakerA", "SpeakerB"]

    def test_legacy_official_ground_truth_filters_short_segments(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        segments = ac.load_ami_ground_truth("ES2004a", fixture)
        assert segments == []

    def test_frame_aligned_der_reference_quantizes_to_10ms_frames(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        segments = ac.load_frame_aligned_der_reference("ES2004a", fixture)

        assert len(segments) == 3
        assert segments[0].speaker_id == "SpeakerA"
        assert segments[0].start_time == pytest.approx(0.00, abs=1e-4)
        assert segments[0].end_time == pytest.approx(0.25, abs=1e-4)
        assert segments[1].speaker_id == "SpeakerA"
        assert segments[1].start_time == pytest.approx(0.60, abs=1e-4)
        assert segments[1].end_time == pytest.approx(0.80, abs=1e-4)
        assert segments[2].speaker_id == "SpeakerB"
        assert segments[2].start_time == pytest.approx(1.00, abs=1e-4)
        assert segments[2].end_time == pytest.approx(1.02, abs=1e-4)

    def test_speaker_count_from_meetings_xml(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        assert ac.ground_truth_speaker_count("ES2004a", fixture) == 4
        assert ac.ground_truth_speaker_count("ZZ9999z", fixture) == 4  # fallback

    def test_missing_mapping_raises(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        with pytest.raises(ac.AmiDataError, match="no speaker mapping"):
            ac.load_official_ground_truth("EN9999x", fixture)

    def test_words_parser_skips_punctuation_and_pauses(self, tmp_path):
        fixture = make_ami_fixture(tmp_path)
        words = ac.parse_words_file(fixture / "words" / "ES2004a.A.words.xml")
        assert [w.segment_id for w in words] == ["a1", "a2"]
        assert all(w.participant_id == "A" for w in words)

    def test_simplified_ground_truth_round_robin(self):
        segments = ac.generate_simplified_ground_truth(duration=30.0, speaker_count=4)
        assert len(segments) == 8
        assert segments[0].speaker_id == "Speaker 1"
        assert segments[4].speaker_id == "Speaker 1"
        assert segments[-1].end_time == pytest.approx(30.0)

    def test_placeholder_embedding_deterministic(self):
        a = ac._placeholder_embedding("MEE006")
        b = ac._placeholder_embedding("MEE006")
        c = ac._placeholder_embedding("FEE005")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (512,)
        assert not np.array_equal(a, c)


class TestAmiKaldiData:
    """AMIKaldiDataTests.swift:10-88."""

    def _make_fixture(self, tmp_path, meeting_id):
        annotations = tmp_path / "ami_public_1.6.2"
        annotations.mkdir()
        make_ami_fixture(annotations, meeting=meeting_id, with_words=False)
        audio_root = tmp_path / "audio"
        audio_root.mkdir()
        n = int(2.0 * 8000)
        samples = (np.sin(np.arange(n) * 0.01) * 0.2).astype(np.float32)
        write_wav(audio_root / f"{meeting_id}.Mix-Headset.wav", samples, 8000)
        out = tmp_path / "ami" / "mhs" / "data" / "test"
        out.mkdir(parents=True)
        return annotations, audio_root, out

    def test_build_split_writes_expected_kaldi_files(self, tmp_path):
        annotations, audio_root, out = self._make_fixture(tmp_path, "ES2004a")
        ac.build_kaldi_split(["ES2004a"], annotations, audio_root, out)

        for name in ac.REQUIRED_KALDI_FILES:
            assert (out / name).exists(), f"{name} should exist"

        segments = (out / "segments").read_text()
        assert "ES2004a_a_00001 ES2004a 0.004000 0.126000" in segments
        assert "ES2004a_b_00001 ES2004a 1.001000 1.019000" in segments

        utt2spk = (out / "utt2spk").read_text()
        assert "ES2004a_a_00001 SpeakerA" in utt2spk
        assert "ES2004a_b_00001 SpeakerB" in utt2spk

        spk2utt = (out / "spk2utt").read_text()
        assert "SpeakerA ES2004a_a_00001 ES2004a_a_00002 ES2004a_a_00003" in spk2utt
        assert "SpeakerB ES2004a_b_00001" in spk2utt

        assert "ES2004a 2.000000" in (out / "reco2dur").read_text()
        assert "ES2004a 2" in (out / "reco2num_spk").read_text()

        utt2timestamp = (out / "utt2timestamp").read_text()
        assert "ES2004a_a_00003 0.601000 0.799000" in utt2timestamp
        assert "ES2004a_b_00001 1.001000 1.019000" in utt2timestamp

    def test_load_der_reference_matches_original_kaldi_quantization(self, tmp_path):
        annotations, audio_root, out = self._make_fixture(tmp_path, "ZZ0001")
        ac.build_kaldi_split(["ZZ0001"], annotations, audio_root, out)

        assert ac.recording_ids(out) == ["ZZ0001"]
        assert ac.audio_path("ZZ0001", out) == str(
            audio_root / "ZZ0001.Mix-Headset.wav"
        )
        assert ac.recording_duration("ZZ0001", out) == pytest.approx(2.0, abs=1e-4)

        segments = ac.load_kaldi_der_reference("ZZ0001", out)
        assert len(segments) == 3
        assert segments[0].speaker_id == "SpeakerA"
        assert segments[0].start_time == pytest.approx(0.00, abs=1e-4)
        assert segments[0].end_time == pytest.approx(0.25, abs=1e-4)
        assert segments[1].speaker_id == "SpeakerA"
        assert segments[1].start_time == pytest.approx(0.60, abs=1e-4)
        assert segments[1].end_time == pytest.approx(0.80, abs=1e-4)
        assert segments[2].speaker_id == "SpeakerB"
        assert segments[2].start_time == pytest.approx(1.00, abs=1e-4)
        assert segments[2].end_time == pytest.approx(1.02, abs=1e-4)

    def test_build_split_raises_when_nothing_buildable(self, tmp_path):
        annotations = tmp_path / "ann"
        annotations.mkdir()
        make_ami_fixture(annotations, with_words=False)
        empty_audio = tmp_path / "noaudio"
        empty_audio.mkdir()
        with pytest.raises(ac.AmiDataError, match="no meetings"):
            ac.build_kaldi_split(["ES2004a"], annotations, empty_audio, tmp_path / "o")

    def test_split_exists_requires_all_files(self, tmp_path):
        annotations, audio_root, out = self._make_fixture(tmp_path, "ES2004a")
        assert not ac.kaldi_split_exists(out)
        ac.build_kaldi_split(["ES2004a"], annotations, audio_root, out)
        assert ac.kaldi_split_exists(out)


class TestAmiRttm:
    """AMIRTTMTests.swift:9-54."""

    RTTM_LINE = "SPEAKER ES2004a 1 0.00 1.00 <NA> <NA> speaker0 <NA> <NA>\n"

    def test_rttm_lookup_prefers_cached_home_path(self, tmp_path):
        home = tmp_path / "home"
        workspace = tmp_path / "workspace"
        cached = home / "FluidAudioDatasets" / "ami_official" / "rttm" / "ES2004a.rttm"
        cached.parent.mkdir(parents=True)
        cached.write_text(self.RTTM_LINE)

        assert ac.ami_rttm_path("ES2004a", workspace, home) == cached

    def test_rttm_lookup_falls_back_to_forced_alignment_repo(self, tmp_path):
        home = tmp_path / "home"
        workspace = tmp_path / "workspace"
        dev = workspace / "Datasets" / "diar-forced-alignment" / "AMI" / "dev" / "X.rttm"
        dev.parent.mkdir(parents=True)
        dev.write_text(self.RTTM_LINE)

        assert ac.ami_rttm_path("X", workspace, home) == dev

    def test_stage_ami_rttms_copies_from_forced_alignment_repo(self, tmp_path):
        source_root = tmp_path / "Datasets" / "diar-forced-alignment" / "AMI"
        (source_root / "test").mkdir(parents=True)
        (source_root / "test" / "ES2004a.rttm").write_text(self.RTTM_LINE)
        dest = tmp_path / "cache" / "rttm"

        copied, skipped, missing = ac.stage_ami_rttms(
            source_root, dest, single_file="ES2004a"
        )
        assert (copied, skipped, missing) == (1, 0, [])
        assert (dest / "ES2004a.rttm").read_text() == self.RTTM_LINE

    def test_stage_skips_existing_unless_forced(self, tmp_path):
        source_root = tmp_path / "src"
        (source_root / "test").mkdir(parents=True)
        (source_root / "test" / "M.rttm").write_text(self.RTTM_LINE)
        dest = tmp_path / "dst"
        dest.mkdir()
        (dest / "M.rttm").write_text("stale\n")

        copied, skipped, _ = ac.stage_ami_rttms(source_root, dest, single_file="M")
        assert (copied, skipped) == (0, 1)
        assert (dest / "M.rttm").read_text() == "stale\n"

        copied, skipped, _ = ac.stage_ami_rttms(
            source_root, dest, single_file="M", force=True
        )
        assert (copied, skipped) == (1, 0)
        assert (dest / "M.rttm").read_text() == self.RTTM_LINE

    def test_stage_reports_missing_meetings(self, tmp_path):
        source_root = tmp_path / "src"
        source_root.mkdir()
        copied, skipped, missing = ac.stage_ami_rttms(
            source_root, tmp_path / "dst", meeting_ids=["A1", "B2"]
        )
        assert (copied, skipped) == (0, 0)
        assert missing == ["A1", "B2"]
