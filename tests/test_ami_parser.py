"""AMI/Kaldi parsers (mirrors reference AMIParserTests/AMIKaldiDataTests)."""

from fluidaudio_tpu.metrics.ami import (
    ami_speaker_from_utt,
    join_segments_and_text,
    kaldi_to_diarization_reference,
    kaldi_to_reference_transcript,
    parse_kaldi_segments,
    parse_kaldi_text,
)

SEGMENTS = """AMI_ES2004a_H00_0001 H00 12.50 15.20
AMI_ES2004a_H01_0002 H01 15.80 18.00
AMI_ES2004a_H00_0003 H00 3.10 5.00
"""

TEXT = """AMI_ES2004a_H00_0001 okay let's start
AMI_ES2004a_H01_0002 sounds good
AMI_ES2004a_H00_0003 good morning everyone
"""


def test_parse_segments_sorted():
    utts = parse_kaldi_segments(SEGMENTS)
    assert len(utts) == 3
    assert utts[0].start == 3.10  # time-sorted
    assert utts[0].speaker == "H00"


def test_join_and_transcript():
    utts = join_segments_and_text(parse_kaldi_segments(SEGMENTS), parse_kaldi_text(TEXT))
    transcript = kaldi_to_reference_transcript(utts)
    assert transcript == "good morning everyone okay let's start sounds good"


def test_diarization_reference():
    segs = kaldi_to_diarization_reference(parse_kaldi_segments(SEGMENTS))
    assert {s.speaker_id for s in segs} == {"H00", "H01"}
    assert segs[0].end_time == 5.00


def test_ami_speaker_from_utt():
    assert ami_speaker_from_utt("AMI_ES2004a_H00_MEE013_0012") == "H00"
    assert ami_speaker_from_utt("X_Y") == "Y"
