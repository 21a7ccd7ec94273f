"""PunctuationCommitLayer: commit-on-punctuation, debounce, EOU."""

from fluidaudio_tpu.asr.punctuation_commit import PunctuationCommitLayer


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_commit_on_punctuation():
    layer = PunctuationCommitLayer()
    u = layer.process_partial_text("hello world")
    assert u.committed_text == "" and u.ghost_text == "hello world"
    u = layer.process_partial_text("hello world. how are")
    assert u.committed_text == "hello world. "
    assert u.ghost_text == "how are"
    assert u.last_commit_reason == "punctuation:."
    assert u.total_text == "hello world. how are"


def test_multiple_sentences():
    layer = PunctuationCommitLayer()
    u = layer.process_partial_text("one. two! three")
    assert u.committed_text == "one. two! "
    assert u.ghost_text == "three"


def test_debounce_commit():
    clock = FakeClock()
    layer = PunctuationCommitLayer(debounce_timeout=3.0, clock=clock)
    layer.process_partial_text("still talking")
    assert layer.check_debounce() is None  # not expired
    clock.t = 5.0
    u = layer.check_debounce()
    assert u is not None and u.last_commit_reason == "debounce"
    assert u.committed_text == "still talking "
    assert u.ghost_text == ""


def test_debounce_disabled():
    clock = FakeClock()
    layer = PunctuationCommitLayer(commit_on_timeout=False, clock=clock)
    layer.process_partial_text("pause here")
    clock.t = 10.0
    assert layer.check_debounce() is None


def test_eou_and_reset():
    layer = PunctuationCommitLayer()
    layer.process_partial_text("unfinished thought")
    u = layer.process_eou()
    assert u.committed_text == "unfinished thought "
    assert u.last_commit_reason == "eou"
    layer.reset()
    assert layer.process_eou().total_text == ""


def test_callback_fires():
    seen = []
    layer = PunctuationCommitLayer(on_update=seen.append)
    layer.process_partial_text("hi.")
    assert len(seen) == 1 and seen[0].committed_text == "hi. "
