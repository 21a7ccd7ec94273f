"""PunctuationCommitLayer scenario parity suite.

Ports the reference's `Tests/FluidAudioTests/ASR/PunctuationCommitLayerTests.swift`:
punctuation detection/splitting, incremental accumulation, debounce commit +
cancellation (poll-based here), EOU/manual promotion without trailing space,
reset, callbacks, and whitespace/edge cases.
"""

from fluidaudio_tpu.asr.punctuation_commit import PunctuationCommitLayer


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestPunctuationDetection:
    def test_commit_on_punctuation(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello world. How are you")
        assert u.committed_text == "Hello world. "
        assert u.ghost_text == "How are you"
        assert u.last_commit_reason == "punctuation:."

    def test_no_punctuation_all_ghost(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello world")
        assert u.committed_text == ""
        assert u.ghost_text == "Hello world"
        assert u.last_commit_reason is None

    def test_multiple_punctuation_commits_all(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("First. Second! Third?")
        assert u.committed_text == "First. Second! Third? "
        assert u.ghost_text == ""
        assert u.last_commit_reason == "punctuation:?"

    def test_exclamation_mark(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Wow! Amazing")
        assert u.committed_text == "Wow! "
        assert u.ghost_text == "Amazing"
        assert u.last_commit_reason == "punctuation:!"

    def test_question_mark(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("How are you? I am fine")
        assert u.committed_text == "How are you? "
        assert u.ghost_text == "I am fine"

    def test_incremental_updates_accumulate(self):
        layer = PunctuationCommitLayer()
        u1 = layer.process_partial_text("Hello. ")
        assert u1.committed_text == "Hello. "
        assert u1.ghost_text == ""
        u2 = layer.process_partial_text("How are you")
        assert u2.committed_text == "Hello. "
        assert u2.ghost_text == "How are you"
        u3 = layer.process_partial_text("How are you? Great")
        assert u3.committed_text == "Hello. How are you? "
        assert u3.ghost_text == "Great"


class TestDebounce:
    def test_debounce_commit(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(debounce_timeout=3.0, clock=clock)
        layer.process_partial_text("still talking")
        assert layer.check_debounce() is None  # not expired
        clock.t = 5.0
        u = layer.check_debounce()
        assert u is not None and u.last_commit_reason == "debounce"
        assert u.committed_text == "still talking"
        assert u.ghost_text == ""

    def test_debounce_disabled(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(commit_on_timeout=False, clock=clock)
        layer.process_partial_text("pause here")
        clock.t = 10.0
        assert layer.check_debounce() is None

    def test_debounce_cancelled_by_new_partial(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(debounce_timeout=3.0, clock=clock)
        layer.process_partial_text("Hello")
        clock.t = 2.0
        layer.process_partial_text("Hello world")  # re-arms the timer
        clock.t = 4.0  # only 2 s since the latest partial
        assert layer.check_debounce() is None
        clock.t = 5.5
        assert layer.check_debounce() is not None

    def test_eou_cancels_debounce(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(debounce_timeout=0.5, clock=clock)
        layer.process_partial_text("Hello")
        clock.t = 0.05
        layer.process_eou()
        clock.t = 0.6
        assert layer.check_debounce() is None

    def test_punctuation_commit_disarms_debounce(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(debounce_timeout=1.0, clock=clock)
        layer.process_partial_text("Done. next")
        clock.t = 5.0
        # Timer is only armed by a NO-punctuation partial (ref :210).
        assert layer.check_debounce() is None

    def test_reset_cancels_debounce(self):
        clock = FakeClock()
        layer = PunctuationCommitLayer(debounce_timeout=0.1, clock=clock)
        layer.process_partial_text("Hello")
        layer.reset()
        clock.t = 0.15
        assert layer.check_debounce() is None


class TestEou:
    def test_eou_commits_ghost_without_trailing_space(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello world")
        u = layer.process_eou()
        assert u.committed_text == "Hello world"
        assert u.ghost_text == ""
        assert u.last_commit_reason == "eou"

    def test_eou_with_committed_text(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello. World")
        u = layer.process_eou()
        assert u.committed_text == "Hello. World"
        assert u.ghost_text == ""

    def test_eou_with_no_ghost(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello.")
        u = layer.process_eou()
        assert u.committed_text == "Hello. "
        assert u.ghost_text == ""
        assert u.last_commit_reason == "eou"


class TestManualCommit:
    def test_manual_commit_promotes_ghost(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello world")
        u = layer.manual_commit()
        assert u.committed_text == "Hello world"
        assert u.ghost_text == ""
        assert u.last_commit_reason == "manual"

    def test_manual_commit_no_ghost(self):
        layer = PunctuationCommitLayer()
        u = layer.manual_commit()
        assert u.committed_text == ""
        assert u.ghost_text == ""
        assert u.last_commit_reason == "manual"

    def test_manual_commit_with_existing_committed(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello. World")
        u = layer.manual_commit()
        assert u.committed_text == "Hello. World"
        assert u.ghost_text == ""

    def test_manual_commit_adds_separator_when_needed(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("no-punct")
        layer.manual_commit()  # committed = "no-punct" (no trailing space)
        layer.process_partial_text("more")
        u = layer.manual_commit()
        assert u.committed_text == "no-punct more"


class TestResetAndCallback:
    def test_reset_clears_all(self):
        layer = PunctuationCommitLayer()
        layer.process_partial_text("Hello. World")
        layer.reset()
        u = layer.process_partial_text("New text")
        assert u.committed_text == ""
        assert u.ghost_text == "New text"

    def test_reset_notifies_callback(self):
        seen = []
        layer = PunctuationCommitLayer(on_update=seen.append)
        layer.process_partial_text("Hello")
        layer.reset()
        assert seen[-1].committed_text == ""
        assert seen[-1].total_text == ""

    def test_callback_invoked_per_update(self):
        seen = []
        layer = PunctuationCommitLayer(on_update=seen.append)
        layer.process_partial_text("Hello")
        layer.process_partial_text("Hello.")
        layer.manual_commit()
        assert len(seen) == 3
        assert seen[1].committed_text == "Hello. "


class TestEdgeCases:
    def test_empty_string(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("")
        assert u.committed_text == "" and u.ghost_text == ""

    def test_only_punctuation(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text(".")
        assert u.committed_text == ". "
        assert u.ghost_text == ""
        assert u.last_commit_reason == "punctuation:."

    def test_punctuation_at_start(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text(". Hello")
        assert u.committed_text == ". "
        assert u.ghost_text == "Hello"

    def test_consecutive_punctuation(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("What...? Really")
        assert u.committed_text == "What...? "
        assert u.ghost_text == "Really"
        assert u.last_commit_reason == "punctuation:?"

    def test_whitespace_preserved_after_punctuation(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello.   World")
        assert u.committed_text == "Hello.   "
        assert u.ghost_text == "World"

    def test_total_text_combines(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello. World")
        assert u.total_text == "Hello. World"

    def test_total_text_no_ghost(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello.")
        assert u.total_text == "Hello. "

    def test_total_text_no_committed(self):
        layer = PunctuationCommitLayer()
        u = layer.process_partial_text("Hello")
        assert u.total_text == "Hello"
