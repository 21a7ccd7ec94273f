"""Multi-stream batched serving (MultiStreamMixin) for the streaming ASR
families: per-stream results must be bit-identical to the single-stream
path, with and without a device mesh, including masked rows when streams
advance at different rates.

Reference analog: `MultiStreamCommand.swift` /
`NemotronMultilingualMultiStreamBench.swift` run one cloned manager per
stream on threads; here the streams are rows of ONE batched chunk program
(optionally sharded over a mesh 'data' axis).
"""

import jax
import numpy as np
import pytest

from fluidaudio_tpu.train import fixtures as fx
from fluidaudio_tpu.train import tiny_corpus as tc


def _eou_manager(**kw):
    from fluidaudio_tpu.asr.streaming_eou import EOU_TEST, StreamingEouAsrManager

    return StreamingEouAsrManager(
        chunk_ms=320, spec=EOU_TEST,
        checkpoint_dir=fx.trained_assets_dir() / "eou", **kw,
    )


def _nemotron_manager(**kw):
    from fluidaudio_tpu.asr.streaming_nemotron import (
        NEMOTRON_TEST, StreamingNemotronAsrManager,
    )

    return StreamingNemotronAsrManager(
        NEMOTRON_TEST, 560, language="auto",
        enc_cfg=fx.nemotron_tiny_enc_cfg(),
        checkpoint_dir=fx.trained_assets_dir() / "nemotron", **kw,
    )


def _eou_utterances(n, seed=2468):
    rs = np.random.RandomState(seed)
    tail = np.zeros(int(1.28 * 16_000), np.float32)
    utts, refs = [], []
    for _ in range(n):
        ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 8)))
        utts.append(np.concatenate([tc.make_utterance(ids, rs), tail]))
        refs.append(tc.transcript_text(ids))
    return utts, refs


def _single_stream_reference(mgr, utts):
    """Run each utterance through the plain single-stream path."""
    finals, eous = [], []
    for a in utts:
        state = mgr.make_state()
        partials = mgr.process(a, state)
        eous.append(sum(p.eou_detected for p in partials))
        finals.append(mgr.finish(state))
    return finals, eous


@pytest.mark.skipif(not fx.fixtures_available("eou"),
                    reason="trained eou fixture not committed")
class TestEouMultiStream:
    def test_lockstep_matches_single_stream(self):
        """All streams fed at once: every stream's tokens, timestamps and
        EOU flags must equal its own single-stream run."""
        utts, refs = _eou_utterances(3)
        ref_finals, ref_eous = _single_stream_reference(_eou_manager(), utts)

        mgr = _eou_manager()
        session = mgr.make_multi_state(3)
        partials = mgr.process_multi(session, utts)
        finals = mgr.flush_multi(session)

        for i in range(3):
            assert finals[i].text == ref_finals[i].text == refs[i]
            assert finals[i].token_ids == ref_finals[i].token_ids
            assert finals[i].timestamps_ms == ref_finals[i].timestamps_ms
            assert sum(p.eou_detected for p in partials[i]) == ref_eous[i] >= 1

    def test_staggered_feeds_mask_inactive_rows(self):
        """Streams receiving audio at different rates: rows without a full
        chunk are masked in the batched program and their caches must pass
        through untouched — results still identical per stream."""
        utts, refs = _eou_utterances(3, seed=97)
        ref_finals, _ = _single_stream_reference(_eou_manager(), utts)

        mgr = _eou_manager()
        session = mgr.make_multi_state(3)
        # drip-feed in unequal slice sizes so active masks differ per tick
        steps = [7000, 3000, 12000]
        offsets = [0, 0, 0]
        done = [False] * 3
        while not all(done):
            feed = []
            for i, a in enumerate(utts):
                if offsets[i] >= len(a):
                    feed.append(None)
                    done[i] = True
                else:
                    feed.append(a[offsets[i]: offsets[i] + steps[i]])
                    offsets[i] += steps[i]
            mgr.process_multi(session, feed)
        finals = mgr.flush_multi(session)
        for i in range(3):
            assert finals[i].text == ref_finals[i].text == refs[i]
            assert finals[i].token_ids == ref_finals[i].token_ids
            assert finals[i].timestamps_ms == ref_finals[i].timestamps_ms

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual CPU devices")
    def test_mesh_sharded_matches_single_stream(self):
        """4 streams sharded over the mesh 'data' axis: same partials, same
        finals, same EOU flags as single-device single-stream."""
        from fluidaudio_tpu.parallel.mesh import make_mesh

        utts, refs = _eou_utterances(4, seed=31)
        ref_finals, ref_eous = _single_stream_reference(_eou_manager(), utts)

        mgr = _eou_manager()
        mgr.set_mesh(make_mesh(8, data=4, model=2))
        session = mgr.make_multi_state(4)
        partials = mgr.process_multi(session, utts)
        finals = mgr.flush_multi(session)
        for i in range(4):
            assert finals[i].text == ref_finals[i].text == refs[i]
            assert finals[i].token_ids == ref_finals[i].token_ids
            assert sum(p.eou_detected for p in partials[i]) == ref_eous[i]

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual CPU devices")
    def test_mesh_requires_divisible_stream_count(self):
        from fluidaudio_tpu.parallel.mesh import make_mesh

        mgr = _eou_manager()
        mgr.set_mesh(make_mesh(8, data=4, model=2))
        with pytest.raises(ValueError, match="multiple of the mesh data axis"):
            mgr.make_multi_state(3)


@pytest.mark.skipif(not fx.fixtures_available("nemotron"),
                    reason="trained nemotron fixture not committed")
class TestNemotronMultiStream:
    def test_per_stream_language_prompts(self):
        """Each row runs its own language prompt; transcripts must equal the
        single-stream runs with set_language, and the auto row must detect
        its language."""
        rs = np.random.RandomState(5151)
        langs = ["aa-AA", "bb-BB", "auto", "aa-AA"]
        utts, refs = [], []
        for lang in langs:
            corpus_lang = "b" if lang == "bb-BB" else "a"
            ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 6)))
            utts.append(tc.make_utterance(ids, rs, lang=corpus_lang))
            words = (tc.word_text(i) if corpus_lang == "a"
                     else tc.word_text_b(i) for i in ids)
            refs.append(" ".join(words))

        single = _nemotron_manager()
        ref_finals = []
        for lang, a in zip(langs, utts):
            single.set_language(lang)
            state = single.make_state()
            single.process(a, state)
            ref_finals.append(single.finish(state))

        mgr = _nemotron_manager()
        session = mgr.make_multi_state(4, languages=langs)
        mgr.process_multi(session, utts)
        finals = mgr.flush_multi(session)
        for i in range(4):
            assert finals[i].text == ref_finals[i].text == refs[i]
            assert finals[i].token_ids == ref_finals[i].token_ids
        # the auto-prompt row detected its language on ITS stream state
        assert session.streams[2].detected_language == "aa-AA"

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual CPU devices")
    def test_mesh_sharded_multilingual(self):
        from fluidaudio_tpu.parallel.mesh import make_mesh

        rs = np.random.RandomState(808)
        langs = ["aa-AA", "bb-BB", "aa-AA", "bb-BB"]
        utts, refs = [], []
        for lang in langs:
            corpus_lang = "b" if lang == "bb-BB" else "a"
            ids = rs.randint(0, tc.N_WORDS, size=int(rs.randint(2, 6)))
            utts.append(tc.make_utterance(ids, rs, lang=corpus_lang))
            words = (tc.word_text(i) if corpus_lang == "a"
                     else tc.word_text_b(i) for i in ids)
            refs.append(" ".join(words))

        single = _nemotron_manager()
        ref_texts = []
        for lang, a in zip(langs, utts):
            single.set_language(lang)
            state = single.make_state()
            single.process(a, state)
            ref_texts.append(single.finish(state).text)

        mgr = _nemotron_manager()
        mgr.set_mesh(make_mesh(8, data=4, model=2))
        session = mgr.make_multi_state(4, languages=langs)
        mgr.process_multi(session, utts)
        finals = mgr.flush_multi(session)
        for i in range(4):
            assert finals[i].text == ref_texts[i] == refs[i]
