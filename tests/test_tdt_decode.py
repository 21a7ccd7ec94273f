"""TDT greedy decode: compiled batched loop vs step-by-step Python reference.

Uses tiny random-weight models (the hermetic fixture tier SURVEY.md §4
recommends) so decode semantics are testable without real checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidaudio_tpu.models.predictor import PredictorConfig, RnntJoint, RnntPredictor
from fluidaudio_tpu.ops.tdt_decode import (
    TdtDecodeConfig,
    make_initial_state,
    tdt_greedy_decode,
)

VOCAB = 16
PCFG = PredictorConfig(
    vocab_size=VOCAB, pred_hidden=8, n_layers=1, enc_hidden=12, joint_hidden=8
)
DCFG = TdtDecodeConfig(blank_id=VOCAB, durations=(0, 1, 2, 3, 4), max_symbols_per_step=4,
                       max_tokens=64)


@pytest.fixture(scope="module")
def modules():
    predictor = RnntPredictor(PCFG)
    joint = RnntJoint(PCFG)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tok = jnp.zeros((2,), jnp.int32)
    h = jnp.zeros((PCFG.n_layers, 2, PCFG.pred_hidden))
    c = jnp.zeros_like(h)
    pparams = predictor.init(k1, tok, h, c)
    jparams = joint.init(
        k2, jnp.zeros((2, PCFG.enc_hidden)), jnp.zeros((2, PCFG.pred_hidden))
    )
    return predictor, pparams, joint, jparams


def python_reference_decode(modules, enc_row, enc_len, cfg):
    """Sequential single-row greedy TDT with the exact same semantics."""
    predictor, pparams, joint, jparams = modules
    durations = np.array(cfg.durations)

    def pred_step(token, h, c):
        g, h2, c2 = predictor.apply(
            pparams, jnp.array([token], jnp.int32), h, c
        )
        return g, h2, c2

    h = jnp.zeros((PCFG.n_layers, 1, PCFG.pred_hidden))
    c = jnp.zeros_like(h)
    g, h, c = pred_step(cfg.blank_id, h, c)
    t, sym, last = 0, 0, cfg.blank_id
    out, times = [], []
    while t < enc_len and len(out) < cfg.max_tokens:
        f = enc_row[None, t]
        logits = np.asarray(joint.apply(jparams, jnp.asarray(f), g))[0]
        token_logits = logits[: -len(cfg.durations)]
        dur = durations[int(np.argmax(logits[-len(cfg.durations):]))]
        k = int(np.argmax(token_logits))
        force = sym >= cfg.max_symbols_per_step
        blank = (k == cfg.blank_id) or force
        if not blank:
            out.append(k)
            times.append(t)
            g, h, c = pred_step(k, h, c)
            last = k
        adv = max(dur, 1) if blank else dur
        if force:
            adv = max(adv, 1)
        t += adv
        sym = 0 if adv > 0 else sym + (0 if blank else 1)
    return out, times, max(t - enc_len, 0)


@pytest.mark.quick
def test_batched_matches_sequential(modules):
    predictor, pparams, joint, jparams = modules
    rng = np.random.RandomState(42)
    B, T = 4, 24
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32) * 2.0
    lengths = np.array([24, 15, 7, 1], np.int32)

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        return joint.apply(jparams, f, g)

    state = make_initial_state(DCFG, PCFG.n_layers, PCFG.pred_hidden, B)
    result = jax.jit(
        lambda e, l, s: tdt_greedy_decode(DCFG, predictor_step, joint_logits, e, l, s)
    )(jnp.asarray(enc), jnp.asarray(lengths), state)

    for b in range(B):
        ref_tokens, ref_times, ref_jump = python_reference_decode(
            modules, enc[b], int(lengths[b]), DCFG
        )
        n = int(result.counts[b])
        assert list(np.asarray(result.tokens[b][:n])) == ref_tokens, f"row {b}"
        assert list(np.asarray(result.token_times[b][:n])) == ref_times, f"row {b}"
        assert int(result.state.time_jump[b]) == ref_jump, f"row {b}"


def test_decode_terminates_on_adversarial_logits(modules):
    """max_symbols_per_step must prevent livelock when argmax is never blank."""
    predictor, pparams, joint, jparams = modules
    B, T = 2, 8
    enc = np.full((B, T, PCFG.enc_hidden), 3.0, np.float32)
    lengths = np.array([T, T], np.int32)

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        logits = joint.apply(jparams, f, g)
        # force non-blank argmax and duration bin 0 every step
        logits = logits.at[:, DCFG.blank_id].set(-1e9)
        nd = len(DCFG.durations)
        logits = logits.at[:, -nd:].set(jnp.array([10.0, 0, 0, 0, 0]))
        return logits

    state = make_initial_state(DCFG, PCFG.n_layers, PCFG.pred_hidden, B)
    result = tdt_greedy_decode(
        DCFG, predictor_step, joint_logits, jnp.asarray(enc), jnp.asarray(lengths), state
    )
    # emits max_symbols_per_step per frame then force-advances: finite count
    assert int(result.counts[0]) == T * DCFG.max_symbols_per_step


def test_rnnt_mode_no_durations(modules):
    """n_durations=0 behaves like classic greedy RNN-T (advance only on blank)."""
    predictor, pparams, joint, jparams = modules
    cfg = TdtDecodeConfig(blank_id=VOCAB, durations=(), max_symbols_per_step=4,
                          max_tokens=32)
    B, T = 2, 10
    rng = np.random.RandomState(1)
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32)
    lengths = np.array([10, 5], np.int32)

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        nd = len(DCFG.durations)
        return joint.apply(jparams, f, g)[:, :-nd]  # strip duration logits

    state = make_initial_state(cfg, PCFG.n_layers, PCFG.pred_hidden, B)
    result = tdt_greedy_decode(
        cfg, predictor_step, joint_logits, jnp.asarray(enc), jnp.asarray(lengths), state
    )
    assert int(result.counts.max()) <= cfg.max_tokens
    assert np.all(np.asarray(result.state.time_jump) == 0)



def test_carried_state_roundtrip_matches_single_decode(modules):
    """Decoding [enc_a | enc_b] in one call == decoding enc_a then enc_b
    with the carried state: the warm start must reproduce (not repeat) the
    in-loop predictor step for last_token."""
    predictor, pparams, joint, jparams = modules

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        return joint.apply(jparams, f, g)

    # classic RNN-T mode (no duration jumps) so the halves partition the
    # frames exactly and the comparison is well-defined
    cfg = TdtDecodeConfig(blank_id=VOCAB, durations=(), max_symbols_per_step=4,
                          max_tokens=64)
    rng = np.random.RandomState(11)
    B, T = 2, 12
    enc = jnp.asarray(rng.randn(B, T, PCFG.enc_hidden).astype(np.float32) * 2.0)
    full = tdt_greedy_decode(
        cfg, predictor_step, joint_logits, enc, jnp.full((B,), T, jnp.int32),
        make_initial_state(cfg, PCFG.n_layers, PCFG.pred_hidden, B),
    )

    half = T // 2
    r1 = tdt_greedy_decode(
        cfg, predictor_step, joint_logits, enc[:, :half],
        jnp.full((B,), half, jnp.int32),
        make_initial_state(cfg, PCFG.n_layers, PCFG.pred_hidden, B),
    )
    r2 = tdt_greedy_decode(
        cfg, predictor_step, joint_logits, enc[:, half:],
        jnp.full((B,), half, jnp.int32),
        r1.state._replace(time_jump=jnp.zeros_like(r1.state.time_jump)),
    )

    for b in range(B):
        want = list(np.asarray(full.tokens[b][: int(full.counts[b])]))
        got = list(np.asarray(r1.tokens[b][: int(r1.counts[b])])) + list(
            np.asarray(r2.tokens[b][: int(r2.counts[b])])
        )
        assert got == want, (b, got, want)


# --------------------------------------------------------------------------
# Last-chunk finalization flush (TdtDecoderV3.swift:469-578,
# TdtDecoderChunkTests.swift: testLastChunkFinalizationFrameVariations /
# testConsecutiveBlankLimitInFinalization / testLastChunkTimestampCalculation)
# --------------------------------------------------------------------------


def _run(modules, cfg, enc, lengths, finalize=None, joint_override=None):
    predictor, pparams, joint, jparams = modules

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        logits = joint.apply(jparams, f, g)
        return joint_override(logits) if joint_override else logits

    state = make_initial_state(cfg, PCFG.n_layers, PCFG.pred_hidden, enc.shape[0])
    return tdt_greedy_decode(
        cfg, predictor_step, joint_logits, jnp.asarray(enc),
        jnp.asarray(lengths), state,
        finalize_mask=None if finalize is None else jnp.asarray(finalize),
    )


def test_finalize_flush_emits_pending_tokens(modules):
    """A joint that keeps proposing non-blanks at the boundary frames emits
    up to max_symbols_per_step extra tokens from the flush."""
    B, T = 2, 6
    rng = np.random.RandomState(3)
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32)
    lengths = np.array([T, T], np.int32)

    def never_blank(logits):
        logits = logits.at[:, DCFG.blank_id].set(-1e9)
        nd = len(DCFG.durations)
        # duration bin -> 4 so the main loop exits in 2 steps/row
        return logits.at[:, -nd:].set(jnp.array([0.0, 0, 0, 0, 10.0]))

    base = _run(modules, DCFG, enc, lengths, joint_override=never_blank)
    flushed = _run(modules, DCFG, enc, lengths,
                   finalize=np.array([True, True]), joint_override=never_blank)
    for b in range(B):
        extra = int(flushed.counts[b]) - int(base.counts[b])
        assert extra == DCFG.max_symbols_per_step, (b, extra)
        # flush timestamps are clamped to the last valid frame
        n = int(flushed.counts[b])
        assert np.all(np.asarray(flushed.token_times[b][:n]) <= T - 1)
    # finalized rows report no overshoot carry
    assert np.all(np.asarray(flushed.state.time_jump) == 0)


def test_finalize_flush_stops_on_consecutive_blanks(modules):
    """All-blank joints terminate the flush after consecutive_blank_limit
    probes with zero extra emissions."""
    B, T = 1, 5
    enc = np.zeros((B, T, PCFG.enc_hidden), np.float32)
    lengths = np.array([T], np.int32)

    def always_blank(logits):
        return logits.at[:, DCFG.blank_id].set(1e9)

    base = _run(modules, DCFG, enc, lengths, joint_override=always_blank)
    flushed = _run(modules, DCFG, enc, lengths, finalize=np.array([True]),
                   joint_override=always_blank)
    assert int(base.counts[0]) == 0
    assert int(flushed.counts[0]) == 0


def test_finalize_mask_false_row_is_untouched(modules):
    """Mixed batch: the non-finalized row must decode exactly as without any
    flush (including its time_jump carry)."""
    rng = np.random.RandomState(7)
    B, T = 2, 16
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32) * 2.0
    lengths = np.array([T, 12], np.int32)

    base = _run(modules, DCFG, enc, lengths)
    mixed = _run(modules, DCFG, enc, lengths, finalize=np.array([True, False]))

    n = int(base.counts[1])
    assert int(mixed.counts[1]) == n
    assert list(np.asarray(mixed.tokens[1][:n])) == list(np.asarray(base.tokens[1][:n]))
    assert int(mixed.state.time_jump[1]) == int(base.state.time_jump[1])
    # ...while the finalized row's carry is zeroed (reference returns nil)
    assert int(mixed.state.time_jump[0]) == 0


def test_finalize_flush_advances_predictor_state(modules):
    """Flushed emissions must update last_token/LSTM state like main-loop
    emissions (reference updates hypothesis.decState in the flush)."""
    B, T = 1, 4
    rng = np.random.RandomState(9)
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32)
    lengths = np.array([T], np.int32)

    def never_blank(logits):
        logits = logits.at[:, DCFG.blank_id].set(-1e9)
        nd = len(DCFG.durations)
        return logits.at[:, -nd:].set(jnp.array([0.0, 0, 0, 0, 10.0]))

    base = _run(modules, DCFG, enc, lengths, joint_override=never_blank)
    flushed = _run(modules, DCFG, enc, lengths, finalize=np.array([True]),
                   joint_override=never_blank)
    n = int(flushed.counts[0])
    assert int(flushed.state.last_token[0]) == int(flushed.tokens[0][n - 1])
    # flush emitted something beyond the main loop, so the carry differs
    assert n > int(base.counts[0])


def test_decode_records_predicted_durations(modules):
    """result.durations[b, i] = the duration bin value predicted at emission
    (reference hypothesis.tokenDurations)."""
    predictor, pparams, joint, jparams = modules
    rng = np.random.RandomState(21)
    B, T = 2, 16
    enc = rng.randn(B, T, PCFG.enc_hidden).astype(np.float32) * 2.0
    lengths = np.array([T, 12], np.int32)

    def predictor_step(tokens, h, c):
        return predictor.apply(pparams, tokens, h, c)

    def joint_logits(f, g):
        return joint.apply(jparams, f, g)

    state = make_initial_state(DCFG, PCFG.n_layers, PCFG.pred_hidden, B)
    result = tdt_greedy_decode(
        DCFG, predictor_step, joint_logits, jnp.asarray(enc),
        jnp.asarray(lengths), state,
    )
    assert result.durations is not None
    for b in range(B):
        n = int(result.counts[b])
        durs = np.asarray(result.durations[b][:n])
        times = np.asarray(result.token_times[b][:n])
        assert np.all((durs >= 0) & (durs <= max(DCFG.durations)))
        # time advance equals the recorded durations between emissions on
        # different frames (same-frame repeats have dur 0)
        for i in range(n - 1):
            if times[i + 1] != times[i]:
                assert times[i + 1] >= times[i] + durs[i] or durs[i] == 0
