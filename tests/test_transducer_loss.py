"""RNN-T and TDT losses vs brute-force path enumeration on small lattices."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidaudio_tpu.train.transducer_loss import rnnt_loss, tdt_loss


def brute_rnnt(log_probs, labels, T, U, blank):
    """Enumerate all (T+U choose U) monotonic paths; sum path probs."""
    # a path is an interleaving of T blanks and U emits; state (t, u)
    total = -np.inf
    for mask in itertools.combinations(range(T + U), U):
        emits = set(mask)
        t, u, score = 0, 0, 0.0
        ok = True
        for step in range(T + U):
            if step in emits:
                if u >= U or t >= T:
                    ok = False
                    break
                score += log_probs[t, u, labels[u]]
                u += 1
            else:
                if t >= T:
                    ok = False
                    break
                score += log_probs[t, u, blank]
                t += 1
        if ok and t == T and u == U:
            total = np.logaddexp(total, score)
    return -total


def brute_tdt(tok, dur, durations, labels, T, U, blank):
    """DFS over (t, u) with (symbol, duration) moves; blank needs d >= 1."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def beta(t, u):
        # total log-prob of completing from state (t, u); the path must end
        # with a blank landing exactly on frame T
        if t == T:
            return -np.inf
        total = -np.inf
        for di, d in enumerate(durations):
            if t + d > T:
                continue
            # blank move (d >= 1): (t, u) -> (t+d, u)
            if d >= 1:
                s = tok[t, u, blank] + dur[t, u, di]
                if t + d == T:
                    nxt = 0.0 if u == U else -np.inf
                else:
                    nxt = beta(t + d, u)
                total = np.logaddexp(total, s + nxt)
            # token move: (t, u) -> (t+d, u+1); landing on T is a dead end
            if u < U and t + d < T:
                s = tok[t, u, labels[u]] + dur[t, u, di]
                total = np.logaddexp(total, s + beta(t + d, u + 1))
        return total

    return -beta(0, 0)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


class TestRnntLoss:
    def test_matches_brute_force(self, rng):
        T, U, V, blank = 4, 3, 5, 4
        logits = rng.randn(1, T, U + 1, V).astype(np.float32)
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        labels = rng.randint(0, blank, (1, U)).astype(np.int32)
        loss = rnnt_loss(log_probs, jnp.asarray(labels),
                         jnp.array([T]), jnp.array([U]), blank)
        ref = brute_rnnt(np.asarray(log_probs)[0], labels[0], T, U, blank)
        np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-5)

    def test_batch_with_mixed_lengths(self, rng):
        T, U, V, blank = 5, 3, 6, 5
        logits = rng.randn(3, T, U + 1, V).astype(np.float32)
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        labels = rng.randint(0, blank, (3, U)).astype(np.int32)
        t_len = np.array([5, 4, 3])
        u_len = np.array([3, 2, 0])
        loss = rnnt_loss(log_probs, jnp.asarray(labels),
                         jnp.asarray(t_len), jnp.asarray(u_len), blank)
        for b in range(3):
            ref = brute_rnnt(np.asarray(log_probs)[b, :t_len[b]],
                             labels[b], t_len[b], u_len[b], blank)
            np.testing.assert_allclose(float(loss[b]), ref, rtol=1e-5,
                                       err_msg=f"row {b}")

    def test_gradients_finite(self, rng):
        T, U, V, blank = 4, 2, 5, 4
        logits = jnp.asarray(rng.randn(2, T, U + 1, V), jnp.float32)
        labels = jnp.asarray(rng.randint(0, blank, (2, U)), jnp.int32)

        def f(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return jnp.sum(rnnt_loss(lp, labels, jnp.array([T, T]),
                                     jnp.array([U, U]), blank))

        g = jax.grad(f)(logits)
        assert np.all(np.isfinite(np.asarray(g)))
        # gradient wrt log-softmax inputs sums to ~0 per (t,u) slice
        np.testing.assert_allclose(np.asarray(jnp.sum(g, axis=-1)), 0.0, atol=1e-4)


class TestTdtLoss:
    def test_matches_brute_force(self, rng):
        T, U, V, blank = 4, 2, 4, 3
        durations = (0, 1, 2)
        tok = jax.nn.log_softmax(
            jnp.asarray(rng.randn(1, T, U + 1, V), jnp.float32), axis=-1)
        dur = jax.nn.log_softmax(
            jnp.asarray(rng.randn(1, T, U + 1, len(durations)), jnp.float32), axis=-1)
        labels = rng.randint(0, blank, (1, U)).astype(np.int32)
        loss = tdt_loss(tok, dur, durations, jnp.asarray(labels),
                        jnp.array([T]), jnp.array([U]), blank)
        ref = brute_tdt(np.asarray(tok)[0], np.asarray(dur)[0], durations,
                        labels[0], T, U, blank)
        np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-4)

    def test_no_zero_duration_variant(self, rng):
        T, U, V, blank = 5, 2, 4, 3
        durations = (1, 2)
        tok = jax.nn.log_softmax(
            jnp.asarray(rng.randn(1, T, U + 1, V), jnp.float32), axis=-1)
        dur = jax.nn.log_softmax(
            jnp.asarray(rng.randn(1, T, U + 1, 2), jnp.float32), axis=-1)
        labels = rng.randint(0, blank, (1, U)).astype(np.int32)
        loss = tdt_loss(tok, dur, durations, jnp.asarray(labels),
                        jnp.array([T]), jnp.array([U]), blank)
        ref = brute_tdt(np.asarray(tok)[0], np.asarray(dur)[0], durations,
                        labels[0], T, U, blank)
        np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-4)

    def test_gradients_finite(self, rng):
        T, U, V, blank = 4, 2, 4, 3
        durations = (0, 1, 2)
        tok_logits = jnp.asarray(rng.randn(2, T, U + 1, V), jnp.float32)
        dur_logits = jnp.asarray(rng.randn(2, T, U + 1, 3), jnp.float32)
        labels = jnp.asarray(rng.randint(0, blank, (2, U)), jnp.int32)

        def f(tl, dl):
            return jnp.sum(tdt_loss(
                jax.nn.log_softmax(tl, axis=-1), jax.nn.log_softmax(dl, axis=-1),
                durations, labels, jnp.array([T, T]), jnp.array([U, U]), blank))

        gt, gd = jax.grad(f, argnums=(0, 1))(tok_logits, dur_logits)
        assert np.all(np.isfinite(np.asarray(gt)))
        assert np.all(np.isfinite(np.asarray(gd)))
