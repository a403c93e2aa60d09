"""Loss tests: CTC vs brute-force, transducer lattice vs exhaustive DP and
vs torchaudio-free numpy oracle, label smoothing, gradient finiteness."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from summarymixing_tpu.losses import ctc_loss, kldiv_loss, nll_loss, transducer_loss
from summarymixing_tpu.losses.transducer import transducer_lattice_logprob


def np_rnnt_logprob(blank_lp, label_lp, t_len, u_len):
    """Reference DP, one utterance: standard alpha recursion."""
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for u in range(1, u_len + 1):
        alpha[0, u] = alpha[0, u - 1] + label_lp[0, u - 1]
    for t in range(1, t_len):
        alpha[t, 0] = alpha[t - 1, 0] + blank_lp[t - 1, 0]
        for u in range(1, u_len + 1):
            alpha[t, u] = np.logaddexp(
                alpha[t - 1, u] + blank_lp[t - 1, u],
                alpha[t, u - 1] + label_lp[t, u - 1],
            )
    return alpha[t_len - 1, u_len] + blank_lp[t_len - 1, u_len]


def test_transducer_lattice_matches_dp(rng):
    b, t, u1 = 3, 7, 5
    blank = np.log(rng.random((b, t, u1)).astype(np.float32) * 0.9 + 0.05)
    label = np.log(rng.random((b, t, u1)).astype(np.float32) * 0.9 + 0.05)
    t_lens = np.array([7, 5, 3])
    u_lens = np.array([4, 2, 0])
    got = np.asarray(
        transducer_lattice_logprob(
            jnp.asarray(blank), jnp.asarray(label),
            jnp.asarray(t_lens), jnp.asarray(u_lens),
        )
    )
    for i in range(b):
        want = np_rnnt_logprob(blank[i], label[i], t_lens[i], u_lens[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_transducer_loss_is_proper_nll(rng):
    """Sum of P(y|x) over ALL label sequences of length <= U must be <= 1,
    and for a tiny case the lattice must equal explicit path enumeration."""
    t_len, u_len, v = 3, 2, 3
    logits = rng.standard_normal((1, t_len, u_len + 1, v)).astype(np.float32)
    targets = np.array([[1, 2]])
    loss = transducer_loss(
        jnp.asarray(logits), jnp.asarray(targets),
        jnp.asarray([t_len]), jnp.asarray([u_len]), reduction="none",
    )
    # enumerate all monotonic alignments: paths of T blanks and U labels
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lp = np.asarray(lp)[0]
    total = -np.inf
    # all interleavings: positions of label emissions among t steps
    for label_times in itertools.combinations_with_replacement(range(t_len), u_len):
        p = 0.0
        tt, uu = 0, 0
        path_lp = 0.0
        lt = list(label_times)
        ok = True
        while tt < t_len:
            while uu < u_len and lt and lt[0] == tt:
                path_lp += lp[tt, uu, targets[0, uu]]
                uu += 1
                lt.pop(0)
            path_lp += lp[tt, uu, 0]  # blank advances time
            tt += 1
        if uu == u_len:
            total = np.logaddexp(total, path_lp)
    np.testing.assert_allclose(-float(loss[0]), total, rtol=1e-4)


def test_transducer_grad_finite(rng):
    b, t, u1, v = 2, 6, 4, 5
    logits = jnp.asarray(rng.standard_normal((b, t, u1, v)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, v, (b, u1 - 1)), jnp.int32)

    def f(lg):
        return transducer_loss(
            lg, targets, jnp.asarray([t, t - 2]), jnp.asarray([3, 1])
        )

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    # logits at padded time steps must get zero gradient
    gn = np.asarray(g)
    assert np.abs(gn[1, t - 2:]).max() == 0.0


def np_ctc_logprob(log_probs, labels, blank=0):
    """Brute-force CTC via the standard alpha recursion (one utterance)."""
    ext = [blank]
    for l in labels:
        ext += [l, blank]
    s = len(ext)
    t_len = log_probs.shape[0]
    alpha = np.full((t_len, s), -np.inf)
    alpha[0, 0] = log_probs[0, blank]
    if s > 1:
        alpha[0, 1] = log_probs[0, ext[1]]
    for t in range(1, t_len):
        for i in range(s):
            cands = [alpha[t - 1, i]]
            if i > 0:
                cands.append(alpha[t - 1, i - 1])
            if i > 1 and ext[i] != blank and ext[i] != ext[i - 2]:
                cands.append(alpha[t - 1, i - 2])
            alpha[t, i] = np.logaddexp.reduce(cands) + log_probs[t, ext[i]]
    return np.logaddexp(alpha[-1, -1], alpha[-1, -2] if s > 1 else -np.inf)


def test_ctc_matches_bruteforce(rng):
    t_len, v = 6, 5
    logits = rng.standard_normal((2, t_len, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = np.array([[1, 2, 2, 0], [3, 0, 0, 0]])
    lab_lens = np.array([3, 1])
    in_lens = np.array([6, 4])
    loss = np.asarray(
        ctc_loss(jnp.asarray(lp), jnp.asarray(in_lens), jnp.asarray(labels),
                 jnp.asarray(lab_lens), reduction="none")
    )
    for i in range(2):
        want = -np_ctc_logprob(lp[i, : in_lens[i]], labels[i, : lab_lens[i]])
        np.testing.assert_allclose(loss[i], want, rtol=1e-4, atol=1e-4)


def test_kldiv_no_smoothing_is_nll(rng):
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.standard_normal((2, 4, 6)),
                                       jnp.float32), axis=-1)
    )
    tgt = rng.integers(0, 6, (2, 4))
    lens = np.array([4, 2])
    a = kldiv_loss(jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(lens))
    b = nll_loss(jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    want = 0.0
    for i, L in enumerate(lens):
        want += -lp[i, np.arange(L), tgt[i, :L]].mean() / 2
    np.testing.assert_allclose(np.asarray(a), want, rtol=1e-6)


def test_kldiv_smoothing_penalises_confidence(rng):
    v = 10
    tgt = jnp.asarray([[3]])
    conf = jax.nn.log_softmax(
        jnp.where(jnp.arange(v) == 3, 50.0, 0.0)[None, None, :]
    )
    soft = jax.nn.log_softmax(
        jnp.where(jnp.arange(v) == 3, 2.0, 0.0)[None, None, :]
    )
    smooth = 0.3
    l_conf = kldiv_loss(conf, tgt, label_smoothing=smooth)
    l_soft = kldiv_loss(soft, tgt, label_smoothing=smooth)
    # with heavy smoothing, the overconfident model is worse
    assert float(l_conf) > float(l_soft)


def test_ctc_matches_optax(rng):
    """The native unrolled alpha recursion == optax.ctc_loss across lengths
    (incl. zero-length targets, repeated labels, padded frames)."""
    import optax
    from summarymixing_tpu.losses.ctc import ctc_loss

    b, t, v, u = 4, 20, 9, 5
    logits = jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32)
    lp = jax.nn.log_softmax(logits, -1)
    targets = jnp.asarray([[1, 2, 2, 3, 4],
                           [5, 5, 5, 0, 0],
                           [1, 0, 0, 0, 0],
                           [0, 0, 0, 0, 0]], jnp.int32)
    tlens = jnp.asarray([5, 3, 1, 0])
    ilens = jnp.asarray([20, 14, 9, 6])
    ours = ctc_loss(lp, ilens, targets, tlens, reduction="none")
    logit_pad = (jnp.arange(t)[None, :] >= ilens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(u)[None, :] >= tlens[:, None]).astype(jnp.float32)
    want = optax.ctc_loss(lp, logit_pad, targets, label_pad, blank_id=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # gradients finite
    g = jax.grad(lambda x: ctc_loss(jax.nn.log_softmax(x, -1), ilens,
                                    targets, tlens))(logits)
    assert np.isfinite(np.asarray(g)).all()


class TestChunkedTransducerLoss:
    """transducer_loss_chunked == transducer_loss (values AND grads) for
    every reduction, chunk size (divisor, ragged, one-chunk, oversize),
    and ragged input/target lengths incl. empty targets."""

    def _setup(self, rng):
        from summarymixing_tpu.models.transducer import TransducerModel

        B, T, U, V = 3, 23, 7, 11
        td = TransducerModel(vocab=V, dec_dim=8, joint_dim=16,
                             emb_dropout=0.0, dec_dropout=0.0)
        enc_out = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
        targets = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
        toks_bos = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), targets], axis=1)
        params = td.init(jax.random.PRNGKey(0), enc_out, toks_bos,
                         method=td.init_all)
        in_lens = jnp.asarray([23, 17, 9])
        tg_lens = jnp.asarray([7, 4, 0])
        return td, params, enc_out, targets, toks_bos, in_lens, tg_lens

    def _both(self, td, params, enc_out, targets, toks_bos, in_lens,
              tg_lens, reduction, chunk):
        from summarymixing_tpu.losses import transducer_loss_chunked

        def dense(p):
            logits = td.apply(p, enc_out, toks_bos)
            return transducer_loss(logits, targets, in_lens, tg_lens,
                                   reduction=reduction)

        def chunked(p):
            m = td.bind(p)
            enc_proj = m.encode_proj(enc_out)
            dec_proj = m.predictor(toks_bos, deterministic=True)
            return transducer_loss_chunked(
                enc_proj, dec_proj,
                lambda e, d: td.apply(
                    p, e, d, method=lambda mod, e, d: mod.joint(e, d)),
                targets, in_lens, tg_lens, reduction=reduction,
                chunk_size=chunk)

        return dense, chunked

    @pytest.mark.parametrize("reduction", ["mean", "sum", "batchmean",
                                           "none"])
    @pytest.mark.parametrize("chunk", [5, 8, 23, 64])
    def test_value_parity(self, rng, reduction, chunk):
        td, params, *rest = self._setup(rng)
        dense, chunked = self._both(td, params, *rest, reduction, chunk)
        a, c = dense(params), chunked(params)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-5)

    def test_grad_parity(self, rng):
        td, params, *rest = self._setup(rng)
        dense, chunked = self._both(td, params, *rest, "mean", 8)
        ga = jax.grad(dense)(params)
        gc = jax.grad(chunked)(params)
        errs = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), ga, gc)
        assert max(jax.tree.leaves(errs)) < 1e-4
