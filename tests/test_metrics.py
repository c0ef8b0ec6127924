"""Metric parity vs the nltk oracle (the reference's own validation strategy,
dev/dev_corpus_metrics.py:92-95 checks custom BLEU against nltk corpus_bleu)."""

import numpy as np
import pytest
from nltk.translate.bleu_score import corpus_bleu as nltk_bleu
from nltk.translate.gleu_score import corpus_gleu as nltk_gleu

from sat_tpu.evalx.metrics import (corpus_bleu, corpus_gleu,
                                   embedding_cosine_similarity, score_captions)


def random_corpus(seed, n=40, vocab=30, multi_ref=3):
    rng = np.random.default_rng(seed)
    refs, hyps = [], []
    for _ in range(n):
        refs.append([[f"w{t}" for t in rng.integers(0, vocab, rng.integers(3, 15))]
                     for _ in range(multi_ref)])
        hyps.append([f"w{t}" for t in rng.integers(0, vocab, rng.integers(3, 15))])
    return refs, hyps


WEIGHTS = [(1, 0, 0, 0), (0.5, 0.5, 0, 0), (1/3, 1/3, 1/3, 0),
           (0.25, 0.25, 0.25, 0.25)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bleu_matches_nltk(seed):
    refs, hyps = random_corpus(seed)
    for w in WEIGHTS:
        got = corpus_bleu(refs, hyps, w)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = nltk_bleu(refs, hyps, weights=w)
        assert abs(got - want) < 1e-9, (w, got, want)


def test_bleu_near_identical_hypotheses():
    refs, hyps = random_corpus(5)
    hyps = [r[0] for r in refs]  # perfect hypotheses
    assert abs(corpus_bleu(refs, hyps, (1, 0, 0, 0)) - 1.0) < 1e-9
    for w in WEIGHTS:  # higher orders: nltk clamps short-hyp denominators
        got = corpus_bleu(refs, hyps, w)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = nltk_bleu(refs, hyps, weights=w)
        assert abs(got - want) < 1e-9


@pytest.mark.parametrize("seed", [0, 3])
def test_gleu_matches_nltk(seed):
    refs, hyps = random_corpus(seed)
    got = corpus_gleu(refs, hyps)
    want = nltk_gleu(refs, hyps)
    assert abs(got - want) < 1e-9


def test_gleu_the_the_example():
    ref = "the cat is on the mat".split()
    hyp = "the the the the the the the".split()
    assert abs(corpus_gleu([[ref]], [hyp]) - 0.0909090909) < 1e-6


def test_cosine_similarity_bounds_and_perfect_match():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(20, 8))
    caps = [[1, 2, 3], [4, 5]]
    refs = [[[1, 2, 3], [7, 8, 9]], [[10, 11], [4, 5]]]
    sim = embedding_cosine_similarity(emb, caps, refs)
    assert abs(sim - 1.0) < 1e-9  # identical best refs -> cos 1


def test_score_captions_bundle():
    rng = np.random.default_rng(0)
    b, r, t = 4, 3, 10
    enc = rng.integers(1, 20, size=(b, r, t))
    lengths = rng.integers(3, t - 1, size=(b, r))
    caps = [list(enc[i][0][1:lengths[i][0]]) for i in range(b)]  # copy ref 0
    emb = rng.normal(size=(25, 6))
    m = score_captions(caps, enc, lengths, embedding=emb, perplexities=[2.0, 4.0])
    assert abs(m["bleu1"] - 1.0) < 1e-9  # copies of ref 0 -> perfect unigrams
    assert m["perplexity"] == 3.0
    assert set(m) == {"bleu1", "bleu2", "bleu3", "bleu4", "gleu",
                      "cosine_similarity", "perplexity"}
    # nltk cross-check of the bundle path (ids as tokens)
    refs_tok = [[list(map(int, enc[i][j][1:lengths[i][j]])) for j in range(r)]
                for i in range(b)]
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want4 = nltk_bleu(refs_tok, caps, weights=(0.25,) * 4)
    assert abs(m["bleu4"] - want4) < 1e-9


def test_cosine_vectorized_matches_loop_implementation():
    """_cosine_vectorized (the score_captions fast path) == the reference-
    style per-sentence loop, including empty-caption/empty-ref edge cases."""
    from sat_tpu.evalx.metrics import (_cosine_vectorized,
                                       embedding_cosine_similarity)
    rng = np.random.default_rng(3)
    B, R, T, V, E = 17, 5, 9, 50, 8
    emb = rng.normal(size=(V, E)).astype(np.float32)
    enc = rng.integers(1, V, (B, R, T))
    lens = rng.integers(1, T, (B, R))   # length 1 -> empty ref (only <START>)
    caps = [list(rng.integers(1, V, int(rng.integers(0, 7)))) for _ in range(B)]
    refs = [[list(map(int, enc[i][j][1:int(lens[i][j])])) for j in range(R)]
            for i in range(B)]
    slow = embedding_cosine_similarity(emb, caps, refs)
    fast = _cosine_vectorized(emb, caps, enc, lens)
    assert abs(slow - fast) < 1e-5, (slow, fast)


def test_native_corpus_stats_bitwise_matches_python():
    """The C++ corpus-stats counter returns the exact integer statistics of
    the Python _corpus_stats path (BLEU nums/dens, lengths, GLEU sums)."""
    from sat_tpu import native
    from sat_tpu.evalx.metrics import _corpus_stats, _native_corpus_stats
    if not native.available():
        pytest.skip("native lib not buildable")
    rng = np.random.default_rng(9)
    for trial in range(5):
        B, R, T, V = int(rng.integers(1, 30)), 5, 12, 40
        enc = rng.integers(1, V, (B, R, T)).astype(np.int32)
        lens = rng.integers(1, T, (B, R)).astype(np.int32)  # 1 -> empty ref
        caps = [list(map(int, rng.integers(1, V, int(rng.integers(0, 10)))))
                for _ in range(B)]
        refs_lists = [[list(map(int, enc[i][j][1:int(lens[i][j])]))
                       for j in range(R)] for i in range(B)]
        py = _corpus_stats(refs_lists, caps, max_n=4)
        nat = _native_corpus_stats(caps, enc, lens)
        assert nat is not None
        assert py == nat, (trial, py, nat)
