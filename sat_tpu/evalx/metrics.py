"""Caption evaluation metrics: corpus BLEU-1..4, GLEU, embedding cosine
similarity, perplexity.

Native implementations of the nltk metrics the reference calls (reference:
model.py:646-682 score_captions; the from-paper prototype lives at
dev/dev_corpus_metrics.py:6-55 and is validated against nltk — we follow the
same strategy, with nltk as the test oracle).  BLEU follows Papineni et al.
corpus BLEU exactly as nltk computes it (clipped modified precision summed over
the corpus, closest-ref-length brevity penalty, zero score when any weighted
precision is zero).  GLEU follows Wu et al. (min precision/recall over 1..4
grams, best reference per sentence)."""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _ngrams(seq: Sequence, n: int):
    return zip(*(seq[i:] for i in range(n)))


def _count_ngrams(seq: Sequence, n: int) -> Counter:
    return Counter(tuple(g) for g in _ngrams(seq, n))


def _everygrams(seq: Sequence, lo: int, hi: int) -> Counter:
    c: Counter = Counter()
    for n in range(lo, hi + 1):
        c.update(tuple(g) for g in _ngrams(seq, n))
    return c


def modified_precision(references: Sequence[Sequence], hypothesis: Sequence,
                       n: int) -> Tuple[int, int]:
    """Clipped n-gram match count and total (Papineni et al. Sec 2.1)."""
    hyp_counts = _count_ngrams(hypothesis, n)
    max_ref: Counter = Counter()
    for ref in references:
        for g, c in _count_ngrams(ref, n).items():
            if c > max_ref[g]:
                max_ref[g] = c
    clipped = sum(min(c, max_ref[g]) for g, c in hyp_counts.items())
    # nltk clamps the denominator to 1 for hypotheses shorter than n
    return clipped, max(1, sum(hyp_counts.values()))


def closest_ref_length(references: Sequence[Sequence], hyp_len: int) -> int:
    """Closest reference length; ties break toward the shorter (nltk rule)."""
    return min((abs(len(r) - hyp_len), len(r)) for r in references)[1]


def _corpus_stats(list_of_references: Sequence[Sequence[Sequence]],
                  hypotheses: Sequence[Sequence], max_n: int = 4):
    """One pass over the corpus: per-order clipped-precision sums (BLEU) and
    per-sentence best-reference match/total sums (GLEU), counting each
    sentence's n-grams exactly once for all orders.

    GLEU note: everygram-counter intersection equals the sum of per-order
    intersections because tuples of different lengths are distinct keys."""
    assert len(list_of_references) == len(hypotheses)
    num = [0] * (max_n + 1)
    den = [0] * (max_n + 1)
    hyp_len_total, ref_len_total = 0, 0
    gleu_match, gleu_all = 0, 0
    for refs, hyp in zip(list_of_references, hypotheses):
        hyp_len_total += len(hyp)
        ref_len_total += closest_ref_length(refs, len(hyp))
        hyp_c = [_count_ngrams(hyp, n) for n in range(1, max_n + 1)]
        refs_c = [[_count_ngrams(ref, n) for n in range(1, max_n + 1)]
                  for ref in refs]
        for i, hc in enumerate(hyp_c):
            max_ref: Counter = Counter()
            for rc in refs_c:
                for g, c in rc[i].items():
                    if c > max_ref[g]:
                        max_ref[g] = c
            num[i + 1] += sum(min(c, max_ref[g]) for g, c in hc.items())
            # nltk clamps the denominator to 1 for hypotheses shorter than n
            den[i + 1] += max(1, sum(hc.values()))
        tpfp = sum(sum(c.values()) for c in hyp_c)
        candidates = []
        for rc in refs_c:
            tpfn = sum(sum(c.values()) for c in rc)
            tp = sum(sum((rcn & hcn).values()) for rcn, hcn in zip(rc, hyp_c))
            n_all = max(tpfp, tpfn)
            if n_all > 0:
                candidates.append((tp, n_all))
        if candidates:
            m, a = max(candidates, key=lambda x: x[0] / x[1])
            gleu_match += m
            gleu_all += a
    return num, den, hyp_len_total, ref_len_total, gleu_match, gleu_all


def _bleu_from_stats(num, den, hyp_len_total, ref_len_total,
                     weights: Sequence[float]) -> float:
    if num[1] == 0:
        return 0.0
    s = 0.0
    for n in range(1, len(weights) + 1):
        w = weights[n - 1]
        if w == 0:
            continue
        if num[n] == 0:
            return 0.0  # no smoothing: any zero precision kills the product
        s += w * math.log(num[n] / den[n])
    bp = 1.0 if hyp_len_total > ref_len_total else (
        math.exp(1 - ref_len_total / max(hyp_len_total, 1))
        if hyp_len_total > 0 else 0.0)
    return bp * math.exp(s)


def corpus_bleu(list_of_references: Sequence[Sequence[Sequence]],
                hypotheses: Sequence[Sequence],
                weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25)) -> float:
    """Corpus BLEU matching nltk.translate.bleu_score.corpus_bleu (no smoothing)."""
    num, den, hl, rl, _, _ = _corpus_stats(list_of_references, hypotheses,
                                           max_n=len(weights))
    return _bleu_from_stats(num, den, hl, rl, weights)


def corpus_gleu(list_of_references: Sequence[Sequence[Sequence]],
                hypotheses: Sequence[Sequence],
                min_len: int = 1, max_len: int = 4) -> float:
    """Corpus GLEU matching nltk.translate.gleu_score.corpus_gleu."""
    assert len(list_of_references) == len(hypotheses)
    n_match_total, n_all_total = 0, 0
    for refs, hyp in zip(list_of_references, hypotheses):
        hyp_counts = _everygrams(hyp, min_len, max_len)
        tpfp = sum(hyp_counts.values())
        candidates = []
        for ref in refs:
            ref_counts = _everygrams(ref, min_len, max_len)
            tpfn = sum(ref_counts.values())
            tp = sum((ref_counts & hyp_counts).values())
            n_all = max(tpfp, tpfn)
            if n_all > 0:
                candidates.append((tp, n_all))
        if candidates:
            m, a = max(candidates, key=lambda x: x[0] / x[1])
            n_match_total += m
            n_all_total += a
    return n_match_total / n_all_total if n_all_total else 0.0


def embedding_cosine_similarity(embedding: np.ndarray,
                                captions: Sequence[Sequence[int]],
                                references: Sequence[Sequence[Sequence[int]]]
                                ) -> float:
    """Mean-embedding cosine metric (reference: model.py:660-673): mean caption
    embedding vs the max-similarity reference mean embedding, averaged."""
    sims = []
    for cap, refs in zip(captions, references):
        if len(cap) == 0:
            sims.append(0.0)
            continue
        cv = embedding[np.asarray(cap)].mean(0)
        best = -1.0
        for ref in refs:
            if len(ref) == 0:
                continue
            rv = embedding[np.asarray(ref)].mean(0)
            denom = np.linalg.norm(cv) * np.linalg.norm(rv)
            sim = float(cv @ rv / denom) if denom > 1e-8 else 0.0
            best = max(best, sim)
        sims.append(best)
    return float(np.mean(sims)) if sims else 0.0


def _native_corpus_stats(captions, encoded_captions, lengths):
    """C++ thread-pool BLEU/GLEU stats (sat_tpu/native), or None to fall back.
    References are the token runs enc[b, r, 1:l] (strip <START>, keep words)."""
    try:
        from .. import native
        pool = native.shared_pool()
    except Exception:
        return None
    if pool is None:
        return None
    b = len(captions)
    if b == 0:
        return None
    ht = max((len(c) for c in captions), default=1) or 1
    hyps = np.zeros((b, ht), np.int32)
    hyp_lens = np.zeros(b, np.int32)
    for i, c in enumerate(captions):
        hyps[i, :len(c)] = c
        hyp_lens[i] = len(c)
    enc = np.asarray(encoded_captions, np.int32)
    refs = enc[:, :, 1:]                                   # strip <START>
    ref_lens = np.asarray(lengths, np.int32) - 1           # word-run lengths
    return pool.corpus_stats(hyps, hyp_lens, refs, np.maximum(ref_lens, 0))


def _cosine_vectorized(embedding: np.ndarray,
                       captions: Sequence[Sequence[int]],
                       encoded_captions: np.ndarray,
                       lengths: np.ndarray) -> float:
    """embedding_cosine_similarity computed with batched numpy over the
    (B, R, T) reference arrays — same result, no per-sentence python loop."""
    emb = np.asarray(embedding)
    enc = np.asarray(encoded_captions)
    lens = np.asarray(lengths)
    b, r, t = enc.shape
    # reference mean embeddings over tokens 1..l-1 (strip <START>, <END>/pads);
    # chunked over the batch so the (chunk, R, T, E) lookup temporary stays
    # small at validation shapes
    pos = np.arange(t)[None, None, :]
    mask = (pos >= 1) & (pos < lens[:, :, None])          # (B, R, T)
    rv = np.empty((b, r, emb.shape[1]), emb.dtype)        # (B, R, E)
    chunk = max(1, 2_000_000 // max(r * t * emb.shape[1], 1))
    for lo in range(0, b, chunk):
        sl = slice(lo, lo + chunk)
        rv[sl] = (emb[enc[sl]] * mask[sl, ..., None]).sum(2) / np.maximum(
            mask[sl].sum(2)[..., None], 1)
    # caption mean embeddings (pad the ragged captions with a masked column)
    tc = max((len(c) for c in captions), default=1) or 1
    cap_arr = np.zeros((b, tc), np.int64)
    cap_mask = np.zeros((b, tc), bool)
    for i, c in enumerate(captions):
        cap_arr[i, :len(c)] = c
        cap_mask[i, :len(c)] = True
    cv = (emb[cap_arr] * cap_mask[..., None]).sum(1) / np.maximum(
        cap_mask.sum(1)[..., None], 1)                    # (B, E)
    denom = np.linalg.norm(cv, axis=-1)[:, None] * np.linalg.norm(rv, axis=-1)
    sims = np.einsum("be,bre->br", cv, rv) / np.maximum(denom, 1e-30)
    sims = np.where(denom > 1e-8, sims, 0.0)
    ref_nonempty = mask.any(2)                            # (B, R)
    sims = np.where(ref_nonempty, sims, -1.0)             # empty refs skipped
    best = sims.max(1)
    cap_nonempty = cap_mask.any(1)
    best = np.where(cap_nonempty, best, 0.0)              # empty caption -> 0
    return float(best.mean()) if b else 0.0


def score_captions(captions: Sequence[Sequence[int]],
                   encoded_captions: np.ndarray, lengths: np.ndarray,
                   embedding: Optional[np.ndarray] = None,
                   perplexities: Optional[List[float]] = None
                   ) -> Dict[str, float]:
    """Full validation metric bundle (reference: model.py:646-682).

    encoded_captions: (B, R, T); lengths: (B, R).  References strip <START>
    and trailing <END>/pads via c[1:l] (reference: model.py:648)."""
    captions = [list(map(int, c)) for c in captions]
    # one n-gram-counting pass serves BLEU-1..4 AND GLEU (4x less host work
    # than four corpus_bleu calls — validation is host-scoring-bound on
    # few-core machines now that the device decode is fast); the native C++
    # thread-pool counter (bit-identical integer stats) takes it when built
    stats = _native_corpus_stats(captions, encoded_captions, lengths)
    if stats is None:
        references = [
            [list(map(int, refs[j][1:int(lengths[i][j])]))
             for j in range(len(refs))]
            for i, refs in enumerate(np.asarray(encoded_captions))]
        stats = _corpus_stats(references, captions, max_n=4)
    num, den, hl, rl, gm, ga = stats
    metrics = {
        "bleu1": _bleu_from_stats(num, den, hl, rl, (1, 0, 0, 0)),
        "bleu2": _bleu_from_stats(num, den, hl, rl, (0.5, 0.5, 0, 0)),
        "bleu3": _bleu_from_stats(num, den, hl, rl, (1 / 3, 1 / 3, 1 / 3, 0)),
        "bleu4": _bleu_from_stats(num, den, hl, rl, (0.25, 0.25, 0.25, 0.25)),
        "gleu": gm / ga if ga else 0.0,
    }
    if embedding is not None:
        metrics["cosine_similarity"] = _cosine_vectorized(
            np.asarray(embedding), captions, encoded_captions, lengths)
    if perplexities is not None and len(perplexities):
        metrics["perplexity"] = float(sum(perplexities) / len(perplexities))
    return metrics
