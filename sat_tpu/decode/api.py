"""Host-side caption API over the on-device search.

Reproduces the reference ``SAT.caption()`` output contract (reference:
model.py:214-235): four parallel lists over the batch — captions (token-id
lists without <START>/<END>), scores, alphas (2-D attention maps per word,
dev/todo.txt:58), perplexity — with ``return_all`` returning all beamk
hypotheses per image sorted by score (reference: model.py:450-467)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from ..config import SATConfig
from .beam import BeamResult, beam_search


def caption_from_annotations(
    params: Dict, cfg: SATConfig, annotations: jax.Array,
    grid_hw: Tuple[int, int],
    beamk: int = 3, max_gen_length: int = 32,
    temperature: Union[float, Sequence[float]] = 1.0,
    sample_method: str = "beam", sample_topk: int = 3,
    decoder_noise: Optional[float] = None,
    rescore_method: Optional[str] = None, rescore_reward: float = 0.5,
    return_all: bool = False,
    rng: Optional[jax.Array] = None,
    early_exit: bool = False,
):
    """Decode annotations (B, L, D) -> (captions, scores, alphas, perplexity)."""
    res: BeamResult = beam_search(
        params, cfg, annotations, beamk=beamk, max_gen_length=max_gen_length,
        temperature=temperature, sample_method=sample_method,
        sample_topk=sample_topk, decoder_noise=decoder_noise,
        rescore_method=rescore_method, rescore_reward=rescore_reward, rng=rng,
        early_exit=early_exit)
    return unpack_beam_result(res, grid_hw, return_all)


def unpack_beam_result(res: BeamResult, grid_hw: Tuple[int, int],
                       return_all: bool = False):
    """Convert a device BeamResult to the reference's python-list contract."""
    gh, gw = grid_hw
    tokens = np.asarray(res.tokens)
    lengths = np.asarray(res.lengths)
    scores = np.asarray(res.scores)
    ppl = np.asarray(res.perplexity)
    alphas = np.asarray(res.alphas)
    b, k = lengths.shape

    captions, cap_scores, cap_alphas, cap_ppl = [], [], [], []
    for i in range(b):
        caps_i, al_i = [], []
        for j in range(k):
            n = int(lengths[i, j])
            caps_i.append(tokens[i, j, 1:n + 1].tolist())
            # alphas rows 0..n-1 generated words 1..n (the END-step alpha and
            # the zeros placeholder are dropped, reference: model.py:421-422)
            al_i.append(alphas[i, j, :n].reshape(n, gh, gw))
        if return_all:
            order = np.argsort(-scores[i], kind="stable")
            captions.append([caps_i[j] for j in order])
            cap_alphas.append([al_i[j] for j in order])
            cap_scores.append([float(scores[i, j]) for j in order])
            cap_ppl.append([float(ppl[i, j]) for j in order])
        else:
            best = int(np.argmax(scores[i]))
            captions.append(caps_i[best])
            cap_alphas.append(al_i[best])
            cap_scores.append(float(scores[i, best]))
            cap_ppl.append(float(ppl[i, best]))
    return captions, cap_scores, cap_alphas, cap_ppl
