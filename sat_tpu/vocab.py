"""Vocabulary utilities.

Mirrors the reference's vocab construction (reference: preprocess.ipynb cell 15):
frequency-ranked words with ``min_count`` filtering, capped at ``max_vocab``,
specials ``<PAD>=0`` and ``<UNK>/<START>/<END>`` appended after the real words,
plus the stoi/itos helpers the model exposes (reference: model.py:202-212)."""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional

PAD, UNK, START, END = "<PAD>", "<UNK>", "<START>", "<END>"


class Vocab:
    def __init__(self, stoi: Dict[str, int]):
        # JSON round-trips turn values into ints already, but be safe.
        self.stoi_map = {str(k): int(v) for k, v in stoi.items()}
        self.itos_map = {v: k for k, v in self.stoi_map.items()}
        for tok in (PAD, UNK, START, END):
            assert tok in self.stoi_map, f"vocab missing special token {tok}"
        assert self.stoi_map[PAD] == 0, "<PAD> must be index 0"

    @classmethod
    def build(cls, word_freq: Counter, min_count: int = 5,
              max_vocab: Optional[int] = None) -> "Vocab":
        """Frequency-ranked vocab (reference: preprocess.ipynb cell 15).

        Words with count > min_count (strict, matching the reference's ``v>min_count``),
        truncated to max_vocab-4 to leave room for the 4 specials."""
        words = [k for k, v in word_freq.most_common() if v > min_count]
        if max_vocab is not None:
            words = words[: max_vocab - 4]
        stoi = {w: i + 1 for i, w in enumerate(words)}
        stoi[UNK] = len(stoi) + 1
        stoi[START] = len(stoi) + 1
        stoi[END] = len(stoi) + 1
        stoi[PAD] = 0
        return cls(stoi)

    def __len__(self) -> int:
        return len(self.stoi_map)

    @property
    def size(self) -> int:
        return len(self.stoi_map)

    def stoi(self, s: str) -> int:
        return int(self.stoi_map.get(s, self.stoi_map[UNK]))

    def itos(self, i: int) -> str:
        return str(self.itos_map.get(int(i), UNK))

    @property
    def pad_idx(self) -> int:
        return self.stoi_map[PAD]

    @property
    def unk_idx(self) -> int:
        return self.stoi_map[UNK]

    @property
    def start_idx(self) -> int:
        return self.stoi_map[START]

    @property
    def end_idx(self) -> int:
        return self.stoi_map[END]

    @property
    def special_idxs(self) -> List[int]:
        # reference: model.py:151 keeps [PAD, START, END]
        return [self.pad_idx, self.start_idx, self.end_idx]

    def encode(self, tokens: Iterable[str], max_cap_length: int) -> List[int]:
        """<START> w... <END> <PAD>* (reference: preprocess.ipynb cell 17)."""
        toks = list(tokens)
        return ([self.start_idx]
                + [self.stoi(t) for t in toks]
                + [self.end_idx]
                + [self.pad_idx] * (max_cap_length - len(toks)))

    def decode(self, seq: Iterable[int], remove_special: bool = False) -> List[str]:
        """Convert a list of int into a list of str (reference: model.py:208-212)."""
        specials = set(self.special_idxs)
        return [self.itos(t) for t in seq
                if not (remove_special and int(t) in specials)]
