"""Byte-level BPE tokenizer (the GPT-2 algorithm), offline-constructible.

The reference serves real checkpoints through `transformers.GPT2Tokenizer`
(reference `vllmini/model/gpt2.py` loads HF checkpoints; the tokenizer comes
from the hub). This environment has zero egress, so hub tokenizers cannot be
fetched — this module implements the same byte-level BPE *algorithm* natively:

  * the GPT-2 byte<->unicode bijection (`bytes_to_unicode`), so every byte
    string round-trips losslessly through the token vocabulary;
  * the GPT-2 pre-tokenizer regex (contractions, letter runs with a leading
    space, digit runs, punctuation runs);
  * rank-greedy pair merging over an in-repo merges table;
  * a tiny offline BPE *trainer* (`train`) so tests and the no-network server
    fallback get a REAL tokenizer — one where `decode(a) + decode(b) !=
    decode(a + b)` across merge boundaries and where a multi-byte codepoint
    can be split across tokens (the two behaviors the SSE prefix-diff
    streaming path must survive; see server/api.py "Incremental
    detokenization").

Unlike the toy tokenizers used elsewhere in the tests, decode here goes
through UTF-8 with errors="replace", so a token boundary inside a multi-byte
character yields U+FFFD exactly as a hub byte-level BPE does.
"""

from __future__ import annotations

import json
from typing import Iterable

import regex as _re

# GPT-2's pre-tokenizer pattern (public; radford et al. 2019 release).
_PAT = _re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte -> printable-unicode bijection.

    Printable ASCII + two Latin-1 ranges map to themselves; the remaining 68
    bytes map to codepoints 256+i so no token string ever contains raw
    whitespace/control bytes.
    """
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word, word[1:]))


class ByteBPETokenizer:
    """GPT-2-style byte-level BPE over an explicit vocab + merges table.

    `vocab` maps token STRING (in byte-unicode space) -> id; `merges` is the
    ranked list of (left, right) pairs. With an empty merges list this is a
    plain byte tokenizer (256 tokens) — still lossless and still byte-level.
    """

    def __init__(self, vocab: dict[str, int],
                 merges: Iterable[tuple[str, str]],
                 eos_token: str | None = None):
        self.vocab = dict(vocab)
        self.ids = {i: t for t, i in self.vocab.items()}
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}
        self.eos_token_id = (self.vocab.get(eos_token)
                             if eos_token is not None else None)

    # -- construction -----------------------------------------------------
    @classmethod
    def byte_only(cls) -> "ByteBPETokenizer":
        vocab = {u: i for i, u in enumerate(_B2U[b] for b in range(256))}
        return cls(vocab, [])

    @classmethod
    def train(cls, corpus: str, num_merges: int,
              eos_token: str | None = None) -> "ByteBPETokenizer":
        """Tiny offline BPE trainer: greedy most-frequent-pair merging over
        the pre-tokenized corpus. Deterministic (ties break lexicographically)
        so tests reproduce the same table everywhere."""
        words: dict[tuple[str, ...], int] = {}
        for tok in _PAT.findall(corpus):
            w = tuple(_B2U[b] for b in tok.encode("utf-8"))
            words[w] = words.get(w, 0) + 1
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            counts: dict[tuple[str, str], int] = {}
            for w, c in words.items():
                for p in zip(w, w[1:]):
                    counts[p] = counts.get(p, 0) + c
            if not counts:
                break
            best = max(counts, key=lambda p: (counts[p], p))
            if counts[best] < 2:
                break
            merges.append(best)
            joined = "".join(best)
            new_words = {}
            for w, c in words.items():
                out, i = [], 0
                while i < len(w):
                    if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                        out.append(joined)
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
            words = new_words
        vocab = {u: i for i, u in enumerate(_B2U[b] for b in range(256))}
        for l, r in merges:
            vocab.setdefault(l + r, len(vocab))
        if eos_token is not None:
            vocab.setdefault(eos_token, len(vocab))
        return cls(vocab, merges, eos_token=eos_token)

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str,
                   eos_token: str | None = "<|endoftext|>"
                   ) -> "ByteBPETokenizer":
        """Load hub-format files: vocab.json + merges.txt (one `l r` pair per
        line, optional `#version` header) — the exact on-disk format of the
        GPT-2 family, so a user with local checkpoint files needs no hub."""
        with open(vocab_path) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                l, r = line.split(" ")
                merges.append((l, r))
        return cls(vocab, merges, eos_token=eos_token)

    # -- core -------------------------------------------------------------
    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        while pairs:
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            l, r = best
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == l and word[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
            pairs = _get_pairs(word)
        parts = list(word)
        self._cache[token] = parts
        return parts

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for tok in _PAT.findall(text):
            u = "".join(_B2U[b] for b in tok.encode("utf-8"))
            for part in self._bpe(u):
                ids.append(self.vocab[part])
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.ids[int(i)] for i in ids)
        data = bytes(_U2B[ch] for ch in text)
        return data.decode("utf-8", errors="replace")
