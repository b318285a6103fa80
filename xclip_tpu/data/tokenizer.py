"""OpenAI-CLIP-compatible BPE tokenizer (host side).

Behavioral parity with the reference `x_clip/tokenizer.py` (itself the OpenAI
CLIP SimpleTokenizer): same merges file (`bpe_simple_vocab_16e6.txt`, a public
OpenAI data asset), same byte↔unicode table, same regex pre-tokenizer with
`<|startoftext|>`/`<|endoftext|>` specials, same vocab_size of 49408
(tokenizer.py:71), same pad/truncate semantics of `tokenize()`
(tokenizer.py:140-167, pad id 0).

Divergences (deliberate, documented):
  * `decode` strips EOS id 49407 — the reference strips `40407`, a typo
    (tokenizer.py:135, SURVEY §2.7.6). Fixed here.
  * `ftfy` text fixing is applied only if ftfy is installed (it is not baked
    into this image); html-unescape + whitespace cleanup always run.
  * `tokenize` returns a NumPy int32 array (framework-neutral host data),
    not a torch tensor.
  * An optional C++ fast path (`xclip_tpu.native.fast_bpe`) accelerates
    `encode` for data-pipeline throughput; the pure-Python path is the
    reference semantics and always available.
"""

from __future__ import annotations

import html
import os
from functools import lru_cache
from typing import List, Union

import numpy as np
import regex as re

try:
    import ftfy

    def _fix_text(t: str) -> str:
        return ftfy.fix_text(t)
except ImportError:  # ftfy not baked into the image; degrade gracefully
    def _fix_text(t: str) -> str:
        return t


@lru_cache()
def default_bpe() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bpe_simple_vocab_16e6.txt")


@lru_cache()
def bytes_to_unicode():
    """Reversible byte → printable-unicode map (avoids control chars so BPE
    merges operate on visible symbols). Same table as GPT-2/CLIP."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def _basic_clean(text: str) -> str:
    text = _fix_text(text)
    return html.unescape(html.unescape(text)).strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str = None, use_native: bool = True):
        bpe_path = bpe_path or default_bpe()
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with open(bpe_path, encoding="utf8") as f:
            merge_lines = f.read().split("\n")
        merge_lines = merge_lines[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merge_lines]

        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]

        self.vocab_size = 49408
        assert len(vocab) == self.vocab_size

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE)

        self.sot_token = self.encoder["<|startoftext|>"]   # 49406
        self.eot_token = self.encoder["<|endoftext|>"]     # 49407

        self._native = None
        if use_native:
            try:
                from ..native.fast_bpe import FastBPE
                self._native = FastBPE(bpe_path)
            except Exception:
                self._native = None

    # ------------------------------------------------------------------ BPE
    def bpe(self, token: str) -> str:
        """Greedy lowest-rank merging, token-exact with OpenAI CLIP's BPE
        (verified by golden tests): repeatedly pick the adjacent pair with
        the best merge rank and fuse every left-to-right non-overlapping
        occurrence, until no adjacent pair has a rank. The last symbol
        carries the `</w>` end-of-word marker."""
        if token in self.cache:
            return self.cache[token]
        parts = list(token[:-1]) + [token[-1] + "</w>"]

        no_rank = float("inf")
        while len(parts) > 1:
            ranks = [self.bpe_ranks.get(pair, no_rank)
                     for pair in zip(parts, parts[1:])]
            best = min(range(len(ranks)), key=ranks.__getitem__)
            if ranks[best] == no_rank:
                break
            first, second = parts[best], parts[best + 1]
            fused, i = [], 0
            while i < len(parts):
                if (parts[i] == first and i + 1 < len(parts)
                        and parts[i + 1] == second):
                    fused.append(first + second)
                    i += 2
                else:
                    fused.append(parts[i])
                    i += 1
            parts = fused

        result = " ".join(parts)
        self.cache[token] = result
        return result

    # --------------------------------------------------------------- encode
    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        if self._native is not None:
            return self._native.encode(text)
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    # --------------------------------------------------------------- decode
    def decode(self, tokens, remove_start_end: bool = True, pad_tokens=()) -> str:
        if hasattr(tokens, "tolist"):
            tokens = tokens.tolist()
        if remove_start_end:
            # 49407 (EOS) — the reference strips 40407, a typo (§2.7.6)
            tokens = [t for t in tokens if t not in (49406, 49407, 0)]
        text = "".join(self.decoder[t] for t in tokens if t not in set(pad_tokens))
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # -------------------------------------------------------------- tokenize
    def tokenize(
        self,
        texts: Union[str, List[str]],
        context_length: int = 256,
        truncate_text: bool = False,
        pad_to_context_length: bool = False,
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        # input validation matching the reference's beartype contract
        # (x_clip/tokenizer.py:140 — str | List[str]); a non-string element
        # would otherwise surface as an opaque regex TypeError deep in
        # encode()
        if not isinstance(texts, (list, tuple)) or any(
                not isinstance(t, str) for t in texts):
            raise TypeError(
                "tokenize() expects a str or a list of str, got "
                f"{type(texts).__name__}"
                + ("" if not isinstance(texts, (list, tuple)) else
                   " containing " + ", ".join(sorted(
                       {type(t).__name__ for t in texts
                        if not isinstance(t, str)}))))

        all_tokens = [self.encode(t) for t in texts]
        max_length = max((len(t) for t in all_tokens), default=0)

        if max_length > context_length:
            if truncate_text:
                all_tokens = [t[:context_length] for t in all_tokens]
                max_length = context_length
            else:
                raise RuntimeError(
                    f"One of the inputs is too long for context length {context_length}")

        width = context_length if pad_to_context_length else max_length
        out = np.zeros((len(all_tokens), width), dtype=np.int32)
        for i, toks in enumerate(all_tokens):
            out[i, :len(toks)] = toks
        return out


tokenizer = SimpleTokenizer()
