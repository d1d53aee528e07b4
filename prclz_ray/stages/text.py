"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — vectorized / stateful actor stages over the
``documents`` (or extracted pages) corpus.
"""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# tiny n-gram/stopword profiles for the heuristic language id
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "dans", "pour"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht", "mit", "den", "von"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "los", "por"},
    "ar": {"في", "من", "على", "أن", "إلى", "عن", "هذا", "مع", "كان", "لا"},
    "sw": {"ya", "na", "wa", "kwa", "ni", "za", "katika", "hii", "la", "kama"},
}

_TOKEN = re.compile(r"\w+|[^\w\s]")
_WORD = re.compile(r"[a-zA-Z]+")
_SENT = re.compile(r"[.!?]+")


class LangId:
    """Heuristic language id: stopword-profile vote; 'und' when no vote."""

    def __init__(self, text_col="text"):
        self.word = re.compile(r"\w+", re.U)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.lower().str.findall(self.word)
        def vote(ws):
            best, best_n = "und", 0
            wset = ws if isinstance(ws, list) else []
            for lang, prof in self.profiles.items():
                n = sum(1 for w in wset if w in prof)
                if n > best_n:
                    best, best_n = lang, n
            return best
        batch["lang_pred"] = toks.map(vote)
        return batch


class QualityScorer:
    """Quality heuristics per doc: char len, word count, mean word length,
    punctuation ratio, stopword ratio, digit ratio, a composite score."""

    def __init__(self, text_col="text"):
        self.text_col = text_col
        self.word = re.compile(r"\w+")
        self.stop = frozenset().union(*_LANG_PROFILES.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col]
        batch["q_chars"] = s.str.len().astype("int64")
        words = s.str.findall(self.word)
        batch["q_words"] = words.map(len).astype("int64")
        batch["q_mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        batch["q_punct_ratio"] = s.map(
            lambda t: sum(not c.isalnum() and not c.isspace() for c in t) / max(1, len(t)))
        batch["q_stop_ratio"] = words.map(
            lambda ws: sum(w.lower() in self.stop for w in ws) / max(1, len(ws)))
        batch["q_digit_ratio"] = s.map(
            lambda t: sum(c.isdigit() for c in t) / max(1, len(t)))
        batch["q_score"] = (
            (batch["q_words"].clip(0, 500) / 500.0) * 0.4
            + batch["q_stop_ratio"].clip(0, 0.5) * 0.8
            + (1 - batch["q_punct_ratio"].clip(0, 0.5)) * 0.2)
        return batch


def token_count_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Whitespace token count + a BPE-ish regex token count (\\w+ runs and
    single punctuation marks), vectorized enough for the hot path."""
    texts = batch[text_col].to_pylist()
    ws = np.array([len(t.split()) for t in texts], dtype=np.int64)
    bpe = np.array([len(_TOKEN.findall(t)) for t in texts], dtype=np.int64)
    out = batch.append_column("tokens_ws", pa.array(ws))
    return out.append_column("tokens_re", pa.array(bpe))


def fingerprint_batch(batch: pa.Table, text_col="text", window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: min-sampled winnowing digest
    over sliding byte windows + full-content blake2b.  Window hashes are
    a wrapping-uint64 polynomial computed as ``window`` shifted VECTOR ops
    over the whole byte array (no per-byte python loop — at corpus scale
    the per-byte interpreter path is the bottleneck)."""
    texts = batch[text_col].to_pylist()
    fps, full = [], []
    prime = np.uint64(1099511628211)
    for t in texts:
        data = t.encode()
        full.append(hashlib.blake2b(data, digest_size=16).hexdigest())
        if len(data) < window:
            fps.append(int.from_bytes(
                hashlib.blake2b(data, digest_size=8).digest(), "big"))
            continue
        b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        n = len(b) - window + 1
        hs = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(window):
                hs = hs * prime + b[j:j + n]
        fps.append(int(hs.min()))
    out = batch.append_column("fingerprint", pa.array(np.array(fps, dtype=np.uint64)))
    return out.append_column("content_hash", pa.array(full))
