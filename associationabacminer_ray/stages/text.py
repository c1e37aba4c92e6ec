"""Text-analysis stages for large-scale training-data pipelines.

All are actor-pool ``map_batches`` classes: regexes/profiles compile
once per actor in ``__init__`` (the once-per-worker-state pattern,
SURVEY.md §2.3), per-batch work is vectorized pandas/numpy.

- ``TokenStats``: token counting (whitespace + BPE-ish word/punct regex)
  and quality scoring (length, punctuation/stopword/alpha ratios).
- ``LangId``: character-frequency + stopword-hit n-gram heuristic over a
  small built-in profile set (en/de/es/fr) — no external models.
- ``Fingerprint``: deterministic document fingerprints — md5 hex (exact
  dedup identity, the SHA1-of-normalized-event analog,
  ``EnvLogUniverseGenerator.py:91-94``) and a 64-bit rolling token hash.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..functions.hashing import combine_hashes, hash_strings

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "por", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans", "les"},
}


class TokenStats:
    """doc stats: n_chars, n_tokens (whitespace), n_words (BPE-ish regex),
    punct_ratio, alpha_ratio, stopword_ratio, quality_score ∈ [0,1].

    All counting runs on pyarrow's RE2 kernels (ASCII character classes,
    ``\\b``-delimited stopword occurrences) — the C++ fast path, and the
    EXACT semantics the DuckDB oracle reproduces (RE2 on both sides,
    so no Python-``\\w``-vs-RE2 divergence on non-ASCII input).
    ``count_substring_regex`` cost scales with MATCH count, so dense
    classes count their complement (alpha = n_chars − non-alpha)."""

    WORD_PAT = r"[A-Za-z]+|[0-9]+|[^0-9A-Za-z_\s]"
    PUNCT_PAT = r"[^0-9A-Za-z_\s]"
    NON_ALPHA_PAT = r"[^A-Za-z]"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = _STOPWORDS["en"]
        # zero-width \b boundaries: non-overlapping count == occurrence
        # count even for adjacent hits ("a a a" → 3). ONE alternation
        # pass counts all stopwords: every \b<word>\b match must cover
        # an entire maximal \w+ run, so matches of DISTINCT words are
        # disjoint and the alternation's non-overlapping count equals
        # the per-word sum exactly (parity-tested) — 10× fewer RE2
        # scans of the corpus than one pass per word.
        self.stop_pat = r"\b(?:" + "|".join(sorted(self.stop)) + r")\b"

    def __call__(self, batch):
        # Arrow-native hot path (batch_format="pyarrow" at call sites —
        # zero-copy from the object store straight into the RE2 kernels;
        # VERDICT r2 #6). pandas in → pandas out kept for direct calls.
        import pyarrow as pa

        if isinstance(batch, pa.Table):
            return self._call_arrow(batch)
        return self._call_arrow(
            pa.Table.from_pandas(batch, preserve_index=False)).to_pandas()

    def _call_arrow(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pc.fill_null(pc.cast(t[self.text_col], pa.string()), "")
        n_chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        # whitespace token count = number of \S+ runs: no trim/split
        # edge cases, and the SQL oracle states the identical expression
        n_tokens = pc.count_substring_regex(arr, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_words = pc.count_substring_regex(arr, self.WORD_PAT).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_punct = pc.count_substring_regex(arr, self.PUNCT_PAT).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_alpha = n_chars - pc.count_substring_regex(
            arr, self.NON_ALPHA_PAT).to_numpy(zero_copy_only=False)
        lower = pc.utf8_lower(arr)
        stop_hits = pc.count_substring_regex(lower, self.stop_pat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # float math in numpy — elementwise IEEE doubles, the identical op
        # sequence the bp-folding queries and the SQL oracle state
        denom = np.maximum(n_chars, 1)
        stop_ratio = stop_hits / np.maximum(n_words, 1)
        punct_ratio = n_punct / denom
        alpha_ratio = n_alpha / denom
        # quality: long enough, mostly alphabetic, some stopwords, low punct
        length_score = np.clip(n_tokens / 20.0, 0, 1)
        quality = (0.35 * length_score + 0.35 * alpha_ratio
                   + 0.2 * np.clip(stop_ratio * 4, 0, 1)
                   + 0.1 * (1 - np.clip(punct_ratio * 4, 0, 1)))
        for name, col in (("n_chars_computed", n_chars),
                          ("n_tokens", n_tokens),
                          ("n_words", n_words),
                          ("punct_ratio", punct_ratio.astype(np.float64)),
                          ("alpha_ratio", alpha_ratio.astype(np.float64)),
                          ("stopword_ratio", stop_ratio.astype(np.float64)),
                          ("quality_score", quality.astype(np.float64))):
            t = t.append_column(name, pa.array(col))
        return t


class LangId:
    """Stopword-profile language heuristic: argmax over per-language
    distinct-stopword hit counts (ties → 'en', empty → 'unknown')."""

    TOKEN_CLASS = "a-zäöüéèêàáíóúñç"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token_re = re.compile(rf"[{self.TOKEN_CLASS}]+")
        self.profiles = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.order = ["en", "de", "es", "fr"]  # deterministic tie-break
        # vectorized predict state: the union vocabulary (≤64 words,
        # each ≤8 ASCII bytes) maps each word to one bit; a doc's token
        # SET becomes a uint64 bitset and the per-language distinct-hit
        # count is a popcount over that language's bit positions —
        # identical semantics to the per-doc set intersection. Words
        # are matched as packed big-endian byte keys so the byte-level
        # kernel never builds a Python token object.
        vocab = sorted({w for ws in _STOPWORDS.values() for w in ws})
        assert len(vocab) <= 64
        self._max_word_len = max(len(w) for w in vocab)
        assert self._max_word_len <= 8
        assert all(w.isascii() and w.isalpha() for w in vocab)
        keys = np.array([int.from_bytes(w.encode().ljust(8, b"\0"), "big")
                         for w in vocab], dtype=np.uint64)
        order = np.argsort(keys)
        self._vocab_keys = keys[order]
        # bit index (= position in the sorted vocab list) of the j-th
        # sorted packed key
        self._vocab_bits = order.astype(np.uint64)
        self._lang_bits = {
            lang: np.array([vocab.index(w) for w in sorted(ws)],
                           dtype=np.uint64)
            for lang, ws in _STOPWORDS.items()}
        # UTF-8 second bytes of the non-ASCII token-class chars (all
        # are 2-byte 0xC3 xx sequences)
        self._c3_seconds = np.array(
            [c.encode()[1] for c in "äöüéèêàáíóúñç"], dtype=np.uint8)

    def _predict_one(self, text: str) -> str:
        toks = set(self.token_re.findall(text.lower()))
        if not toks:
            return "unknown"
        best, best_hits = "unknown", 0
        for lang in self.order:
            hits = len(toks & self.profiles[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def _predict_arrow(self, texts: "pa.Array") -> "pa.Array":
        """Vectorized predict, parity property-tested against
        ``_predict_one``. Byte-level kernel in the style of the dedup
        shingle hashing (functions/hashing.py, PERF #24): lowercase in
        C++ (utf8_lower), view the UTF-8 buffer zero-copy, mark
        token-class bytes (ASCII a-z plus the 0xC3-pair accented
        chars), extract maximal class runs with doc-boundary breaks,
        pack each ≤8-byte run into a uint64 key, test vocabulary
        membership via searchsorted, OR hit bits into per-doc token-SET
        bitsets with ``bitwise_or.reduceat``, and popcount each
        language's bit positions. Runs containing a multibyte char
        carry a ≥0x80 byte in the packed key, so they can never equal
        an ASCII vocab key — no separate ASCII check needed. No
        per-token Python object anywhere."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hashing import utf8_bytes_view

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lower = pc.utf8_lower(texts)
        data, off = utf8_bytes_view(lower)
        n = len(off) - 1
        docbits = np.zeros(n, dtype=np.uint64)
        if data.size:
            b = data
            is_c3 = b == 0xC3
            second = np.isin(b, self._c3_seconds)
            nxt_second = np.concatenate((second[1:], [False]))
            prev_c3 = np.concatenate(([False], is_c3[:-1]))
            cls = (((b >= 97) & (b <= 122))
                   | (is_c3 & nxt_second) | (prev_c3 & second))
            # doc boundaries break runs on BOTH sides
            starts_pos = off[:-1][off[:-1] < len(b)].astype(np.int64)
            prev_cls = np.concatenate(([False], cls[:-1]))
            prev_cls[starts_pos] = False
            nxt_cls = np.concatenate((cls[1:], [False]))
            inner = starts_pos[starts_pos > 0]
            nxt_cls[inner - 1] = False
            s_idx = np.flatnonzero(cls & ~prev_cls)
            e_idx = np.flatnonzero(cls & ~nxt_cls)
            run_len = e_idx - s_idx + 1
            short = run_len <= self._max_word_len
            s4 = s_idx[short]
            l4 = run_len[short]
            if s4.size:
                pad = np.concatenate((b, np.zeros(8, np.uint8)))
                key = np.zeros(s4.shape, dtype=np.uint64)
                for j in range(self._max_word_len):
                    byte_j = np.where(j < l4, pad[s4 + j], 0)
                    key |= byte_j.astype(np.uint64) << np.uint64(
                        8 * (7 - j))
                pos = np.searchsorted(self._vocab_keys, key)
                pos_c = np.minimum(pos, len(self._vocab_keys) - 1)
                hit = self._vocab_keys[pos_c] == key
                bits = np.where(hit,
                                np.uint64(1) << self._vocab_bits[pos_c],
                                np.uint64(0))
                docid = np.searchsorted(off, s4, side="right") - 1
                gs = np.flatnonzero(
                    np.concatenate(([True], docid[1:] != docid[:-1])))
                docbits[docid[gs]] = np.bitwise_or.reduceat(bits, gs)
        best = np.full(n, "unknown", dtype=object)
        best_hits = np.zeros(n, dtype=np.int64)
        for lang in self.order:
            cnt = np.zeros(n, dtype=np.int64)
            for wb in self._lang_bits[lang]:
                cnt += ((docbits >> wb) & np.uint64(1)).astype(np.int64)
            better = cnt > best_hits
            best[better] = lang
            best_hits[better] = cnt[better]
        return pa.array(best, pa.string())

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(batch, pa.Table):
            texts = pc.fill_null(
                pc.cast(batch[self.text_col], pa.string()), "")
            return batch.append_column("lang_pred",
                                       self._predict_arrow(texts))
        out = batch.copy()
        preds = self._predict_arrow(
            pa.array(batch[self.text_col].fillna("").astype(str)))
        out["lang_pred"] = preds.to_numpy(zero_copy_only=False)
        return out


class Chunker:
    """Split long documents into token-window chunks with overlap — the
    standard LLM-training-data chunking op. flat_map-shaped: one input
    row → N chunk rows (doc_id, chunk_idx, chunk_text, n_chunk_tokens).
    Whitespace tokens; chunk boundaries deterministic."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 64, overlap: int = 8):
        if overlap >= chunk_tokens:
            raise ValueError("overlap must be < chunk_tokens")
        self.text_col = text_col
        self.id_col = id_col
        self.chunk_tokens = chunk_tokens
        self.overlap = overlap
        # explicit RE2 \S class ([^\t\n\f\r ]) — the SAME token
        # definition TokenStats and the SQL chunk oracle use. Python's
        # own \S (even with re.ASCII) also excludes \v, which RE2's
        # does not, so the class is spelled out rather than aliased
        self.token_re = re.compile(r"[^\t\n\f\r ]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        step = self.chunk_tokens - self.overlap
        ids, idxs, texts, lens = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            toks = self.token_re.findall(text or "")
            if not toks:
                ids.append(doc_id); idxs.append(0); texts.append(""); lens.append(0)
                continue
            start, ci = 0, 0
            while start < len(toks):
                chunk = toks[start:start + self.chunk_tokens]
                ids.append(doc_id)
                idxs.append(ci)
                texts.append(" ".join(chunk))
                lens.append(len(chunk))
                if start + self.chunk_tokens >= len(toks):
                    break
                start += step
                ci += 1
        return pd.DataFrame({self.id_col: ids,
                             "chunk_idx": np.array(idxs, dtype=np.int32),
                             "chunk_text": texts,
                             "n_chunk_tokens": np.array(lens, dtype=np.int64)})


class PIIRedactor:
    """Regex-based PII scrubbing (emails, phone-ish numbers, IPv4, long
    digit runs) — patterns compiled once per actor; counts what it
    redacted so downstream quality filters can use the signal."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # ipv4 before phone: a dotted quad would otherwise match the
        # looser phone pattern first. Compiled with re.ASCII so \w/\d/\b
        # are byte-class semantics — EXACTLY what the RE2-based DuckDB
        # oracle computes (unicode \b would diverge next to accented
        # letters, e.g. "123456789é")
        self.patterns = [
            ("email", re.compile(r"[\w.+-]+@[\w-]+\.[\w.-]+", re.ASCII)),
            ("ipv4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b", re.ASCII)),
            # explicit RE2 \s class ([\t\n\f\r ]): Python's ASCII \s
            # also matches \v, which RE2 (the oracle) does not
            ("phone", re.compile(r"\+?\d[\d\t\n\f\r ().-]{7,}\d",
                                 re.ASCII)),
            ("digits", re.compile(r"\b\d{9,}\b", re.ASCII)),
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        text = out[self.text_col].fillna("")
        total = np.zeros(len(out), dtype=np.int64)
        for name, pat in self.patterns:
            counts = text.str.count(pat).astype(np.int64)
            text = text.str.replace(pat, f"[{name.upper()}]", regex=True)
            total += counts.to_numpy()
        out[self.text_col] = text
        out["n_pii_redacted"] = total
        return out


class Fingerprint:
    """md5 hex digest + 64-bit rolling token-hash fingerprint."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _roll(s: str) -> np.uint64:
        # rolling hash over whitespace tokens (order-sensitive fold)
        toks = s.split()
        if not toks:
            return np.uint64(0)
        h = hash_strings(np.asarray(toks, dtype=object))
        acc = h[:1]
        for i in range(1, len(h)):
            acc = combine_hashes(acc, h[i:i + 1])
        return acc[0]

    def __call__(self, batch):
        import pyarrow as pa

        if isinstance(batch, pa.Table):
            texts = pa.compute.fill_null(
                pa.compute.cast(batch[self.text_col], pa.string()),
                "").to_pylist()
            fp = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                           for s in texts], pa.string())
            rolling = pa.array(
                np.array([self._roll(s) for s in texts], dtype=np.uint64))
            return (batch.append_column("fp", fp)
                    .append_column("rolling_fp", rolling))
        text = batch[self.text_col].fillna("")
        out = batch.copy()
        out["fp"] = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in text]
        out["rolling_fp"] = np.array([self._roll(s) for s in text],
                                     dtype=np.uint64)
        return out
