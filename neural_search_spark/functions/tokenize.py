"""Tokenizers — the analyzer layer the reference delegates to Lucene.

Code-aware tokenizer (per BASELINE.json north_star: "code-aware
tokenization and term-frequency extraction via vectorized Arrow/pandas
UDFs"): lowercase, then maximal runs of ``[a-z0-9_]`` — identifiers keep
underscores, everything else breaks tokens. A deterministic spec
(SURVEY.md §7.0) with identical implementations in pandas (test oracle),
Arrow C++ (index kernel — zero Python string objects), and SQL (DuckDB
oracle), so rank-identity tests are meaningful.
"""

from __future__ import annotations


import numpy as np
import pandas as pd

# Deterministic tokenizer specs (SURVEY.md §7.0 — the spec is ours to
# fix; all are "optionally lowercase, then maximal runs of the token
# alphabet", so they are expressible identically in pandas/C, Arrow C++,
# and SQL):
#  * code:   token alphabet [a-z0-9_] — identifiers keep underscores
#  * simple: token alphabet [a-z0-9]  — natural-language-ish text
CODE_SPLIT_RE = "[^a-z0-9_]+"
SIMPLE_SPLIT_RE = "[^a-z0-9]+"

# Named-analyzer registry — the word tokenizers the reference's chunker
# accepts via OpenSearch's analysis registry
# (processor/chunker/FixedTokenLengthChunker.java:44-58: standard/
# letter/lowercase/whitespace/uax_url_email/classic/thai). Each entry is
# (split_regex, token_regex, lowercase): split_regex drives the
# index/stats path (replace-then-split), token_regex yields char SPANS
# for the chunker's offset semantics, lowercase says whether terms are
# case-folded (Lucene: WhitespaceTokenizer / LetterTokenizer /
# StandardTokenizer preserve case; LowerCaseTokenizer folds; our
# code/simple specs fold by design). ASCII classes approximate Lucene's
# Unicode-aware ones — a committed, documented boundary;
# uax_url_email/classic/thai need real UAX#29 state machines and are
# rejected by name (mappings validation) rather than silently wrong.
ANALYZERS: dict[str, tuple[str, str, bool]] = {
    "code": (CODE_SPLIT_RE, "[a-z0-9_]+", True),
    "simple": (SIMPLE_SPLIT_RE, "[a-z0-9]+", True),
    # UNICODE word classes (round 5): `standard` tokens are maximal
    # runs of [\p{L}\p{N}_] — the deterministic approximation of
    # UAX#29 word boundaries for alphabetic scripts (underscore joins:
    # UAX#29 WB13a/13b ExtendNumLet, which is why Lucene's
    # StandardTokenizer keeps `foo_bar` as ONE token). `letter` /
    # `lowercase` are Unicode-letter runs (Lucene LetterTokenizer /
    # LowerCaseTokenizer). These patterns are the ENGINE dialect —
    # Java regex (Spark SQL) and RE2 (Arrow kernel, DuckDB) both read
    # \p{} classes; Python's stdlib `re` does not, so Python-side
    # consumers use PY_ANALYZERS below (same semantics, \w classes;
    # parity pinned by tests on mixed-script text).
    # Remaining documented divergence from full UAX#29: (a) unsegmented
    # scripts (CJK) come out as whole runs, not dictionary words —
    # `thai` stays rejected by name; (b) MidLetter/MidNum joiners
    # (don't, 3.14) split at the punctuation; (c) locale case folding
    # (Turkish İ) follows each engine's default lower().
    "standard": ("[^\\p{L}\\p{N}_]+", "[\\p{L}\\p{N}_]+", False),
    "letter": ("[^\\p{L}]+", "\\p{L}+", False),
    "lowercase": ("[^\\p{L}]+", "\\p{L}+", True),
    "whitespace": None,  # filled below — explicit Java-isWhitespace class
}

# Lucene's WhitespaceTokenizer splits on Java Character.isWhitespace:
# \t-\r, \x1C-\x1F, and the Zs/Zl/Zp space separators MINUS the
# non-breaking ones ( ,  ,  ). Spelled as an explicit
# code-point class so RE2 (Arrow kernel, DuckDB) and Java regex (Spark
# SQL) read the IDENTICAL set — the shorthand \s is ASCII-only in both
# and they even disagree with each other on \x0B; Python gets the same
# set as a character predicate below.
_WS_CLASS = ("\\x{09}-\\x{0D}\\x{1C}-\\x{1F}\\x{20}\\x{1680}"
             "\\x{2000}-\\x{2006}\\x{2008}-\\x{200A}"
             "\\x{2028}\\x{2029}\\x{205F}\\x{3000}")
ANALYZERS["whitespace"] = (f"[{_WS_CLASS}]+", f"[^{_WS_CLASS}]+", False)

_WS_CHARS = frozenset(map(chr, [
    *range(0x09, 0x0E), *range(0x1C, 0x21), 0x1680,
    *range(0x2000, 0x2007), *range(0x2008, 0x200B),
    0x2028, 0x2029, 0x205F, 0x3000,
]))

# Python-side dialect. stdlib `re` has no \p{} classes, and its
# approximations diverge (\d is Nd only, so \W misses No/Nl
# superscripts/fractions) — so the Unicode analyzers tokenize in
# Python via CHARACTER PREDICATES that match the engine classes
# exactly: str.isalnum() == \p{L}\p{N} (L* + Nd + Nl + No) and
# str.isalpha() == \p{L}. The ASCII analyzers keep their regexes.
# Consumers: analyze_query (driver-side) and the chunker's span scan.
# Cross-dialect parity vs RE2/Java is pinned by tests on mixed-script
# text.
PY_ANALYZERS: dict[str, tuple[str, str, bool]] = {
    "code": (CODE_SPLIT_RE, "[a-z0-9_]+", True),
    "simple": (SIMPLE_SPLIT_RE, "[a-z0-9]+", True),
}

# analyzer name -> (is-token-char predicate, lowercase)
PY_TOKEN_PREDICATES: dict[str, tuple] = {
    "standard": (lambda ch: ch.isalnum() or ch == "_", False),
    "letter": (str.isalpha, False),
    "lowercase": (str.isalpha, True),
    # Java isWhitespace as a set — Python's own \s / str.isspace()
    # includes \x85 and \xA0, which Java (and so Lucene) does not
    "whitespace": (lambda ch: ch not in _WS_CHARS, False),
}


def py_token_spans(text: str, tokenizer: str) -> list[tuple[int, int]]:
    """Char spans of the analyzer's tokens in ``text`` (Python side).
    Predicate scan for the Unicode analyzers, regex for the ASCII ones."""
    import re as _re

    pred_entry = PY_TOKEN_PREDICATES.get(tokenizer)
    if pred_entry is None:
        try:
            _split, token_re, _lower = PY_ANALYZERS[tokenizer]
        except KeyError:
            raise ValueError(
                f"[{tokenizer}] is not a registered analyzer name "
                f"(one of {sorted(PY_ANALYZERS) + sorted(PY_TOKEN_PREDICATES)})"
            ) from None
        return [(m.start(), m.end()) for m in _re.finditer(token_re, text)]
    pred = pred_entry[0]
    spans, start = [], None
    for i, ch in enumerate(text):
        if pred(ch):
            if start is None:
                start = i
        elif start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(text)))
    return spans
# name -> split regex (back-compat registry: mappings validation and the
# builder resolve through this; unknown names fall through as raw
# split regexes)
SPLIT_RES = {name: spec[0] for name, spec in ANALYZERS.items()}


def resolve_analyzer(tokenizer: str) -> tuple[str, str, bool]:
    """Name or raw split-regex → (split_re, token_re, lowercase) in the
    ENGINE dialect (Java/RE2 — Spark SQL, the Arrow kernel, DuckDB).

    A raw regex keeps the historical behavior (lowercase then split);
    its token_re is unknown, so span-based consumers (the fixed-token
    chunker) only accept registered names."""
    if tokenizer in ANALYZERS:
        return ANALYZERS[tokenizer]
    return tokenizer, "", True


def analyze_query(text: str, tokenizer: str = "simple") -> list[str]:
    """Analyze a RAW query string with the index's own tokenizer spec —
    the reference's ``match`` runs the field analyzer over the query
    text before term dispatch (Lucene QueryBuilder.createBooleanQuery).
    Driver-side and deterministic: this is query metadata, never data."""
    import re as _re

    if tokenizer in PY_TOKEN_PREDICATES:
        lower = PY_TOKEN_PREDICATES[tokenizer][1]
        s = text.lower() if lower else text
        return [s[a:b] for a, b in py_token_spans(s, tokenizer)]
    if tokenizer in PY_ANALYZERS:
        split_re, _token_re, lower = PY_ANALYZERS[tokenizer]
        s = text.lower() if lower else text
        return [t for t in _re.split(split_re, s) if t]
    # raw split regex: mirror the index kernel's normalization (replace
    # matches with a space, then split on whitespace) — a plain split
    # would keep "foo bar" as ONE query term when the regex's class
    # does not cover whitespace, so the analyzed query could never
    # match the indexed token stream
    s = text.lower()
    return [t for t in _re.sub(tokenizer, " ", s).split() if t]


def tokenize_code(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of lowercased code tokens."""
    return (
        texts.str.lower()
        .str.split(CODE_SPLIT_RE, regex=True)
        .map(lambda toks: [t for t in toks if t])
    )


def tokenize_simple(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] — lowercase alnum-run tokens."""
    return (
        texts.str.lower()
        .str.split(SIMPLE_SPLIT_RE, regex=True)
        .map(lambda toks: [t for t in toks if t])
    )


def simple_tokens_sql(col: str = "text") -> tuple[str, str]:
    """(spark_expr, duckdb_expr) producing the same array<string>.

    Spark's split() can emit empty strings at the edges; both sides
    filter them so the arrays match element-for-element.
    """
    spark = f"filter(split(lower({col}), '{SIMPLE_SPLIT_RE}'), x -> x <> '')"
    duck = (
        f"list_filter(regexp_split_to_array(lower({col}), '{SIMPLE_SPLIT_RE}'), x -> x <> '')"
    )
    return spark, duck


def term_freqs(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """token list -> (unique terms, counts) — used inside index kernels."""
    if not tokens:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    arr = np.asarray(tokens, dtype=object)
    terms, counts = np.unique(arr, return_counts=True)
    return terms, counts


def term_freq_frame(
    texts: pd.Series, doc_ids: pd.Series, tokenizer: str = "code"
) -> pd.DataFrame:
    """Batch of docs -> long frame (doc_id, term, tf, dl).

    ``dl`` is the total token count of the doc (Lucene field length).
    Fully Arrow-native: lower/split/dictionary-encode run in Arrow C++
    (zero Python string objects for the token stream — the flat tokens
    stay dictionary-encoded int32s), then one packed-int64 np.unique
    yields per-(doc, term) counts. This keeps the kernel compute-bound
    rather than allocation/bandwidth-bound, which is what lets 4N cores
    deliver ~4x on the build (BENCH/BASELINE.md).
    """
    frame, _ = term_freq_frame_positions(texts, doc_ids, tokenizer, with_positions=False)
    return frame


def term_freq_frame_positions(
    texts: pd.Series,
    doc_ids: pd.Series,
    tokenizer: str = "code",
    with_positions: bool = True,
) -> tuple[pd.DataFrame, np.ndarray | None]:
    """Like :func:`term_freq_frame`, plus the flat token-position stream.

    Returns ``(frame, flat_pos)``: ``flat_pos`` is one int64 array whose
    chains align with the frame's rows — row i's positions are the next
    ``frame.tf[i]`` values, strictly ascending, 0-based over the doc's
    analyzed token stream (Lucene position semantics: ordinal in the
    token stream, matching the exhaustive path's ``toks`` array).
    ``flat_pos`` is None when ``with_positions`` is False.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    split_re, _token_re, lowercase = resolve_analyzer(tokenizer)
    n_docs = len(texts)
    empty = pd.DataFrame(
        {
            "doc_id": np.empty(0, dtype=np.int64),
            "term": np.empty(0, dtype=object),
            "tf": np.empty(0, dtype=np.int64),
            "dl": np.empty(0, dtype=np.int64),
        }
    )
    empty_pos = np.empty(0, dtype=np.int64) if with_positions else None
    if n_docs == 0:
        return empty, empty_pos
    arr = pa.Array.from_pandas(texts.astype(str))
    if lowercase:
        arr = pc.utf8_lower(arr)
    cleaned = pc.replace_substring_regex(arr, pattern=split_re, replacement=" ")
    toks = pc.utf8_split_whitespace(cleaned)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(pc.list_flatten(toks))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary
    # split_whitespace emits "" at string edges — drop that token id
    empty_idx = pc.index(dictionary, pa.scalar("")).as_py()
    if empty_idx >= 0:
        keep = codes != empty_idx
        parent, codes = parent[keep], codes[keep]
    if len(codes) == 0:
        return empty, empty_pos
    dl_per_doc = np.bincount(parent, minlength=n_docs).astype(np.int64)
    n_uniq = len(dictionary)
    key = parent * np.int64(n_uniq) + codes
    uk, tf = np.unique(key, return_counts=True)
    pos_of = (uk // n_uniq).astype(np.int64)
    code_of = (uk % n_uniq).astype(np.int64)
    terms = dictionary.take(pa.array(code_of, type=pa.int64())).to_numpy(zero_copy_only=False)
    frame = pd.DataFrame(
        {
            "doc_id": doc_ids.to_numpy(dtype=np.int64)[pos_of],
            "term": terms,
            "tf": tf.astype(np.int64),
            "dl": dl_per_doc[pos_of],
        }
    )
    if not with_positions:
        return frame, None
    # position of each flat token within its doc's (filtered) stream:
    # parent is non-decreasing, so subtract each doc's first flat index
    doc_change = np.r_[True, parent[1:] != parent[:-1]]
    doc_starts = np.flatnonzero(doc_change)
    doc_lens = np.diff(np.r_[doc_starts, len(parent)])
    pos_in_doc = np.arange(len(parent), dtype=np.int64) - np.repeat(doc_starts, doc_lens)
    # group token instances by (doc, term-code) with chains ascending by
    # position: one STABLE argsort on the already-computed combined key
    # — the flat stream is in (doc, pos) order, so stability preserves
    # ascending positions within each (doc, term) group, and the group
    # order matches the frame's np.unique(key) rows. Equivalent to
    # lexsort((pos_in_doc, codes, parent)) at a third of the sort passes.
    order = np.argsort(key, kind="stable")
    return frame, pos_in_doc[order]
