"""``query_string`` parser: the classic Lucene QueryParser syntax, as a
disciplined subset with loud rejections (the ``simple_query_string``
discipline — query/simpleq.py — extended with the QueryParser-only
constructs the engine can score exactly).

Supported per clause (whitespace- or connector-separated):

* ``term`` — analyzed term(s), BM25-scored (a clause whose text
  analyzes to several tokens scores them as an OR group, the engine's
  chunk convention).
* ``field:term`` — explicit field. The translator validates the field
  is the corpus's one analyzed text column; anything else rejects.
* ``"a phrase"`` / ``"a phrase"~N`` — (sloppy) phrase.
* ``pref*`` — trailing-``*`` prefix; ``wild*card`` / ``wi?d`` —
  general wildcard; ``term~`` / ``term~N`` — fuzzy (N ∈ {1, 2},
  default 2 like Lucene). All three are multi-term clauses and score
  CONSTANT 1.0 per matching doc — Lucene QueryParser's default
  CONSTANT_SCORE rewrite for multi-term queries, and the same
  convention simple_query_string uses for its trailing-``*``. (The
  standalone prefix/wildcard/fuzzy DSL queries use the TOP-TERMS
  scoring rewrite instead; both are real Lucene rewrite modes, chosen
  per surface exactly as Lucene defaults do.)
* ``clause^F`` — per-clause boost (multiplies the clause's score).
* ``NOT x`` / ``-x`` — negation (excludes the clause's match set).
* ``AND`` / ``OR`` / ``&&`` / ``||`` — connectors; UNIFORM only
  (mixing AND with OR without grouping is rejected, since precedence
  is the classic QueryParser foot-gun).

Rejected loudly (never silently re-interpreted): grouping ``()``,
ranges ``[a TO b]`` / ``{a TO b}``, regex ``/re/``, ``+`` required
markers, ``_exists_:``, backslash escapes, non-integer slop/fuzziness,
boosts that do not parse as floats.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class QueryStringError(ValueError):
    pass


@dataclass(frozen=True)
class QsLeaf:
    kind: str            # term | phrase | prefix | wildcard | fuzzy
    text: str            # raw clause text (unanalyzed)
    field: str | None    # explicit field, or None
    negated: bool
    boost: float         # 1.0 default
    slop: int            # phrases: ~N (0 = contiguous); fuzzy: max edits


_CONNECTORS = {"AND": "and", "&&": "and", "OR": "or", "||": "or"}
_REJECT_CHARS = "()[]{}/\\+"
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)
_FUZZ_RE = re.compile(r"^(.*?)~([0-9]*)$", re.S)


def _split_tokens(q: str) -> list[str]:
    """Split on whitespace, keeping quoted spans (with their suffixes,
    e.g. ``"a b"~2^1.5``) as one token."""
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        j = i
        buf = []
        in_quote = False
        while j < n and (in_quote or not q[j].isspace()):
            if q[j] == '"':
                in_quote = not in_quote
            buf.append(q[j])
            j += 1
        if in_quote:
            raise QueryStringError("unterminated quote")
        out.append("".join(buf))
        i = j
    return out


def parse_query_string(q, default_operator: str = "or"):
    """→ (mode, [QsLeaf]) with ``mode`` in {"or", "and"} (uniform
    connectors only)."""
    if not isinstance(q, str) or not q.strip():
        raise QueryStringError("query_string needs a non-empty string query")
    if default_operator not in ("or", "and"):
        raise QueryStringError(
            f"default_operator must be or|and, got [{default_operator}]")
    raw = _split_tokens(q)
    mode: str | None = None
    leaves: list[QsLeaf] = []
    pending_not = False
    expect_clause = False  # a connector/NOT was just consumed
    implicit_pair = False  # two clauses separated by bare whitespace
    for tok in raw:
        if tok in _CONNECTORS:
            if not leaves or expect_clause:
                raise QueryStringError(f"connector [{tok}] needs a clause "
                                       "on both sides")
            op = _CONNECTORS[tok]
            if mode is None:
                mode = op
            elif mode != op:
                raise QueryStringError(
                    "mixed AND/OR without grouping is rejected (classic "
                    "QueryParser precedence is not implemented)")
            expect_clause = True
            continue
        if tok == "NOT":
            if pending_not:
                raise QueryStringError("NOT NOT is not supported")
            pending_not = True
            expect_clause = True
            continue
        if leaves and not expect_clause:
            implicit_pair = True
        leaves.append(_parse_leaf(tok, pending_not))
        pending_not = False
        expect_clause = False
    if expect_clause or pending_not:
        raise QueryStringError("trailing connector/NOT with no clause")
    if not leaves:
        raise QueryStringError("query_string parsed to zero clauses")
    if mode is None:
        mode = default_operator
    elif implicit_pair and mode != default_operator:
        # 'a b OR c' with default_operator=and is the classic
        # precedence foot-gun — Lucene would group it; we reject
        raise QueryStringError(
            "bare-whitespace separators mixed with explicit connectors "
            f"that differ from default_operator [{default_operator}] — "
            "spell every connector explicitly")
    return mode, leaves


def _parse_leaf(orig: str, negated: bool) -> QsLeaf:
    tok = orig
    if tok.startswith("-") and len(tok) > 1:
        if negated:
            raise QueryStringError(f"double negation in {orig!r}")
        negated, tok = True, tok[1:]
    # field: prefix (only outside quotes)
    field = None
    if not tok.startswith('"'):
        m = _FIELD_RE.match(tok)
        if m:
            if m.group(1) == "_exists_":
                raise QueryStringError("_exists_: is not supported")
            field, tok = m.group(1), m.group(2)
        if ":" in tok and not tok.startswith('"'):
            raise QueryStringError(f"bad field syntax in {orig!r}")
    # trailing ^boost (after the closing quote for phrases)
    boost = 1.0
    caret = tok.rfind("^")
    if caret > tok.rfind('"'):
        body, bs = tok[:caret], tok[caret + 1:]
        if not body:
            raise QueryStringError(f"boost with no clause in {orig!r}")
        try:
            boost = float(bs)
        except ValueError as e:
            raise QueryStringError(f"bad boost in {orig!r}") from e
        if boost <= 0:
            raise QueryStringError(f"boost must be > 0 in {orig!r}")
        tok = body
    # any caret still present outside quotes is a mid-clause typo
    # (e.g. a^2^3) — reject rather than letting the analyzer silently
    # split the leftover
    if "^" in (tok if not tok.startswith('"') else tok[tok.rfind('"'):]):
        raise QueryStringError(f"mid-clause ^ in {orig!r}")
    if tok.startswith('"'):
        m3 = re.match(r'^"(.*)"(?:~([0-9]+))?$', tok, re.S)
        if not m3:
            raise QueryStringError(f"bad phrase syntax {orig!r}")
        inner, slop = m3.group(1), int(m3.group(2) or 0)
        if not inner.strip():
            raise QueryStringError("empty phrase")
        if '"' in inner:
            raise QueryStringError(f"nested quote in {orig!r}")
        _reject_chars(inner, orig)
        return QsLeaf("phrase", inner, field, negated, boost, slop)
    _reject_chars(tok, orig)
    if "~" in tok:
        m2 = _FUZZ_RE.match(tok)
        if not m2 or "~" in m2.group(1):
            raise QueryStringError(f"bad fuzzy syntax {orig!r}")
        body, edits = m2.group(1), m2.group(2)
        if not body:
            raise QueryStringError(f"fuzzy with no term in {orig!r}")
        if "*" in body or "?" in body:
            raise QueryStringError(f"fuzzy + wildcard in {orig!r}")
        e = int(edits) if edits else 2  # Lucene default fuzziness
        if e not in (1, 2):
            raise QueryStringError(f"fuzziness must be 1 or 2 in {orig!r}")
        return QsLeaf("fuzzy", body, field, negated, boost, e)
    if not tok:
        raise QueryStringError(f"empty clause in {orig!r}")
    if "*" in tok or "?" in tok:
        if set(tok) <= {"*", "?"}:
            raise QueryStringError(f"pure-wildcard clause {orig!r} is "
                                   "rejected (matches everything)")
        if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
            return QsLeaf("prefix", tok[:-1], field, negated, boost, 0)
        return QsLeaf("wildcard", tok, field, negated, boost, 0)
    return QsLeaf("term", tok, field, negated, boost, 0)


def _reject_chars(s: str, tok: str) -> None:
    for ch in s:
        if ch in _REJECT_CHARS:
            raise QueryStringError(
                f"[{ch}] is not supported in {tok!r} (grouping/ranges/"
                "regex/escapes/required-markers are rejected, never "
                "silently re-interpreted)")
