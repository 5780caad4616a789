"""``simple_query_string`` parser — Lucene SimpleQueryParser's syntax
(the never-throws end-user query language OpenSearch exposes as the
``simple_query_string`` query; the reference accepts it through the
same search-body translation path as every other query builder).

Supported subset, spelled exactly:

* bare chunks — runs of non-space, non-operator characters; each chunk
  is ONE clause, analyzed by the field analyzer (a chunk that analyzes
  to several tokens combines them with ``default_operator``, Lucene
  ``QueryBuilder.createBooleanQuery``'s occur)
* ``"..."`` quoted phrases — one ordered phrase clause
* a trailing ``*`` on a chunk — a prefix clause (Lucene
  ``PrefixQuery`` under its constant-score rewrite: matching docs score
  1.0)
* ``-`` at clause start — negation (``MUST_NOT``)
* ``+`` / ``|`` between clauses — AND / OR; plain whitespace means
  ``default_operator``

Boundary (every rejection is a ``DslError`` naming it, never a silent
reinterpretation): all separators in one query must agree — Lucene
resolves mixed ``+``/``|`` by left-associative precedence, which this
translator does not model, so ``a + b | c`` is rejected rather than
approximated. ``(`` ``)`` grouping, ``~`` fuzzy/slop suffixes and
``\\`` escapes are likewise rejected by name. Lucene itself silently
*ignores* syntax errors (parseSubQuery falls back to treating the
character as text); the translator prefers loud rejection over a
quietly different query.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["Leaf", "parse_simple_query"]

_OPERATOR_CHARS = {"+", "|"}
_REJECT_CHARS = {"(", ")", "~", "\\"}


@dataclass(frozen=True)
class Leaf:
    kind: str  # "chunk" | "phrase" | "prefix"
    text: str
    negated: bool


def _err(msg: str):
    # DslError lives in dsl.py; import lazily to keep this module
    # importable standalone (the parser is pure string work)
    from .dsl import DslError

    return DslError(f"[simple_query_string] {msg}")


def parse_simple_query(query: str, default_operator: str = "or") -> tuple[str, list[Leaf]]:
    """Parse one query string → (mode, leaves). ``mode`` is the one
    boolean operator every separator in the query agreed on ("and" or
    "or"; a single-leaf query reports ``default_operator``)."""
    if default_operator not in ("or", "and"):
        raise _err(f"default_operator must be or|and, got [{default_operator}]")
    if not isinstance(query, str) or not query.strip():
        raise _err("needs a non-empty query string")

    leaves: list[Leaf] = []
    seps: list[str] = []  # operator between leaf i and i+1
    pending_sep: str | None = None  # explicit operator awaiting its right leaf
    negate = False
    i, n = 0, len(query)

    def push(kind: str, text: str):
        nonlocal pending_sep, negate
        if leaves:
            seps.append(pending_sep or default_operator)
        pending_sep = None
        leaves.append(Leaf(kind, text, negate))
        negate = False

    while i < n:
        ch = query[i]
        if ch.isspace():
            i += 1
            continue
        if ch in _REJECT_CHARS:
            raise _err(f"unsupported syntax [{ch}]; supported: terms, "
                       '"phrases", trailing-* prefixes, - negation, '
                       "+ and | operators")
        if ch in _OPERATOR_CHARS:
            if negate:
                raise _err(f"[-] must be followed by a term or phrase, "
                           f"got [{ch}]")
            if not leaves or pending_sep is not None:
                raise _err(f"operator [{ch}] needs a clause on both sides")
            pending_sep = "and" if ch == "+" else "or"
            i += 1
            continue
        if ch == "-":
            if negate:
                raise _err("[--] double negation is not supported")
            negate = True
            i += 1
            continue
        if ch == '"':
            end = query.find('"', i + 1)
            if end < 0:
                raise _err("unterminated quoted phrase")
            body = query[i + 1:end]
            if not body.strip():
                raise _err("empty quoted phrase")
            push("phrase", body)
            i = end + 1
            continue
        # a bare chunk: runs to the next space / operator / reject char
        j = i
        while j < n and not query[j].isspace() and query[j] not in _OPERATOR_CHARS \
                and query[j] not in _REJECT_CHARS and query[j] != '"':
            j += 1
        chunk = query[i:j]
        if chunk.endswith("*"):
            body = chunk[:-1]
            if not body:
                raise _err("a bare [*] needs a prefix before it")
            if "*" in body:
                raise _err(f"[*] is only supported at chunk end, got {chunk!r}")
            push("prefix", body)
        else:
            push("chunk", chunk)
        i = j

    if pending_sep is not None:
        raise _err("trailing operator needs a clause after it")
    if negate:
        raise _err("trailing [-] needs a term or phrase after it")
    if not leaves:
        raise _err("query parsed to zero clauses")

    kinds = set(seps)
    if len(kinds) > 1:
        raise _err("mixed + and | operators need parenthesized precedence, "
                   "which this translator does not model; use one operator "
                   "per query")
    mode = kinds.pop() if kinds else default_operator
    return mode, leaves
