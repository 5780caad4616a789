"""Round-5 session-5 additions: the DSL's remaining common-query
surface — multi_match, boosting, function_score and
simple_query_string (Lucene SimpleQueryParser syntax). The registry
rows gate each against a DuckDB oracle at sf0.01 (test_entry); these
tests pin the parser and the semantics third-party-free on
hand-computed corpora, plus every documented rejection."""

import math

import pytest

from neural_search_spark.query.dsl import DslError, SearchContext, search
from neural_search_spark.query.simpleq import parse_simple_query


# --- simple_query_string parser (pure string work) -------------------------


def test_sqs_parser_shapes():
    mode, leaves = parse_simple_query('spark | window | "table scan" | merg*')
    assert mode == "or"
    assert [(l.kind, l.text, l.negated) for l in leaves] == [
        ("chunk", "spark", False), ("chunk", "window", False),
        ("phrase", "table scan", False), ("prefix", "merg", False)]

    mode, leaves = parse_simple_query("a + b + -c")
    assert mode == "and"
    assert [(l.text, l.negated) for l in leaves] == [
        ("a", False), ("b", False), ("c", True)]

    # whitespace separators take default_operator; negation sticks to
    # its leaf; a chunk-internal dash is TEXT, not an operator
    mode, leaves = parse_simple_query('-"bad phrase" foo-bar x',
                                      default_operator="and")
    assert mode == "and"
    assert [(l.kind, l.text, l.negated) for l in leaves] == [
        ("phrase", "bad phrase", True), ("chunk", "foo-bar", False),
        ("chunk", "x", False)]

    # single leaf: mode is the default operator, no separators consulted
    assert parse_simple_query("solo")[0] == "or"
    # operators bind without surrounding spaces (Lucene treats + and |
    # as operators anywhere outside quotes)
    mode, leaves = parse_simple_query("a+b")
    assert mode == "and" and [l.text for l in leaves] == ["a", "b"]
    # a mid-chunk * is TEXT for the analyzer (Lucene only treats the
    # trailing * as the prefix operator), not a syntax error
    assert [(l.kind, l.text) for l in parse_simple_query("fo*o")[1]] == [
        ("chunk", "fo*o")]


@pytest.mark.parametrize("bad", [
    "a + b | c",          # mixed operators need precedence
    "(a b)",              # grouping unsupported
    "a~2",                # fuzzy/slop suffix unsupported
    "back\\slash",        # escapes unsupported
    '"unterminated',
    '""',                 # empty phrase
    "+ a",                # operator with no left clause
    "a +",                # trailing operator
    "a --b",              # double negation
    "-",                  # bare negation
    "*",                  # bare star
    "- | a",              # negation followed by operator
    "",                   # empty
    "   ",
])
def test_sqs_parser_rejections(bad):
    with pytest.raises(DslError):
        parse_simple_query(bad)


def test_sqs_parser_bad_default_operator():
    with pytest.raises(DslError):
        parse_simple_query("a b", default_operator="xor")


# --- hand-computed semantics on a tiny corpus ------------------------------


@pytest.fixture(scope="module")
def tiny_ctx(spark):
    rows = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta gamma delta", "es", 30),
        (3, "gamma delta epsilon", "es", 40),
        (4, "zeta eta theta", "en", 50),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    return SearchContext(docs=docs)


def _hits(ctx, body):
    return {r["doc_id"]: r["score"] for r in search(ctx, body).collect()}


def test_sqs_prefix_constant_score(tiny_ctx):
    # a pure prefix clause scores EVERY matching doc exactly 1.0
    # (PrefixQuery under SimpleQueryParser's constant-score rewrite)
    got = _hits(tiny_ctx, {"query": {"simple_query_string":
                                     {"query": "alph*"}}, "size": 10})
    assert got == {0: 1.0, 1: 1.0}


def test_sqs_phrase_gates_and_scores(tiny_ctx):
    # "beta gamma" is contiguous in docs 0 and 2 only; doc 3 has gamma
    # but not the phrase
    got = _hits(tiny_ctx, {"query": {"simple_query_string":
                                     {"query": '"beta gamma"'}}, "size": 10})
    assert set(got) == {0, 2}


def test_sqs_and_mode_and_negation(tiny_ctx):
    # gamma AND delta -> docs 2, 3; -epsilon removes doc 3
    got = _hits(tiny_ctx, {"query": {"simple_query_string":
                                     {"query": "gamma delta -epsilon",
                                      "default_operator": "and"}},
                           "size": 10})
    assert set(got) == {2}


def test_sqs_minimum_should_match_counts_clauses(tiny_ctx):
    body = {"query": {"simple_query_string":
                      {"query": "alpha | beta | delta",
                       "minimum_should_match": 2}}, "size": 10}
    # doc 0: alpha+beta (2 clauses), doc 1: alpha+delta, doc 2:
    # beta+delta, doc 3: delta only -> excluded, doc 4: none
    assert set(_hits(tiny_ctx, body)) == {0, 1, 2}
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"simple_query_string":
                                    {"query": "alpha",
                                     "minimum_should_match": 3}}, "size": 5})


def test_sqs_or_score_is_sum_of_matched_clauses(tiny_ctx):
    # per-clause scores assemble additively: score(a | b) on a doc
    # matching both == score(a) + score(b) (BooleanQuery sum)
    a = _hits(tiny_ctx, {"query": {"simple_query_string":
                                   {"query": "alpha"}}, "size": 10})
    b = _hits(tiny_ctx, {"query": {"simple_query_string":
                                   {"query": "beta"}}, "size": 10})
    both = _hits(tiny_ctx, {"query": {"simple_query_string":
                                      {"query": "alpha | beta"}}, "size": 10})
    assert both[0] == pytest.approx(a[0] + b[0], abs=2e-4)
    assert both[1] == pytest.approx(a[1], abs=1e-9)  # beta absent in doc 1


def test_sqs_fields_boundary(tiny_ctx):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"simple_query_string":
                                    {"query": "alpha",
                                     "fields": ["lang"]}}, "size": 5})


# --- boosting ---------------------------------------------------------------


def test_boosting_demotes_only_negative_matches(tiny_ctx):
    plain = _hits(tiny_ctx, {"query": {"match": {"text": "gamma"}},
                             "size": 10})
    demoted = _hits(tiny_ctx, {"query": {"boosting": {
        "positive": {"match": {"text": "gamma"}},
        "negative": {"term": {"lang": {"value": "es"}}},
        "negative_boost": 0.5}}, "size": 10})
    assert set(demoted) == set(plain)  # match set unchanged
    for d in plain:
        factor = 0.5 if d in (2, 3) else 1.0
        assert demoted[d] == pytest.approx(plain[d] * factor, abs=2e-4)


@pytest.mark.parametrize("body", [
    {"positive": {"match": {"text": "gamma"}}, "negative_boost": 0.5},
    {"positive": {"match": {"text": "gamma"}},
     "negative": {"term": {"lang": {"value": "es"}}}},
    {"positive": {"match": {"text": "gamma"}},
     "negative": {"term": {"lang": {"value": "es"}}}, "negative_boost": 1.5},
    {"positive": {"match": {"text": "gamma"}},
     "negative": {"term": {"lang": {"value": "es"}}}, "negative_boost": "x"},
])
def test_boosting_rejections(tiny_ctx, body):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"boosting": body}, "size": 5})


# --- function_score ---------------------------------------------------------


def test_function_score_modes_hand_computed(tiny_ctx):
    base = _hits(tiny_ctx, {"query": {"match": {"text": "gamma"}},
                            "size": 10})

    def fs(boost_mode, modifier="none", factor=1.0):
        return _hits(tiny_ctx, {"query": {"function_score": {
            "query": {"match": {"text": "gamma"}},
            "field_value_factor": {"field": "n_chars", "factor": factor,
                                   "modifier": modifier},
            "boost_mode": boost_mode}}, "size": 10})

    n_chars = {0: 10, 1: 20, 2: 30, 3: 40, 4: 50}
    mult = fs("multiply", "log1p", 0.5)
    for d, s in base.items():
        assert mult[d] == pytest.approx(
            s * math.log10(1.0 + n_chars[d] * 0.5), abs=2e-4)
    repl = fs("replace", "sqrt")
    for d in base:
        assert repl[d] == pytest.approx(math.sqrt(n_chars[d]), abs=2e-4)
    added = fs("sum", "reciprocal", 2.0)
    for d, s in base.items():
        assert added[d] == pytest.approx(s + 1.0 / (2.0 * n_chars[d]),
                                         abs=2e-4)


def test_function_score_default_query_is_match_all(tiny_ctx):
    got = _hits(tiny_ctx, {"query": {"function_score": {
        "field_value_factor": {"field": "n_chars"},
        "boost_mode": "replace"}}, "size": 10})
    assert got == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0, 4: 50.0}


@pytest.mark.parametrize("spec", [
    {"field_value_factor": {"field": "text"}},
    {"field_value_factor": {"field": "n_chars", "modifier": "cbrt"}},
    {"field_value_factor": {"field": "n_chars"}, "boost_mode": "avg"},
    {"query": {"match": {"text": "gamma"}}},
    {"field_value_factor": {"field": "no such col"}},
])
def test_function_score_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"function_score": spec}, "size": 5})


# --- multi_match ------------------------------------------------------------


def test_multi_match_equals_boosted_match(tiny_ctx):
    m = _hits(tiny_ctx, {"query": {"match": {"text": "alpha beta"}},
                         "size": 10})
    mm = _hits(tiny_ctx, {"query": {"multi_match": {
        "query": "alpha beta", "fields": ["text^3.0"]}}, "size": 10})
    assert set(mm) == set(m)
    for d in m:
        assert mm[d] == pytest.approx(3.0 * m[d], abs=2e-4)
    # boost-free multi_match IS the match query, bit-identical
    assert _hits(tiny_ctx, {"query": {"multi_match": {
        "query": "alpha beta", "fields": ["text"],
        "type": "most_fields"}}, "size": 10}) == m


def test_multi_match_in_dis_max(tiny_ctx):
    # multi_match composes as a dis_max sub-query; with boost 1.0 it
    # scores exactly like the equivalent match sub-query
    via_mm = _hits(tiny_ctx, {"query": {"dis_max": {"queries": [
        {"multi_match": {"query": "alpha", "fields": ["text"]}},
        {"match": {"text": "delta"}}], "tie_breaker": 0.4}}, "size": 10})
    via_match = _hits(tiny_ctx, {"query": {"dis_max": {"queries": [
        {"match": {"text": "alpha"}},
        {"match": {"text": "delta"}}], "tie_breaker": 0.4}}, "size": 10})
    assert via_mm == via_match


@pytest.mark.parametrize("spec", [
    {"query": "a", "fields": ["text", "lang"]},
    {"query": "a", "fields": []},
    {"query": "a", "fields": ["lang"]},
    {"query": "a", "fields": ["text^0"]},
    {"query": "a", "fields": ["text^oops"]},
    {"query": "a", "fields": ["text"], "type": "cross_fields"},
])
def test_multi_match_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"multi_match": spec}, "size": 5})


# --- regexp + ids through the DSL -------------------------------------------


def test_dsl_regexp_exhaustive(tiny_ctx):
    # ".?eta" full-term: {beta, zeta, eta, theta?} — theta is 5 chars,
    # no; eta/beta/zeta match. Hit docs: 0,2 (beta), 4 (zeta, eta, theta)
    got = _hits(tiny_ctx, {"query": {"regexp": {"text": {"value": ".?eta"}}},
                           "size": 10})
    assert set(got) == {0, 2, 4}


def test_dsl_regexp_rejections(tiny_ctx):
    for val, params in [
        ("a\\d", {}),                       # backslash: engine divergence
        ("a~b", {}),                        # Lucene optional operator
        ("beta", {"fuzziness": 1}),         # fuzziness is fuzzy-only
        ("beta", {"flags": "ALL"}),         # unknown param
    ]:
        body = {"query": {"regexp": {"text": {"value": val, **params}}},
                "size": 10}
        with pytest.raises(DslError):
            search(tiny_ctx, body)


def test_dsl_ids_constant_score(tiny_ctx):
    got = _hits(tiny_ctx, {"query": {"ids": {"values": [1, 3, 99]}},
                           "size": 10})
    assert got == {1: 1.0, 3: 1.0}


def test_dsl_ids_rejections(tiny_ctx):
    for spec in [{}, {"values": []}, {"values": ["x"]}, {"values": [True]},
                 {"values": [1], "boost": 2.0}]:
        with pytest.raises(DslError):
            search(tiny_ctx, {"query": {"ids": spec}, "size": 10})


# --- function_score decay functions ------------------------------------------


def test_decay_factor_sql_math():
    import math

    from neural_search_spark.query.dsl import decay_factor_sql

    # at dist == scale every kind scores exactly `decay`
    for kind in ("gauss", "exp", "linear"):
        sql = decay_factor_sql(kind, "v", origin=0.0, scale=10.0, decay=0.5)
        import duckdb

        con = duckdb.connect()
        at_scale = con.execute(f"SELECT {sql} FROM (SELECT 10.0 AS v)").fetchone()[0]
        assert math.isclose(at_scale, 0.5, abs_tol=1e-12), kind
        at_origin = con.execute(f"SELECT {sql} FROM (SELECT 0.0 AS v)").fetchone()[0]
        assert at_origin == 1.0, kind
        missing = con.execute(f"SELECT {sql} FROM (SELECT CAST(NULL AS DOUBLE) AS v)").fetchone()[0]
        assert missing == 1.0, kind  # documented rule: missing field -> 1.0

    for bad in [dict(scale=0.0), dict(decay=0.0), dict(decay=1.0),
                dict(offset=-1.0)]:
        kw = dict(origin=0.0, scale=10.0)
        kw.update(bad)
        with pytest.raises(ValueError):
            decay_factor_sql("gauss", "v", **kw)


def test_dsl_decay_hand_computed(tiny_ctx):
    import math

    # replace mode isolates the factor: origin 30, scale 20, decay 0.5
    # -> doc n_chars 10/20/30/40/50 at dist 20/10/0/10/20
    body = {"query": {"function_score": {
        "gauss": {"n_chars": {"origin": 30.0, "scale": 20.0}},
        "boost_mode": "replace"}}, "size": 10}
    got = _hits(tiny_ctx, body)
    sigma2 = -(20.0 ** 2) / (2 * math.log(0.5))
    want = {d: round(math.exp(-(dist ** 2) / (2 * sigma2)), 4)
            for d, dist in [(0, 20.0), (1, 10.0), (2, 0.0), (3, 10.0), (4, 20.0)]}
    assert got == want


@pytest.mark.parametrize("spec", [
    {"gauss": {"n_chars": {"scale": 10.0}}},                    # origin required
    {"gauss": {"n_chars": {"origin": 0, "scale": 10, "x": 1}}},  # unknown param
    {"gauss": {"text": {"origin": 0, "scale": 10}}},            # text column
    {"gauss": {"n_chars": {"origin": 0, "scale": 10}},
     "linear": {"n_chars": {"origin": 0, "scale": 10}}},        # two functions
    {"exp": {"n_chars": {"origin": 0, "scale": 10, "decay": 1.5}}},
])
def test_dsl_decay_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"function_score": spec}, "size": 10})


# --- more_like_this -----------------------------------------------------------


def test_parse_msm():
    from neural_search_spark.query.mlt import parse_msm

    assert parse_msm("30%", 10) == 3
    assert parse_msm("30%", 2) == 1     # floor(0.6) = 0 -> clamped to 1
    assert parse_msm("100%", 4) == 4
    assert parse_msm(3, 10) == 3
    assert parse_msm(99, 4) == 4        # clamped to n_terms
    assert parse_msm(0, 4) == 1
    for bad in ["30", "x%", "150%", 1.5, True, None]:
        with pytest.raises(ValueError):
            parse_msm(bad, 10)


def test_dsl_mlt_selection_and_exclusion(tiny_ctx):
    # doc 1 = "alpha alpha delta": tf(alpha)=2, tf(delta)=1.
    # min_term_freq=2 keeps only alpha -> hits are the OTHER alpha docs
    body = {"query": {"more_like_this": {
        "like": {"_id": 1}, "min_term_freq": 2, "min_doc_freq": 1}},
        "size": 10}
    got = _hits(tiny_ctx, body)
    assert set(got) == {0}

    # min_term_freq=1 selects {alpha, delta}; 30% of 2 -> msm 1;
    # like doc excluded, docs 0 (alpha), 2 and 3 (delta) hit
    body = {"query": {"more_like_this": {
        "like": [{"_id": 1}], "min_term_freq": 1, "min_doc_freq": 1}},
        "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 2, 3}

    # include=true keeps the like doc in the hits
    body["query"]["more_like_this"]["include"] = True
    assert set(_hits(tiny_ctx, body)) == {0, 1, 2, 3}

    # minimum_should_match 100% gates on BOTH selected terms
    body["query"]["more_like_this"]["include"] = False
    body["query"]["more_like_this"]["minimum_should_match"] = "100%"
    assert set(_hits(tiny_ctx, body)) == set()  # only doc 1 has both


def test_dsl_mlt_min_doc_freq_gate(tiny_ctx):
    # min_doc_freq=3 keeps only terms appearing in >= 3 docs:
    # delta (docs 1,2,3) and gamma (0,2,3) qualify; alpha (0,1) not.
    # like doc 1 contributes {alpha, delta} -> selection = {delta}
    body = {"query": {"more_like_this": {
        "like": {"_id": 1}, "min_term_freq": 1, "min_doc_freq": 3}},
        "size": 10}
    assert set(_hits(tiny_ctx, body)) == {2, 3}


@pytest.mark.parametrize("spec", [
    {},                                           # like required
    {"like": []},                                 # empty
    {"like": [{"_id": 1}, {"_id": 2}]},           # multi-doc unsupported
    {"like": ["raw text"]},                       # raw-text unsupported
    {"like": {"_id": "x"}},                       # non-int id
    {"like": {"_id": 1, "_index": "idx"}},        # unknown ref key
    {"like": {"_id": 1}, "fields": ["lang"]},     # non-text field
    {"like": {"_id": 1}, "boost": 2.0},           # unknown param
    {"like": {"_id": 1}, "minimum_should_match": "x%"},
])
def test_dsl_mlt_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"more_like_this": spec}, "size": 10})


# --- rank_feature -------------------------------------------------------------


def test_rank_feature_sql_parity_and_math():
    import duckdb

    from neural_search_spark.query.dsl import rank_feature_sql

    con = duckdb.connect()
    # saturation at x == pivot is exactly 0.5; sigmoid at x == pivot 0.5
    sat = rank_feature_sql("saturation", "v", pivot=20.0)
    sig = rank_feature_sql("sigmoid", "v", pivot=20.0, exponent=2.0)
    logf = rank_feature_sql("log", "v", scaling_factor=1.0)
    lin = rank_feature_sql("linear", "v", boost=2.0)
    import math
    for expr, v, want in [(sat, 20.0, 0.5), (sig, 20.0, 0.5),
                          (logf, math.e - 1.0, 1.0), (lin, 3.0, 6.0)]:
        got = con.execute(f"SELECT {expr} FROM (SELECT {v} AS v)").fetchone()[0]
        assert math.isclose(got, want, rel_tol=1e-12), (expr, v, got)
    for bad in [dict(kind="saturation"),                       # pivot required
                dict(kind="saturation", pivot=0.0),
                dict(kind="sigmoid", pivot=1.0),               # exponent req'd
                dict(kind="log", scaling_factor=0.0),
                dict(kind="nope")]:
        kind = bad.pop("kind")
        with pytest.raises(ValueError):
            rank_feature_sql(kind, "v", **bad)


def test_dsl_rank_feature_leaf_and_composition(tiny_ctx):
    # linear on n_chars (10..50): score == the field value x boost
    body = {"query": {"rank_feature": {"field": "n_chars",
                                       "linear": {}, "boost": 0.1}},
            "size": 10}
    got = _hits(tiny_ctx, body)
    assert got == {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0, 4: 5.0}

    # saturation default-function shape requires pivot explicitly
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"rank_feature": {"field": "n_chars"}},
                          "size": 10})

    # composes as a dis_max sub-query through the leaf fallthrough
    body = {"query": {"dis_max": {"queries": [
        {"match": {"text": "alpha"}},
        {"rank_feature": {"field": "n_chars",
                          "saturation": {"pivot": 10.0}}},
    ]}}, "size": 10}
    got = search(tiny_ctx, body).collect()
    assert len(got) == 5  # every doc has positive n_chars


@pytest.mark.parametrize("spec", [
    {"field": "text", "saturation": {"pivot": 1.0}},   # text column
    {"field": "n_chars", "saturation": {"pivot": 1.0},
     "linear": {}},                                     # two functions
    {"field": "n_chars", "saturation": {"pivot": 1.0, "x": 2}},
    {"field": "n_chars", "positive_score_impact": False},
    {"saturation": {"pivot": 1.0}},                     # field required
])
def test_dsl_rank_feature_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"rank_feature": spec}, "size": 10})


# --- match_bool_prefix --------------------------------------------------------


def test_dsl_match_bool_prefix(tiny_ctx):
    # "beta gam": term clause beta (BM25) + prefix clause gam* (1.0).
    # OR mode: docs 0, 2 match both; doc 3 matches only gam* (score 1.0)
    body = {"query": {"match_bool_prefix": {"text": {"query": "beta gam"}}},
            "size": 10}
    got = _hits(tiny_ctx, body)
    assert set(got) == {0, 2, 3} and got[3] == 1.0
    assert got[0] > 1.0 and got[2] > 1.0  # BM25(beta) + 1.0

    # operator=and gates on BOTH clauses
    body["query"]["match_bool_prefix"]["text"]["operator"] = "and"
    assert set(_hits(tiny_ctx, body)) == {0, 2}

    # single-token query degenerates to the pure prefix clause
    got = _hits(tiny_ctx, {"query": {"match_bool_prefix":
                                     {"text": {"query": "alph"}}}, "size": 10})
    assert got == {0: 1.0, 1: 1.0}

    # minimum_should_match counts clauses in OR mode
    body = {"query": {"match_bool_prefix": {"text": {
        "query": "beta delta gam", "minimum_should_match": 3}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {2}  # beta+delta+gamma only in doc 2


@pytest.mark.parametrize("spec", [
    {"text": {"query": ""}},                              # zero tokens
    {"text": {"query": "a b", "operator": "xor"}},
    {"text": {"query": "a b", "minimum_should_match": 5}},  # > clauses
    {"text": {"query": "a", "fuzziness": 1}},             # unknown param
    {"lang": {"query": "a"}},                             # non-text field
])
def test_dsl_match_bool_prefix_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"match_bool_prefix": spec}, "size": 10})


# --- query_string (classic QueryParser subset) ---------------------------------


def test_query_string_parser_shapes():
    from neural_search_spark.query.querystring import parse_query_string

    mode, ls = parse_query_string('spark AND text:window AND "a b"~2^1.5')
    assert mode == "and"
    assert [(l.kind, l.text, l.field, l.boost, l.slop) for l in ls] == [
        ("term", "spark", None, 1.0, 0),
        ("term", "window", "text", 1.0, 0),
        ("phrase", "a b", "text" if False else None, 1.5, 2)]

    mode, ls = parse_query_string("merg* OR wi?d OR scal~ OR -dup")
    assert mode == "or"
    assert [(l.kind, l.text, l.negated, l.slop) for l in ls] == [
        ("prefix", "merg", False, 0), ("wildcard", "wi?d", False, 0),
        ("fuzzy", "scal", False, 2), ("term", "dup", True, 0)]

    # whitespace-only separators take default_operator
    assert parse_query_string("a b", "and")[0] == "and"
    # NOT negates its clause
    mode, ls = parse_query_string("a NOT b")
    assert [(l.text, l.negated) for l in ls] == [("a", False), ("b", True)]


@pytest.mark.parametrize("bad", [
    "a AND b OR c",           # mixed connectors
    "(a b)",                  # grouping
    "f:[1 TO 2]",             # range
    "/re.*/",                 # regex
    "+a b",                   # required marker -- '+a' has '+'
    "a^x",                    # bad boost
    "a~3",                    # fuzziness bound
    '"a b"~x',                # bad slop
    "NOT NOT a",
    "a OR",                   # trailing connector
    "text:",                  # empty field value
    "e\\scape",
    "*?",                     # pure wildcard
])
def test_query_string_parser_rejections(bad):
    from neural_search_spark.query.querystring import (QueryStringError,
                                                       parse_query_string)

    with pytest.raises(QueryStringError):
        parse_query_string(bad)


def test_query_string_mixing_guard():
    from neural_search_spark.query.querystring import (QueryStringError,
                                                       parse_query_string)

    # bare whitespace + explicit OR agreeing with the default: fine
    assert parse_query_string("a b OR c", "or")[0] == "or"
    # disagreeing with the default: the classic precedence foot-gun
    with pytest.raises(QueryStringError):
        parse_query_string("a b OR c", "and")


def test_dsl_query_string_scoring(tiny_ctx):
    # constant-score prefix clause, boosted
    got = _hits(tiny_ctx, {"query": {"query_string": {"query": "alph*^2.0"}},
                           "size": 10})
    assert got == {0: 2.0, 1: 2.0}

    # term OR phrase: doc 0 has both alpha and "beta gamma"
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": 'alpha OR "beta gamma"'}},
                           "size": 10})
    assert set(got) == {0, 1, 2}

    # sloppy phrase: "alpha gamma"~1 matches doc 0 (alpha BETA gamma)
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": '"alpha gamma"~1'}}, "size": 10})
    assert set(got) == {0}
    # and at slop 0 it does not
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": '"alpha gamma"'}}, "size": 10})
    assert got == {}

    # AND gates on every clause; negation excludes
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": "gamma AND delta"}}, "size": 10})
    assert set(got) == {2, 3}
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": "gamma AND delta AND -epsilon"}},
                           "size": 10})
    assert set(got) == {2}

    # fuzzy clause: zeta~1 matches zeta/eta (doc 4) AND beta (docs 0, 2
    # — one substitution), all at constant 1.0
    got = _hits(tiny_ctx, {"query": {"query_string": {"query": "zeta~1"}},
                           "size": 10})
    assert got == {0: 1.0, 2: 1.0, 4: 1.0}


@pytest.mark.parametrize("spec", [
    {"query": "lang:es"},                        # non-text field
    {"query": "a", "default_field": "lang"},
    {"query": "a", "fields": ["lang"]},
    {"query": "a", "analyze_wildcard": True},    # unknown param
    {"query": "-a"},                             # all clauses negated
    {"query": "a b", "minimum_should_match": 3},
])
def test_dsl_query_string_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"query_string": spec}, "size": 10})


# --- terms_set (CoveringQuery) --------------------------------------------------


def test_dsl_terms_set_script_constant(tiny_ctx):
    # {beta, gamma, delta} with constant minimum 2: docs 0 (beta+gamma),
    # 2 (all three), 3 (gamma+delta) qualify; doc 1 matches only delta
    body = {"query": {"terms_set": {"text": {
        "terms": ["beta", "gamma", "delta"],
        "minimum_should_match_script": {"source": "2"}}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 2, 3}

    # a minimum above the distinct-term count matches nothing
    body["query"]["terms_set"]["text"]["minimum_should_match_script"] = \
        {"source": "4"}
    assert _hits(tiny_ctx, body) == {}


def test_dsl_terms_set_per_doc_field(spark):
    from neural_search_spark.query.dsl import SearchContext, search

    rows = [
        (0, "alpha beta gamma", 1),   # needs 1 match -> qualifies
        (1, "alpha beta gamma", 3),   # needs all 3 -> qualifies
        (2, "alpha beta zeta", 3),    # needs 3, matches 2 -> out
        (3, "zeta eta theta", 1),     # matches 0 -> out
        (4, "alpha", 0),              # minimum clamps to 1 -> qualifies
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "required"])
    ctx = SearchContext(docs=docs)
    body = {"query": {"terms_set": {"text": {
        "terms": ["alpha", "beta", "gamma"],
        "minimum_should_match_field": "required"}}}, "size": 10}
    got = {r["doc_id"] for r in search(ctx, body).collect()}
    assert got == {0, 1, 4}


@pytest.mark.parametrize("spec", [
    {"terms": ["a"]},                                        # no minimum
    {"terms": ["a"], "minimum_should_match_field": "x",
     "minimum_should_match_script": {"source": "1"}},        # both
    {"terms": [], "minimum_should_match_field": "n_chars"},  # empty terms
    {"terms": ["a"], "minimum_should_match_script":
     {"source": "params.x"}},                                # real script
    {"terms": ["a"], "minimum_should_match_script":
     {"source": "1", "lang": "painless"}},                   # extra key
    {"terms": ["a"], "boost": 2.0,
     "minimum_should_match_script": {"source": "1"}},        # unknown param
])
def test_dsl_terms_set_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"terms_set": {"text": spec}}, "size": 10})


# --- review-pass regressions (session 5) ----------------------------------------


def test_query_string_and_mode_multi_token_clause_is_conjunctive(tiny_ctx):
    # a clause analyzing to several tokens applies the default operator
    # INSIDE the clause under AND (Lucene createBooleanQuery with MUST):
    # "alpha-gamma" splits to [alpha, gamma]; only doc 0 has both
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": "alpha-gamma AND beta"}},
                           "size": 10})
    assert set(got) == {0}
    # in OR mode the same clause is an OR group: alpha or gamma
    got = _hits(tiny_ctx, {"query": {"query_string":
                                     {"query": "alpha-gamma OR beta"}},
                           "size": 10})
    assert set(got) == {0, 1, 2, 3}


def test_regexp_brace_validation():
    from neural_search_spark.query.multiterm import regexp_matcher

    regexp_matcher("foo[0-9]{2}")        # valid quantifier
    regexp_matcher("a[{]b")              # literal brace inside a class
    regexp_matcher("a[}]")
    for bad in ["a{2", "a{2,", "{2}", "a}", "(a){2", "a{x}", "|{2}",
                "[]]eta", "[abc"]:
        with pytest.raises(ValueError):
            regexp_matcher(bad)


def test_query_string_mid_caret_and_double_colon_reject():
    from neural_search_spark.query.querystring import (QueryStringError,
                                                       parse_query_string)

    for bad in ["a^2^3", "spark^2b^3", "text:a:b", '"a b"^2^3']:
        with pytest.raises(QueryStringError):
            parse_query_string(bad)
    # a colon INSIDE a quoted phrase is analyzer fodder, not field syntax
    mode, ls = parse_query_string('text:"a: b"')
    assert ls[0].kind == "phrase" and ls[0].text == "a: b"


def test_terms_set_null_minimum_never_matches(spark):
    from neural_search_spark.query.dsl import SearchContext, search

    rows = [(0, "alpha beta", 1), (1, "alpha beta", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, required int")
    ctx = SearchContext(docs=docs)
    body = {"query": {"terms_set": {"text": {
        "terms": ["alpha"], "minimum_should_match_field": "required"}}},
        "size": 10}
    got = {r["doc_id"] for r in search(ctx, body).collect()}
    assert got == {0}  # the NULL-minimum doc has no per-doc value -> no match


def test_msm_type_rejections(tiny_ctx):
    for typ, spec in [
        ("match_bool_prefix", {"text": {"query": "a b",
                                        "minimum_should_match": "30%"}}),
        ("match_bool_prefix", {"text": {"query": 3}}),
        ("query_string", {"query": "a b", "minimum_should_match": "30%"}),
        ("simple_query_string", {"query": "a b",
                                 "minimum_should_match": True}),
    ]:
        with pytest.raises(DslError):
            search(tiny_ctx, {"query": {typ: spec}, "size": 10})


# --- match: minimum_should_match + fuzziness -------------------------------------


def test_dsl_match_msm_and_fuzzy(tiny_ctx):
    # msm 2 over {alpha, beta, delta}: docs 0 (alpha+beta), 1
    # (alpha+delta), 2 (beta+delta)
    body = {"query": {"match": {"text": {
        "query": "alpha beta delta", "minimum_should_match": 2}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 1, 2}

    # msm above the distinct-term count matches nothing
    body["query"]["match"]["text"]["minimum_should_match"] = 4
    assert _hits(tiny_ctx, body) == {}

    # operator=and makes every term required -> msm is a no-op
    body = {"query": {"match": {"text": {
        "query": "beta gamma", "operator": "and",
        "minimum_should_match": 1}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 2}

    # fuzziness 1: zeta~1 expands to {zeta, eta, beta}, theta~1 to
    # {theta, eta(?2 edits: no)} -> theta; all matched docs score the
    # BM25 OR over the expansion set
    body = {"query": {"match": {"text": {
        "query": "zeta theta", "fuzziness": 1}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 2, 4}

    # AUTO: a 3-char token gets 1 edit -> eta's 1-edit neighbors in the
    # dictionary are zeta AND beta (one insertion each), plus eta
    # itself -> docs 0, 2 (beta) and 4 (zeta, eta)
    body = {"query": {"match": {"text": {
        "query": "eta", "fuzziness": "AUTO"}}}, "size": 10}
    assert set(_hits(tiny_ctx, body)) == {0, 2, 4}

    # AUTO: a 2-char token gets 0 edits (exact only) -> no dictionary
    # term equals "et", zero expansions -> empty result
    body = {"query": {"match": {"text": {
        "query": "et", "fuzziness": "AUTO"}}}, "size": 10}
    assert _hits(tiny_ctx, body) == {}


@pytest.mark.parametrize("spec", [
    {"query": "a", "fuzziness": 3},
    {"query": "a", "fuzziness": "AUTOX"},
    {"query": "a b", "fuzziness": 1, "operator": "and"},
    {"query": "a b", "fuzziness": 1, "minimum_should_match": 1},
    {"query": "a b", "minimum_should_match": "30%"},
])
def test_dsl_match_msm_fuzzy_rejections(tiny_ctx, spec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"query": {"match": {"text": spec}}, "size": 10})


# --- suggest (term suggester) -----------------------------------------------------


def test_dsl_suggest_term_modes(tiny_ctx):
    def rows(body):
        return [(r["token"], r["suggestion"], r["distance"], r["rank"])
                for r in search(tiny_ctx, body).collect()]

    # missing mode: "betta" is absent -> suggest beta (1 edit);
    # "gamma" exists -> no suggestions for it
    got = rows({"suggest": {"s": {"text": "betta gamma",
                                  "term": {"field": "text",
                                           "max_edits": 1}}}})
    assert got == [("betta", "beta", 1, 1)]

    # always mode suggests for present tokens too: gamma's 1-edit
    # dictionary neighbor is none, but 2-edit finds none either at
    # max_edits 1 -> eta's neighbors zeta/beta rank by (dist, df, term)
    got = rows({"suggest": {"s": {"text": "eta",
                                  "term": {"field": "text",
                                           "suggest_mode": "always",
                                           "max_edits": 1}}}})
    # df: beta 2 docs (0, 2), zeta 1 doc (4) -> beta first
    assert got == [("eta", "beta", 1, 1), ("eta", "zeta", 1, 2)]

    # popular mode: only suggestions strictly more frequent than input
    # eta df=1; beta df=2 qualifies, zeta df=1 does not
    got = rows({"suggest": {"s": {"text": "eta",
                                  "term": {"field": "text",
                                           "suggest_mode": "popular",
                                           "max_edits": 1}}}})
    assert got == [("eta", "beta", 1, 1)]

    # size caps per token
    got = rows({"suggest": {"s": {"text": "eta",
                                  "term": {"field": "text",
                                           "suggest_mode": "always",
                                           "max_edits": 1, "size": 1}}}})
    assert got == [("eta", "beta", 1, 1)]


@pytest.mark.parametrize("body", [
    {"suggest": {"s": {"text": "a", "term": {"field": "lang"}}}},
    {"suggest": {"s": {"text": "a", "term": {"max_edits": 3}}}},
    {"suggest": {"s": {"text": "a", "term": {"suggest_mode": "weird"}}}},
    {"suggest": {"s": {"term": {"field": "text"}}}},              # no text
    {"suggest": {"s": {"text": "...", "term": {"field": "text"}}}},  # 0 toks
    {"suggest": {"s": {"text": "a", "term": {}}},
     "query": {"match_all": {}}},                                  # query+suggest
    {"suggest": {"s": {"text": "a", "term": {}}}, "size": 5},
])
def test_dsl_suggest_rejections(tiny_ctx, body):
    with pytest.raises(DslError):
        search(tiny_ctx, body)


# --- parser families as hybrid sub-queries ----------------------------------------


def test_hybrid_parser_family_sub_queries(tiny_ctx):
    # each parser family scores its FULL match set into normalization;
    # single-sub hybrid with weight 1 == the standalone query's ranking
    from neural_search_spark.query.dsl import search as _search

    for sub in [
        {"query_string": {"query": "gamma AND delta"}},
        {"simple_query_string": {"query": "gamma delta",
                                 "default_operator": "and"}},
        {"match_bool_prefix": {"text": {"query": "gamma delt"}}},
    ]:
        body = {"query": {"hybrid": {"queries": [sub]}}, "size": 10}
        pipeline = {"normalization": "min_max",
                    "combination": "arithmetic_mean", "weights": [1.0]}
        hybrid_ids = [r["doc_id"] for r in
                      _search(tiny_ctx, body, pipeline=pipeline).collect()]
        solo_ids = [r["doc_id"] for r in
                    _search(tiny_ctx, {"query": sub, "size": 10}).collect()]
        assert hybrid_ids == solo_ids, sub


# --- suggest (completion suggester) -----------------------------------------


def test_dsl_suggest_completion_prefix(tiny_ctx):
    # corpus dfs: gamma 3, delta 3, alpha 2, beta 2, others 1
    got = [(r["suggestion"], r["weight"], r["rank"]) for r in search(
        tiny_ctx, {"suggest": {"c": {"prefix": "g", "completion": {
            "field": "text", "size": 3}}}, "size": 0}).collect()]
    assert got == [("gamma", 3, 1)]
    # weight DESC then suggestion ASC across a wider prefix set
    got = [(r["suggestion"], r["rank"]) for r in search(
        tiny_ctx, {"suggest": {"c": {"prefix": "e", "completion": {
            "field": "text", "size": 2}}}, "size": 0}).collect()]
    assert got == [("epsilon", 1), ("eta", 2)]  # df ties -> term ASC


def test_dsl_suggest_completion_regex(tiny_ctx):
    got = [(r["suggestion"], r["weight"]) for r in search(
        tiny_ctx, {"suggest": {"c": {"regex": ".et.*", "completion": {
            "size": 5}}}, "size": 0}).collect()]
    # whole-term '.et.*': characters 2-3 must be 'et' — beta and zeta
    # match; eta lacks a leading character, theta has 'he' there
    assert got == [("beta", 2), ("zeta", 1)]


@pytest.mark.parametrize("sspec", [
    {"prefix": "a", "regex": "a.*", "completion": {"size": 2}},   # both
    {"completion": {"size": 2}},                                  # neither
    {"prefix": "a", "completion": {"field": "lang"}},             # bad field
    {"prefix": "", "completion": {"size": 2}},                    # empty
    {"prefix": "a", "completion": {"size": 0}},                   # bad size
    {"prefix": "a", "completion": {"size": 2.5}},                 # float
    {"prefix": "a", "completion": {"size": True}},                # bool
    {"prefix": "a", "completion": {"size": 2, "fuzzy": {}}},      # unknown
    {"regex": "a\\b", "completion": {"size": 2}},                 # backslash
])
def test_dsl_suggest_completion_rejections(tiny_ctx, sspec):
    with pytest.raises(DslError):
        search(tiny_ctx, {"suggest": {"c": sspec}, "size": 0})
