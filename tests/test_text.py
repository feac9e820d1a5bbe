"""Exact-value unit tests for functions/text.py — in particular the
repetition metrics (max_token_run, bigram_repetition), whose n<2 /
empty-document edge cases are not guaranteed to occur in the synthetic
corpus the correctness gate runs on."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark.functions import text as TX


def _vals(spark, texts, *cols):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = (df.select(*[c.alias(f"c{i}") for i, c in enumerate(cols)])
            .collect())
    return [tuple(r) for r in rows]


def test_max_token_run(spark):
    out = _vals(
        spark,
        ["a b c a b a",          # 'a' x3
         "x",                    # single token
         "",                     # empty -> 0
         "Dog, dog! DOG? cat"],  # normalization folds case/punct: dog x3
        TX.max_token_run(F.col("text")))
    assert out == [(3,), (1,), (0,), (3,)]


def test_bigram_repetition(spark):
    n_bi, n_dup = TX.bigram_repetition(F.col("text"))
    out = _vals(
        spark,
        ["a b a b a",   # bigrams: ab ba ab ba -> 4 total, 2 duplicated
         "a b c",       # ab bc -> none duplicated
         "a",           # n<2 -> (0, 0)
         ""],
        n_bi, n_dup)
    assert out == [(4, 2), (2, 0), (0, 0), (0, 0)]


def test_bigrams_total_on_short_docs(spark):
    # bigrams() is staged as an eagerly-projected column by text_analysis,
    # so it must not throw on 0/1-token docs (ADVICE r2: descending
    # F.sequence + F.slice start=0 raised INVALID_PARAMETER_VALUE.START)
    out = _vals(
        spark,
        ["a b c", "a", "", "   ", "!?."],
        TX.bigrams(TX.word_tokens(F.col("text"))))
    assert out[0] == (["a b", "b c"],)
    assert all(o == ([],) for o in out[1:])


def test_quality_and_langid_edges(spark):
    out = _vals(
        spark,
        ["the cat is on the mat and it is fine " * 5,
         "der hund ist nicht ein katze und das"],
        TX.langid_heuristic(F.col("text")))
    assert out == [("en",), ("de",)]


def test_line_metrics_exact(spark):
    import stream2segment_spark.functions.text as TX
    from pyspark.sql import functions as F
    doc = "intro line\n- bullet one\n  * bullet two\nplain\nto be continued...\ndone…\n"
    df = spark.createDataFrame([(doc,)], "text string")
    n, b, e = TX.line_metrics(F.col("text"))
    row = df.select(n.alias("n"), b.alias("b"), e.alias("e")).collect()[0]
    # trailing newline -> split yields a final empty line (kept, like DuckDB)
    assert row["n"] == 7
    assert row["b"] == 2            # '-' and '*' bullets, whitespace-trimmed
    assert row["e"] == 2            # '...' and the unicode ellipsis


def test_pii_count_and_redact(spark):
    import stream2segment_spark.functions.text as TX
    from pyspark.sql import functions as F
    doc = ("mail me at alice.smith+x@sub.example.org or bob@ex.io, "
           "server 192.168.001.5 responded, call +4915771234567 now; "
           "not-an-ip 1.2.3 and not-a-phone +123")
    df = spark.createDataFrame([(doc,)], "text string")
    row = df.select(
        TX.pii_count(F.col("text"), "email").alias("e"),
        TX.pii_count(F.col("text"), "ipv4").alias("i"),
        TX.pii_count(F.col("text"), "phone").alias("p"),
        TX.redact_pii(F.col("text")).alias("r")).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (2, 1, 1)
    assert "alice" not in row["r"] and "192.168" not in row["r"]
    assert "+49157" not in row["r"] and row["r"].count("<PII>") == 4
    assert "1.2.3 and" in row["r"]          # 3-octet string untouched


def test_contamination_fractions(spark):
    from stream2segment_spark.operators.dedup import contamination_fractions
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"),   # 3 shingles
         (2, "alpha beta gamma delta epsilon"),            # 1 shingle
         (3, "one two three four five six seven eight"),   # 4, disjoint
         (4, None)],                                       # null text
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")],      # 2 shingles
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           contamination_fractions(docs, bench, k=5).collect()}
    # doc 1: shingles at offsets 0,1,2 -> first two are in the benchmark
    assert (out[1]["n_shingles"], out[1]["n_contam"]) == (3, 2)
    assert abs(out[1]["contam_frac"] - round(2 / 3, 6)) < 1e-9
    assert (out[2]["n_shingles"], out[2]["n_contam"]) == (1, 1)
    assert out[3]["n_contam"] == 0
    assert out[4]["n_shingles"] == 1 and out[4]["n_contam"] == 0


def test_contamination_beyond_broadcast_path_identical(spark):
    """broadcast_probe=False (the beyond-broadcast-size benchmark path)
    produces identical output to the broadcast probe."""
    from stream2segment_spark.operators.dedup import contamination_fractions
    from stream2segment_spark.schema import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter("doc_id % 10 = 0")
    a = {r.doc_id: (r.n_shingles, r.n_contam, r.contam_frac) for r in
         contamination_fractions(docs, bench, k=5).collect()}
    b = {r.doc_id: (r.n_shingles, r.n_contam, r.contam_frac) for r in
         contamination_fractions(docs, bench, k=5,
                                 broadcast_probe=False).collect()}
    assert a == b and len(a) > 0


def test_token_rarity(spark):
    from stream2segment_spark.functions.text import token_rarity
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"),        # banana/cherry shared below
         (2, "banana cherry banana"),       # in-doc repeat: distinct only
         (3, "unique singleton words"),
         (4, None)],                        # no tokens -> no row
        "doc_id long, text string")
    out = {r.doc_id: r for r in token_rarity(docs, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    # doc 1: apple df=1, banana df=2, cherry df=2 -> mean 5/3, 1 hapax
    assert out[1].n_distinct == 3 and out[1].n_hapax == 1
    assert out[1].mean_df == round(5 / 3, 6)
    # doc 2: banana+cherry distinct only (repeat ignored), both df=2
    assert out[2].n_distinct == 2 and out[2].n_hapax == 0
    assert out[2].mean_df == 2.0
    assert out[3].n_hapax == 3 and out[3].mean_df == 1.0


def test_quality_ratios_degenerate_docs_dont_crash(spark):
    """Empty / null / punctuation-only docs: under ANSI mode (Spark 4
    default) a bare ratio division killed the whole job; the guards
    yield NULL (DuckDB's x/0 semantics) and quality_score falls through
    to its 0.5 band defaults."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, ""), (2, None), (3, "!!!")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("q"),
        TX.punct_ratio(F.col("text")).alias("pr"),
        TX.mean_word_length(F.col("text")).alias("mwl"),
        TX.stopword_ratio(F.col("text")).alias("sw")).collect()}
    assert all(rows[i]["q"] == 0.5 for i in (1, 2, 3))
    assert rows[1]["pr"] is None and rows[3]["pr"] == 1.0
    assert all(rows[i]["mwl"] is None and rows[i]["sw"] is None
               for i in (1, 2, 3))


def test_c4_and_line_rules_tolerate_crlf(spark):
    """Windows line endings must not reject every line: the '\\r' tail
    used to fail the terminal-punctuation rule (and the bullet/ellipsis
    patterns), silently discarding the whole CRLF subset of a corpus."""
    from pyspark.sql import Row

    from stream2segment_spark.functions.text import (
        c4_kept_lines, line_metrics)
    lf = "This is a good sentence with many words.\nAnother fine line here today."
    crlf = lf.replace("\n", "\r\n")
    df = spark.createDataFrame([Row(id=1, text=lf), Row(id=2, text=crlf)])
    got = {r["id"]: r["kept"] for r in df.select(
        "id", F.size(c4_kept_lines(F.col("text"))).alias("kept")).collect()}
    assert got[1] == got[2] == 2
    n, bullet, ellipsis = line_metrics(F.col("text"))
    m = {r["id"]: (r["n"], r["e"]) for r in df.select(
        "id", n.alias("n"), ellipsis.alias("e")).collect()}
    assert m[1] == m[2] == (2, 0)
    df2 = spark.createDataFrame(
        [Row(id=1, text="truncated thought goes on...\r\nnormal line.")])
    _, _, ell = line_metrics(F.col("text"))
    assert df2.select(ell.alias("e")).first()["e"] == 1


def test_repetition_line_metrics_crlf(spark):
    """r6 review: line identity must treat CRLF like LF on BOTH engines
    (the oracle used to split on chr(10), keeping the \r in the line)."""
    import pytest
    from pyspark.sql import Row

    from stream2segment_spark.functions.text import repetition_signals
    txt = ("dup crlf line one two three.\r\ndup crlf line one two three."
           "\r\ndup crlf line one two three.")
    df = spark.createDataFrame([Row(doc_id=1, text=txt)])
    r = repetition_signals(df, "text", "doc_id").collect()[0]
    assert r["dup_line_frac"] == pytest.approx(2 / 3)
    assert r["dup_line_char_frac"] == pytest.approx(2 / 3)


def test_script_count_matches_python(spark):
    import re
    from pyspark.sql import functions as F
    from stream2segment_spark.functions.text import (_SCRIPT_RANGES,
                                                     script_count)
    samples = ["Привет мир", "東京は日本", "한국의 수도", "mixed 東京 text",
               "กรุงเทพ", "दिल्ली", "", None, "12345 !!!"]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    for script, ranges in _SCRIPT_RANGES.items():
        got = [r[0] for r in
               df.select(script_count(F.col("text"), script)).collect()]
        want = [len(re.findall(f"[{ranges}]", s or "")) for s in samples]
        assert got == want, script


def test_langid_script_labels(spark):
    from pyspark.sql import functions as F
    from stream2segment_spark.functions.text import langid_script
    rows = [
        ("The quick brown fox and the lazy dog in that it is", "en"),
        ("Der Hund ist nicht ein der die das und zu", "de"),
        ("Привет мир это тест на русском языке", "ru"),
        ("東京は日本の首都です", "ja"),          # han + kana
        ("中国的首都是北京", "zh"),              # han only
        ("日本語文章漢字多数の", "ja"),          # han-dominant + 1 kana
        ("한국의 수도는 서울입니다", "ko"),
        ("Αθήνα είναι η πρωτεύουσα", "el"),
        ("القاهرة هي عاصمة مصر", "ar"),
        ("ירושלים היא עיר הבירה", "he"),
        ("दिल्ली भारत की राजधानी है", "hi"),
        ("กรุงเทพมหานครเป็นเมืองหลวง", "th"),
        # Latin-dominant with a CJK mention: heuristic fallback
        ("the page about 東京 and its districts in the spring", "en"),
        ("12345 67890 --- !!!", "und"),
        ("", "und"),
        (None, "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(langid_script(F.col("text"))).collect()]
    assert got == [want for _, want in rows]


def test_embed_text_unicode_mode():
    import numpy as np
    from stream2segment_spark.functions.embeddings import embed_text
    # ascii mode erases CJK entirely: same vector as the text without it
    assert np.array_equal(embed_text("hello 東京 world"),
                          embed_text("hello world"))
    v_uni = embed_text("hello 東京 world", tokenizer="unicode")
    assert not np.array_equal(v_uni, embed_text("hello world"))
    # pure-CJK text embeds to a real unit vector in unicode mode,
    # the zero vector in ascii mode
    assert np.allclose(np.linalg.norm(
        embed_text("東京 大阪 京都", tokenizer="unicode")), 1.0)
    assert np.linalg.norm(embed_text("東京 大阪 京都")) == 0.0


# ---------------------------------------------------------------------------
# html_to_text
# ---------------------------------------------------------------------------

def _py_html_to_text(html: str) -> str:
    """Pure-Python reference replay of the documented pass order."""
    import re
    from stream2segment_spark.functions.text import (
        HTML_BLOCK_TAG, HTML_ENTITIES, HTML_INLINE_TAG,
        HTML_STRIP_PATTERNS, _WS_EDGE, _WS_NEWLINE_RUN, _WS_SPACE_RUN)
    out = html
    for pat in HTML_STRIP_PATTERNS:
        out = re.sub(pat, " ", out)
    out = re.sub(HTML_BLOCK_TAG, "\n", out)
    out = re.sub(HTML_INLINE_TAG, " ", out)
    for ent, rep in HTML_ENTITIES:
        out = out.replace(ent, rep)
    out = re.sub(_WS_NEWLINE_RUN, "\n", out)
    out = re.sub(_WS_SPACE_RUN, " ", out)
    return re.sub(_WS_EDGE, "", out)


_HTML_CASES = [
    # line structure: block tags -> newlines (C4/line-dedup contract)
    '<p>one</p><p>two</p><div>three</div>',
    'a<br>b<br/>c',
    'inline <b>bold</b> and <i>italic</i> stay on one line',
    '<ul><li>x</li><li>y</li></ul>',
    '<html><body><p>plain text</p></body></html>',
    '<p>Hi &amp; &lt;b&gt; bye</p><script>var a = 1 < 2;</script>',
    '<style type="text/css">p { color: red }</style>kept',
    'before<!-- comment\nspanning lines -->after',
    '<SCRIPT>upper case();</SCRIPT>outside',
    '<script>no close tag; body text survives tag strip',
    'entities only: &quot;q&quot; &#39;a&#39; x&nbsp;y &amp;lt;',
    'no markup at all',
    '', 
    'unicode 東京 &amp; Привет <b>bold</b>',
    'a  \t b \n\n c',
]


def test_html_to_text_three_engines(spark):
    import duckdb
    from pyspark.sql import functions as F
    from stream2segment_spark.functions.text import (
        html_to_text, html_to_text_sql)
    want = [_py_html_to_text(h) for h in _HTML_CASES]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(_HTML_CASES)],
                               "i long, html string")
    got_spark = [r.t for r in df.select(
        html_to_text(F.col("html")).alias("t")).orderBy("i").collect()]
    assert got_spark == want
    con = duckdb.connect()
    got_duck = [con.execute(
        "SELECT " + html_to_text_sql("$1"), [h]).fetchone()[0]
        for h in _HTML_CASES]
    assert got_duck == want


def test_html_to_text_line_structure_pinned():
    # block tags become newlines, inline tags become spaces: line-based
    # downstream stages (C4 min_lines, line dedup) depend on this
    assert _py_html_to_text('<p>one</p><p>two</p><p>three</p>') \
        == "one\ntwo\nthree"
    assert _py_html_to_text('x <b>y</b> z') == "x y z"
    assert "\n" not in _py_html_to_text('a <span>b</span> c')


def test_html_to_text_ordering_pinned():
    # decode AFTER strip: an encoded script tag is literal text
    assert _py_html_to_text("&lt;script&gt;x&lt;/script&gt;") \
        == "<script>x</script>"
    # &amp; decodes LAST: "&amp;lt;" is the literal string "&lt;"
    assert _py_html_to_text("&amp;lt;") == "&lt;"
