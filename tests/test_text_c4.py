"""The C4 cleaning surface (Raffel et al. 2020 §2.2): line filter,
page rules, and the corpus-level three-sentence-span dedup."""

from kiji_mapreduce_spark.pipeline import dedup, text as text_ops


def test_c4_line_filter(spark):
    """Each published line rule fires on its designed offender; the
    survivors rebuild in order; NULL text stays NULL with zero
    counts; CRLF normalizes."""
    good1 = "This line has more than five words in it."
    good2 = "Another perfectly reasonable sentence ends with a mark!"
    docs = [
        (0, good1 + "\r\n"
            + "short line here."                       # < 5 words
            + "\n" + "no terminal punctuation on this line at all"
            + "\n" + "Please enable JavaScript to view the comments."
            + "\n" + good2),
        (1, None),
        (2, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in text_ops.c4_line_filter(df).collect()}
    assert got[0].text == good1 + "\n" + good2
    assert got[0].c4_lines_kept == 2 and got[0].c4_lines_dropped == 3
    assert got[1].text is None
    assert got[1].c4_lines_kept == 0 and got[1].c4_lines_dropped == 0
    assert got[2].text == "" and got[2].c4_lines_kept == 0


def test_c4_quality_rules_and_filter(spark):
    """Each page rule fires on its offender; the bad-word rule is
    opt-in and folds to one alternation; c4_filter composes line +
    page rules over the CLEANED text and drops the verdicts."""
    clean = ("This page is a perfectly normal piece of writing.\n"
             "It goes on for a second complete sentence right here.\n"
             "And then a third one wraps the whole thing up nicely.")
    docs = [
        (0, clean),
        (1, "Only one real sentence lives on this page today."),
        (2, clean + "\nAs the saying goes lorem ipsum dolor sit amet."),
        (3, clean.replace("normal piece", "normal { piece")),
        (4, clean.replace("normal piece", "very badword piece")),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in
           text_ops.c4_quality_rules(df, bad_words=["badword",
                                                    "other.term"])
           .collect()}
    assert got[0].c4_pass
    assert not got[1].c4_min_sentences and not got[1].c4_pass
    assert not got[2].c4_no_lorem
    assert not got[3].c4_no_braces
    assert not got[4].c4_no_bad_words
    assert not got[5].c4_min_sentences  # NULL fails sentences only
    assert got[5].c4_no_lorem and got[5].c4_no_braces

    # without a list, the bad-word rule passes everything
    relaxed = {r.doc_id: r for r in
               text_ops.c4_quality_rules(df).collect()}
    assert relaxed[4].c4_no_bad_words and relaxed[4].c4_pass

    kept = text_ops.c4_filter(df, bad_words=["badword"])
    assert [r.doc_id for r in kept.collect()] == [0]
    assert kept.columns == ["doc_id", "text"]  # verdicts dropped


def test_c4_filter_judges_cleaned_text(spark):
    """The page rules run AFTER line removal (the paper's order): a
    page whose lorem-ipsum line dies in the line filter passes the
    page rule on what survives."""
    clean = ("This page is a perfectly normal piece of writing.\n"
             "It goes on for a second complete sentence right here.\n"
             "And then a third one wraps the whole thing up nicely.")
    # the lorem line lacks terminal punctuation -> the line filter
    # strips it before the page rules look
    doc = clean + "\nlorem ipsum dolor sit amet consectetur adipiscing"
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    assert text_ops.c4_filter(df).count() == 1
    assert text_ops.c4_filter(df, line_filter=False).count() == 0


def test_c4_span_dedup(spark):
    """All-but-one removal of any repeated three-sentence span: the
    globally first (min id, pos) occurrence keeps its text, later
    occurrences lose exactly the span's sentences, unrelated docs
    and NULL text pass through untouched."""
    shared = ("Alpha alpha one. Bravo bravo two. Charlie charlie "
              "three.")
    docs = [
        (0, "Intro sentence zero. " + shared + " Tail sentence four."),
        (1, shared + " A different tail lives here."),
        (2, "Totally unrelated first. Totally unrelated second. "
            "Totally unrelated third."),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in
           dedup.c4_span_dedup(df, hash_fn="md5").collect()}
    # doc 0 holds the first occurrence (pos 1) -> intact
    assert got[0].c4_sentences_dropped == 0
    assert "Bravo bravo two." in got[0].text
    # doc 1's copy (pos 0) loses the three span sentences
    assert got[1].c4_sentences_dropped == 3
    assert got[1].text == "A different tail lives here."
    assert got[2].c4_sentences_dropped == 0
    assert got[3].text is None and got[3].c4_sentences_dropped == 0


def test_c4_span_dedup_within_doc(spark):
    """A span repeated INSIDE one document dedups by the same rule:
    the first position wins, the repeat is removed."""
    span = ("Delta delta one. Echo echo two. Foxtrot foxtrot "
            "three.")
    doc = span + " Divider sentence here. " + span
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    row = dedup.c4_span_dedup(df, hash_fn="md5").collect()[0]
    assert row.c4_sentences_dropped == 3
    assert row.text == span + " Divider sentence here."


def test_curate_c4_gate(spark):
    """CurateConfig.c4_rules narrows and REWRITES the corpus before
    scoring: a page-rule violator is gone, the survivor's text is the
    line-filtered rebuild, verdict columns never leak downstream, and
    off-by-default leaves both."""
    from kiji_mapreduce_spark.pipeline import curate

    good_line = ("This sentence carries well over five words and "
                 "ends properly.")
    noise = "no terminal punctuation so this line disappears"
    good = "\n".join([good_line] * 5 + [noise])
    # the brace line SURVIVES the line filter (>= 5 words, ends in a
    # period) so the doc dies on the page rule itself — not by
    # becoming doc 1's near-duplicate after line cleaning
    braces = ("Completely different opening sentence for this page.\n"
              "Another unrelated line keeps the content distinct too.\n"
              "The code template says { braces } and ends correctly.")
    df = spark.createDataFrame(
        [(1, good, "en", "web"), (2, braces, "en", "web")],
        "doc_id long, text string, lang string, source string")
    cfg = curate.CurateConfig(min_quality=0.0, c4_rules=True)
    out = curate.curate_corpus(df, config=cfg)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].text == "\n".join([good_line] * 5)  # noise line gone
    assert not [c for c in out.columns if c.startswith("c4_")]
    off = curate.curate_corpus(df, config=curate.CurateConfig(
        min_quality=0.0))
    assert sorted(r.doc_id for r in off.collect()) == [1, 2]


def test_c4_rules_match_duckdb_oracle(spark):
    """Cross-engine evidence for the future oracle seat (the
    registry-note claim): the full C4 chain — line filter rebuild,
    then page rules over the cleaned text — reproduced in DuckDB SQL
    over 200 deterministically varied docs; kept ids AND rebuilt
    texts match exactly."""
    import hashlib

    import duckdb

    from kiji_mapreduce_spark.pipeline import text as text_ops

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]
    docs = []
    for i in range(200):
        h = int(hashlib.md5(str(i).encode()).hexdigest(), 16)
        lines = []
        for j in range(3 + h % 4):
            n = 3 + (h >> (4 * j)) % 8
            ws = [words[(h >> k) % 10] for k in range(n)]
            ln = " ".join(ws)
            mode = (h >> (3 * j)) % 5
            if mode == 0:
                ln += "."
            elif mode == 1:
                ln += "?"
            elif mode == 2:
                ln += " javascript required."
            elif mode == 3:
                ln += " lorem ipsum text."
            # mode 4: no terminal punctuation
            if (h >> j) % 11 == 0:
                ln += " {"
            lines.append(ln)
        docs.append((i, "\n".join(lines)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in text_ops.c4_filter(df, min_sentences=2).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    sql = r"""
    WITH rebuilt AS (
      SELECT doc_id, array_to_string(list_filter(
        string_split_regex(text, '\r?\n'),
        ln -> regexp_matches(ln, '[.!?"”’'']\s*$')
              AND length(list_filter(string_split_regex(ln, '\s+'),
                                     w -> w != '')) >= 5
              AND NOT contains(lower(ln), 'javascript')), chr(10))
        AS text
      FROM docs)
    SELECT doc_id, text FROM rebuilt
    WHERE length(regexp_extract_all(text, '[.!?]+')) >= 2
      AND NOT contains(lower(text), 'lorem ipsum')
      AND NOT contains(text, '{')
    """
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
    assert len(got) > 10  # the fixture actually exercises the rules


def test_cli_span_dedup(spark, tmp_path, capsys):
    """kiji-mr span-dedup end to end: the repeated span's later
    occurrence loses its sentences, stats JSON reports the drops."""
    import json as _json

    from kiji_mapreduce_spark import cli

    shared = "One common first. Two common second. Three common third."
    docs = spark.createDataFrame(
        [(0, shared + " Unique tail of the first document."),
         (1, shared + " Another tail entirely.")],
        "doc_id long, text string")
    docs.write.parquet(f"{tmp_path}/docs")

    rc = cli.main(["span-dedup", "--input", f"{tmp_path}/docs",
                   "--output", f"{tmp_path}/deduped"])
    assert rc == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 2 and stats["n_sentences_dropped"] == 3
    got = {r.doc_id: r.text for r in
           spark.read.parquet(f"{tmp_path}/deduped").collect()}
    assert got[1] == "Another tail entirely."
    assert shared.split(". ")[0] in got[0]
