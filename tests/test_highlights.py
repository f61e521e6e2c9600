"""Q3 multi-fragment highlighter semantics (LuceneBackedQueryParser.java:56-74
analog): best-N fragments, markup, separator, preview cap."""

import re

from miru_spark.operators import fulltext as ft


def test_ft_highlights_shape(spark, sf_dir):
    pdf = ft.ft_highlights(spark, sf_dir).toPandas()
    assert len(pdf) == 10
    assert list(pdf.columns) == ["doc_id", "rank", "highlights"]
    assert pdf["rank"].tolist() == list(range(1, 11))
    non_empty = pdf[pdf["highlights"] != ""]
    assert len(non_empty) > 0
    for h in non_empty["highlights"]:
        frags = h.split(" ... ")
        assert 1 <= len(frags) <= ft.MAX_FRAGMENTS
        # every chosen fragment contains at least one marked query term
        for f in frags:
            assert re.search(r"<b>(merge|sort)</b>", f), f
        # fragments are score-desc: marked-term counts never increase
        counts = [len(re.findall(r"<b>", f)) for f in frags]
        assert counts == sorted(counts, reverse=True)
        # fragment text (sans markup) is at most FRAGMENT_SIZE chars
        for f in frags:
            assert len(re.sub(r"</?b>", "", f)) <= ft.FRAGMENT_SIZE
