"""Flagship web-page pipeline: generator determinism, corrupt-variant
detection (FIXTURES.md F0 negative cases), end-to-end summary."""

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.generate import (
    corrupt_webpages,
    page_text,
    page_texts,
    ray_webpages,
    webpage_table,
)
from patito_ray.pipelines.webpage import (
    WebPage,
    extract_text_from_html,
    text_invariant_counts,
    validate_webpages,
)


def test_generator_deterministic():
    a = webpage_table(500)
    b = webpage_table(500)
    assert a.equals(b)
    # byte-identical text per url across offsets/batches
    c = webpage_table(10, offset=490)
    assert c.column("text").to_pylist() == a.slice(490, 10).column("text").to_pylist()


def test_page_text_oracle_matches_vectorized():
    idx = np.arange(0, 3000, 13)
    assert page_texts(idx) == [page_text(int(i)) for i in idx]


def test_extraction_invariant_holds_on_clean_data():
    t = webpage_table(300)
    c = text_invariant_counts(t)
    assert c["text_mismatches"] == 0
    assert c["text_checked"] > 250  # ~5% html nulls skipped


def test_extraction_invariant_catches_corruption():
    t = webpage_table(50)
    d = t.to_pydict()
    d["text"][3] = d["text"][3] + "TAMPERED"
    t2 = pa.table({k: pa.array(v, type=t.schema.field(k).type) for k, v in d.items()})
    c = text_invariant_counts(t2)
    assert c["text_mismatches"] == (1 if d["html"][3] is not None else 0)


def test_generator_marks_real_markup_subset():
    """~2% of synthetic pages carry real nested/entity markup so the
    flagship invariant's parser branch does genuine work; their
    parser-extracted text stays byte-identical to the text column, and
    a tampered marked row is still caught (through the parser path)."""
    from patito_ray.functions.htmltext import extract_html_text

    t = webpage_table(3000)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    marked = [
        k
        for k, h in enumerate(htmls)
        if h is not None and not h.startswith(b"<html><body>Document")
    ]
    assert 20 <= len(marked) <= 120  # ~2% of 3000
    for k in marked[:40]:
        assert b"<script>" in htmls[k] and b"&#" in htmls[k]
        assert extract_html_text(htmls[k]) == texts[k]
    c = text_invariant_counts(t)
    assert c["text_mismatches"] == 0

    d = t.to_pydict()
    d["text"][marked[0]] = d["text"][marked[0]] + "X"
    t2 = pa.table(
        {k: pa.array(v, type=t.schema.field(k).type) for k, v in d.items()}
    )
    assert text_invariant_counts(t2)["text_mismatches"] == 1


def test_extract_text_roundtrip():
    t = webpage_table(100)
    mask = [h is not None for h in t.column("html").to_pylist()]
    extracted = extract_text_from_html(t.column("html"))
    for ok, ext, txt in zip(mask, extracted.to_pylist(), t.column("text").to_pylist()):
        if ok:
            assert ext == txt


def test_clean_corpus_validates(ray_session):
    ds = ray_webpages(3000, blocks=4)
    summary = validate_webpages(ds)
    assert summary["ok"] is True
    assert summary["row_count"] == 3000
    assert summary["dup_urls"] == 0
    assert summary["text_mismatches"] == 0


def test_corrupt_variants_detected(ray_session):
    import ray.data as rd

    t = corrupt_webpages(
        webpage_table(2000), duplicate_urls=5, bad_lang=3, null_text=2, bad_url=4
    )
    ds = rd.from_arrow(t)
    summary = validate_webpages(ds)
    assert summary["ok"] is False
    assert summary["dup_urls"] == 10  # 5 pairs -> 10 participating rows
    assert summary["bad_lang"] == 1  # one invalid value: "zz"
    assert summary["null_text"] == 2
    assert summary["url_bound_fails"] == 4  # ftp:// urls fail the regex


def test_hot_domain_skew_unaffected(ray_session):
    # 10% of rows share one domain; keys stay unique -> no dups, and the
    # hashed bucket exchange must not mis-count under value skew
    ds = ray_webpages(5000, blocks=8)
    summary = validate_webpages(ds, check_text_invariant=False)
    assert summary["dup_urls"] == 0


def test_webpage_model_matches_generated_schema():
    t = webpage_table(10)
    spec = WebPage._spec()
    for name in spec.column_names:
        assert name in t.column_names


def test_extreme_hot_key_duplicates(ray_session):
    """Half the corpus duplicates ONE url: the blob exchange's skew
    guard (per-batch value_counts collapse) must stay exact."""
    import numpy as np
    import ray.data as rd

    n = 40_000
    t = webpage_table(n)
    d = t.to_pydict()
    hot = d["url"][0]
    for i in range(0, n, 2):
        d["url"][i] = hot
    t2 = pa.table({k: pa.array(v, type=t.schema.field(k).type) for k, v in d.items()})
    ds = rd.from_arrow(t2).repartition(8)
    from patito_ray.validation.engine import duplicate_count_distributed

    # 20_000 copies of hot + the original occurrence makes one dup group
    from patito_ray.validation.checks import local_duplicate_count

    expected = local_duplicate_count(t2.column("url"))
    assert duplicate_count_distributed(ds, "url") == expected
    assert expected >= n // 2


def test_extract_real_html():
    """Nested/entity-laden HTML goes through the stdlib parser path:
    entities decode, script/style/noscript drop, whitespace collapses."""
    from patito_ray.functions.htmltext import extract_html_text

    doc = (
        "<html><head><title>T&amp;Co</title>"
        "<style>body { color: red; }</style></head>"
        "<body><h1>Hello &amp; welcome</h1>\n"
        "<script>var x = '<p>not text</p>';</script>"
        "<div><p>nested <b>bold</b> text</p>\n\n  spaced</div>"
        "<noscript>skip me</noscript>"
        "&#x27;quoted&#x27;</body></html>"
    )
    assert (
        extract_html_text(doc)
        == "T&Co Hello & welcome nested bold text spaced 'quoted'"
    )
    assert extract_html_text(None) is None
    assert extract_html_text(b"<p>from bytes</p>") == "from bytes"


def test_extract_mixed_batch_routes_correctly():
    """One batch mixing wrapper rows (vectorized byte-exact path) and
    real-markup rows (parser path), plus a null."""
    from patito_ray.pipelines.webpage import extract_text_from_html

    html = pa.array(
        [
            b"<html><body>plain  inner text</body></html>",  # fast: verbatim
            b"<html><body>has <b>tags</b> inside</body></html>",  # parser
            None,
            b"<html><body>a &amp; b</body></html>",  # entity -> parser
        ],
        type=pa.binary(),
    )
    out = extract_text_from_html(html).to_pylist()
    assert out[0] == "plain  inner text"  # byte-exact, double space kept
    assert out[1] == "has tags inside"
    assert out[2] is None
    assert out[3] == "a & b"


def test_extract_text_stage_dataset(ray_session):
    import ray.data as rd

    from patito_ray.functions.htmltext import extract_text_stage

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array(
                [
                    b"<html><body>wrapped</body></html>",
                    b"<div>real <i>markup</i>&nbsp;here</div>",
                ],
                type=pa.binary(),
            ),
        }
    )
    out = extract_text_stage(rd.from_arrow(t)).take_all()
    got = {r["doc_id"]: r["extracted_text"] for r in out}
    assert got[1] == "wrapped"
    # NBSP survives (it is not ASCII whitespace); tag-boundary chunks
    # join with one ASCII space
    assert got[2] == "real markup \xa0here"
    # actor-pool form produces the same rows
    out2 = extract_text_stage(rd.from_arrow(t), concurrency=2).take_all()
    assert {r["doc_id"]: r["extracted_text"] for r in out2} == got


def test_extract_malformed_utf8_bytes():
    """A single non-UTF-8 byte sequence in a binary html column must not
    kill the batch (pc.cast validates UTF-8 and raises); the lenient
    per-row decode routes it through errors='replace' (round-3 review
    regression)."""
    from patito_ray.functions.htmltext import ExtractHtmlText

    stage = ExtractHtmlText(html_col="html", out_col="txt")
    batch = pa.table(
        {
            "html": pa.array(
                [
                    b"<html><body>plain ok</body></html>",
                    b"<p>caf\xe9 latin-1</p>",  # invalid UTF-8
                    None,
                    b"<html><body>second ok</body></html>",
                ],
                type=pa.binary(),
            )
        }
    )
    out = stage(batch).column("txt").to_pylist()
    assert out[0] == "plain ok"
    assert out[1] == "caf� latin-1"
    assert out[2] is None
    assert out[3] == "second ok"


def test_extract_slow_rows_only_parse_marked_up():
    """Mixed batch: fast wrapper rows stay byte-exact from the Arrow
    kernel path while only marked-up rows go through the parser, and
    nulls survive (scatter via replace_with_mask)."""
    from patito_ray.functions.htmltext import ExtractHtmlText

    stage = ExtractHtmlText(html_col="html", out_col="txt")
    batch = pa.table(
        {
            "html": pa.array(
                [
                    "<html><body>  raw  spacing kept </body></html>",
                    "<div><script>x=1</script><p>A &amp; B</p></div>",
                    None,
                    "<html><body>w2</body></html>",
                    "<b>bold</b> tail",
                ]
            )
        }
    )
    out = stage(batch).column("txt").to_pylist()
    assert out[0] == "  raw  spacing kept "  # fast path: byte-exact inner
    assert out[1] == "A & B"
    assert out[2] is None
    assert out[3] == "w2"
    assert out[4] == "bold tail"
