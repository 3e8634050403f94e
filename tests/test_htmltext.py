"""HTML text-extraction tests (operators/htmltext.py) — edge cases the
synthesized oracle page doesn't exercise."""

from __future__ import annotations

from dataingestion_pt_ms_spark.operators.htmltext import extract_text


def test_script_and_style_subtrees_dropped():
    html = "<p>keep</p><script>var x = '<p>fake</p>';</script><style>p{}</style><p>also</p>"
    assert extract_text(html) == "keep\nalso"


def test_nested_skip_depth():
    # script inside script text can't nest in real HTML, but unbalanced
    # style-in-script strings must not corrupt the depth counter
    html = "<div>a</div><script>doc.write('<style>');</script><div>b</div>"
    assert extract_text(html) == "a\nb"


def test_entities_decode():
    assert extract_text("<p>AT&amp;T &lt;x&gt; &quot;q&quot; &#65; &#x42;</p>") == (
        'AT&T <x> "q" A B'
    )


def test_inline_tags_do_not_break_lines():
    html = "<p>one <b>two</b> <span>three</span> four</p>"
    assert extract_text(html) == "one two three four"


def test_block_tags_break_lines():
    html = "<h1>t</h1><p>a</p><div>b<br>c</div><li>d</li>"
    assert extract_text(html) == "t\na\nb\nc\nd"


def test_comments_and_whitespace_collapse():
    html = "<p>  a   b\n\tc  </p><!-- <p>no</p> --><p>   </p><p>d</p>"
    assert extract_text(html) == "a b c\nd"


def test_unclosed_and_attribute_edge_cases():
    # attribute values containing '>' and unclosed block tags
    html = '<div title="a > b">x<p>y'
    assert extract_text(html) == "x\ny"


def test_empty_and_tagless():
    assert extract_text("") == ""
    assert extract_text("just text") == "just text"
    assert extract_text("<script>only</script>") == ""


def test_web_curation_boilerplate_removed(spark):
    """The pipeline's df-based boilerplate stage must drop the shared
    chrome lines (entity fragment + footer) and the script must never
    leak; survivors are pure document text."""
    from dataingestion_pt_ms_spark.queries.curation import pipeline_web_curation

    rows = pipeline_web_curation(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.n_kept > 0 for r in rows)
    # every survivor averages >= the gate, and langs are the corpus five
    assert all(r.avg_words >= 20 for r in rows)
    assert {r.lang for r in rows} <= {"en", "de", "es", "fr", "zh"}
