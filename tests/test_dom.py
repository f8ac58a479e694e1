"""DOM + selector engine unit tests, pinned to the reference's lxml-backend
semantics (`/root/reference/dude/optional/lxml_scraper.py:181-199`) on the
reference's own fixture page (`examples/dude.html`)."""

import pytest

from dude_spark.dom import css_select, parse_html, select, xpath_select


def test_parse_roots(dude_html):
    root = parse_html(dude_html)
    assert root.tag == "html"
    assert root.get("lang") == "en"


def test_css_groups_and_members(dude_html):
    root = parse_html(dude_html)
    groups = css_select(root, ".custom-group")
    assert len(groups) == 3
    titles = [css_select(g, ".title") for g in groups]
    assert [t[0].text_content() for t in [x for x in titles]] == [
        "Title 1", "Title 2", "Title 3",
    ]
    # group 2 (dude.html) has no description
    descs = [len(css_select(g, ".description")) for g in groups]
    assert descs == [1, 0, 1]


def test_css_compound_and_child(dude_html):
    root = parse_html(dude_html)
    assert [e.get("href") for e in css_select(root, "a.url")] == [
        "url-1.html", "url-2.html", "url-3.html",
    ]
    assert len(css_select(root, "div > a")) == 5
    assert [e.tag for e in css_select(root, ":root")] == ["html"]


def test_css_descendant_or_self_scope(dude_html):
    # lxml cssselect on an element uses descendant-or-self
    root = parse_html(dude_html)
    g = css_select(root, ".custom-group")[0]
    assert g in css_select(g, ".custom-group")


def test_xpath_subset(dude_html):
    root = parse_html(dude_html)
    titles = xpath_select(root, './/p[contains(@class,"title")]')
    assert [t.text_content() for t in titles] == ["Title 1", "Title 2", "Title 3"]
    hrefs = xpath_select(root, ".//a/@href")
    assert hrefs[:3] == ["url-1.html", "url-2.html", "url-3.html"]
    texts = xpath_select(root, ".//p/text()")
    assert "Title 1" in texts


def test_xpath_position_and_eq():
    root = parse_html("<div><p id='a'>x</p><p id='b'>y</p></div>")
    assert [e.get("id") for e in xpath_select(root, ".//p[2]")] == ["b"]
    assert [e.get("id") for e in xpath_select(root, './/p[@id="a"]')] == ["a"]


def test_text_selector_first_text_node_semantics(dude_html):
    # lxml: .//*[contains(text(), s)] — first direct text node
    root = parse_html(dude_html)
    els = select(root, "text", "Title")
    assert [e.tag for e in els] == ["p", "p", "p"]
    assert select(root, "text", "no-such-text") == []


def test_regex_selector_case_insensitive(dude_html):
    root = parse_html(dude_html)
    els = select(root, "regex", r"title\s\d")  # lowercase → 'i' flag applies
    assert [e.first_text() for e in els] == ["Title 1", "Title 2", "Title 3"]


def test_unsupported_selectors_raise():
    root = parse_html("<div></div>")
    with pytest.raises(ValueError):
        css_select(root, "div:nth-child(2)")
    with pytest.raises(ValueError):
        xpath_select(root, "following-sibling::div")


def test_void_and_misnested():
    root = parse_html("<body><br><img src='x'><p>one<p>two</body>")
    assert root.tag == "body"
    ps = css_select(root, "p")
    # html.parser keeps unclosed <p> nested; both reachable
    assert len(ps) == 2


def test_text_content_document_order():
    root = parse_html("<div>a<span>b<i>c</i></span>d</div>")
    assert root.text_content() == "abcd"


def test_getitem_attr_and_child():
    root = parse_html("<div><a href='h'>x</a><b/></div>")
    a = css_select(root, "a")[0]
    assert a["href"] == "h"
    assert root[0].tag == "a"


def test_uppercase_attr_name_prefilter():
    # lazy-attr pre-filter must not reject uppercase attribute names
    # (attrib dict lowercases names; the raw slice keeps original case)
    root = parse_html('<html><body><p DATA-FOO="1">x</p></body></html>')
    assert len(css_select(root, "[data-foo]")) == 1
    assert len(css_select(root, '[data-foo="1"]')) == 1


def test_entity_encoded_attr_value():
    root = parse_html('<html><body><a class="a&amp;b">x</a></body></html>')
    assert len(css_select(root, "[class=a&b]")) == 1


def test_selector_name_case_insensitive():
    root = parse_html("<div><P>x</P></div>")
    assert len(css_select(root, "p")) == 1
    assert len(css_select(root, "P")) == 1


def test_unquoted_attr_trailing_slash():
    # '<a href=foo/>' — the '/' is part of the unquoted value (HTML5 /
    # html.parser), NOT a self-close: anchor stays open, text preserved
    root = parse_html("<html><body><a href=foo/>t</a></body></html>")
    a = css_select(root, "a")[0]
    assert a.get("href") == "foo/"
    assert a.text_content() == "t"
    # quoted + XML-style self-close still closes
    root2 = parse_html('<html><body><span id="s"/><b>t</b></body></html>')
    s = css_select(root2, "#s")[0]
    assert s.children == []
