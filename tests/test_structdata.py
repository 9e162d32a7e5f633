"""JSON-LD structured-data extraction tests."""

import random

from sparktika.kernels.structdata import extract_jsonld
from sparktika.synth import build_jsonld_page


def test_article_and_graph_org():
    r = extract_jsonld(build_jsonld_page(0).decode())
    types = [e["type"] for e in r.entities]
    assert types == ["Article", "Organization"]
    art = r.entities[0]
    assert art["headline"] == "Post 0 headline"
    assert art["author"] == "Writer 0"      # nested Person flattened
    assert r.n_bad_blocks == 1               # the planted broken block


def test_top_level_array_and_type_list():
    html = ('<script type="application/ld+json">'
            '[{"@type":["NewsArticle","Article"],"headline":"h1"},'
            '{"@type":"Person","name":"n1"}]</script>')
    r = extract_jsonld(html)
    assert [e["type"] for e in r.entities] == ["NewsArticle", "Person"]


def test_non_ld_scripts_ignored():
    html = ('<script>var x = {"@type":"Fake"};</script>'
            '<script type="text/javascript">y()</script>'
            '<SCRIPT TYPE="APPLICATION/LD+JSON">'
            '{"@type":"Thing","name":"upper"}</SCRIPT>')
    r = extract_jsonld(html)
    assert r.n_blocks == 1
    assert r.entities == [{"type": "Thing", "name": "upper"}]


def test_block_cap_and_unterminated():
    html = "".join('<script type="application/ld+json">'
                   f'{{"@type":"T{i}"}}</script>' for i in range(100))
    r = extract_jsonld(html)
    assert len(r.entities) <= 64
    # unterminated block: scanner stops cleanly
    r2 = extract_jsonld('<script type="application/ld+json">{"@type":"A"')
    assert r2.entities == []


def test_fuzz_never_raises():
    rnd = random.Random(13)
    base = bytearray(build_jsonld_page(3))
    for _ in range(80):
        i = rnd.randrange(len(base))
        orig = base[i]
        base[i] = rnd.randrange(256)
        extract_jsonld(bytes(base).decode("latin-1"))
        base[i] = orig


def test_deeply_nested_block_counts_as_bad_not_raises():
    """RecursionError from json.loads or _flatten must be contained as a
    bad block (r7 advice), with any partial entities rolled back."""
    from sparktika.kernels.structdata import extract_jsonld

    deep = "[" * 200000 + "]" * 200000
    html = ('<script type="application/ld+json">'
            '{"@type":"Article","name":"ok"}</script>'
            f'<script type="application/ld+json">{deep}</script>')
    res = extract_jsonld(html)
    assert res.n_blocks == 2 and res.n_bad_blocks == 1
    assert [e["type"] for e in res.entities] == ["Article"]
