"""Byte-identity gate: every fixture's extraction must equal the
python2 reference oracle's output byte-for-byte (BASELINE.json
input_hint: 'byte-identical extracted text per url')."""

from __future__ import annotations

import base64
import json
import os

import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "fixtures", "goldens.jsonl")


def _load():
    if not os.path.exists(GOLDENS):
        return []
    with open(GOLDENS) as fh:
        return [json.loads(line) for line in fh if line.strip()]


CASES = _load()


@pytest.mark.skipif(not CASES, reason="goldens not generated")
@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_byte_identity(case):
    from readability_py_spark.core.arc90 import extract_document

    html = base64.b64decode(case["html_b64"])
    if not case["ok"]:
        pytest.skip(f"oracle errored: {case.get('error')}")
    result = extract_document(
        html, url=case["url"], include_render_extras=True, **case["settings"]
    )
    assert result["title"].encode("utf-8") == base64.b64decode(
        case["title_b64"]
    ), "title mismatch"
    assert result["article_text"].encode("utf-8") == base64.b64decode(
        case["text_b64"]
    ), "article_text mismatch"
    assert result["article_html"].encode("utf-8") == base64.b64decode(
        case["body_b64"]
    ), "article_html mismatch"
    got_footnotes = [
        [
            base64.b64encode(h.encode("utf-8")).decode(),
            base64.b64encode(t.encode("utf-8")).decode(),
        ]
        for h, t in result["footnotes"]
    ]
    assert got_footnotes == case["footnotes"], "footnotes mismatch"
    assert result["full_html"].encode("utf-8") == base64.b64decode(
        case["full_b64"]
    ), "full_html mismatch"
    if "pretty_b64" in case:
        assert result["pretty_html"].encode("utf-8") == base64.b64decode(
            case["pretty_b64"]
        ), "pretty_html mismatch"
    if "docrender_b64" in case:
        assert result["docrender_html"].encode("utf-8") == base64.b64decode(
            case["docrender_b64"]
        ), "get_doc round-trip mismatch"


def test_corpus_covers_all_families():
    families = {c["family"] for c in CASES}
    assert len(families) >= 15, families
