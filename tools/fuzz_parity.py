#!/usr/bin/env python3
"""Differential fuzzing: random small HTML documents → byte-compare my
extraction pipeline against the python2 reference oracle.

Usage: python tools/fuzz_parity.py [n_cases] [seed]
Writes mismatches to tests/fixtures/fuzz_failures.jsonl (html + field).
"""

from __future__ import annotations

import base64
import json
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAGS = [
    "p", "div", "span", "b", "i", "em", "strong", "table", "tr", "td",
    "ul", "ol", "li", "h1", "h2", "h3", "a", "pre", "blockquote",
    "form", "img", "br", "hr", "script", "textarea", "font", "center",
    "dl", "dd", "dt", "iframe", "object", "input", "noscript",
]
WORDS = "alpha beta gamma delta epsilon zeta comma, stop. dash-word".split()
ATTRS = [
    ("class", ["content", "sidebar", "nav", "article text", "comment", "a b c"]),
    ("id", ["main", "footer", "body-main", "x1"]),
    ("href", ["/a.html", "http://x.com/b", "#frag", "rel.html", ""]),
    ("style", ["color:red", "display:none"]),
    ("width", ["600", "abc", "700px"]),
    ("title", ["it's", 'say "hi"', "a&b", "&#65;&amp;"]),
]
ENTITIES = ["&amp;", "&nbsp;", "&#160;", "&#xA0;", "&unknown;", "&amp", "&#65", "&", "<", ">"]


def rand_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(1, 12)):
        r = rng.random()
        if r < 0.75:
            parts.append(rng.choice(WORDS))
        elif r < 0.85:
            parts.append(rng.choice(ENTITIES))
        else:
            parts.append(rng.choice([" ", "  ", "\n", "\t", ""]))
    return " ".join(parts)


def rand_elem(rng: random.Random, depth: int) -> str:
    tag = rng.choice(TAGS)
    attrs = ""
    for _ in range(rng.randrange(0, 3)):
        k, vals = rng.choice(ATTRS)
        v = rng.choice(vals)
        q = rng.choice(['"', "'"])
        attrs += f" {k}={q}{v}{q}" if rng.random() < 0.9 else f" {k}={v}"
    if rng.random() < 0.06:
        # duplicate attribute keys (order + dup handling quirks)
        attrs += ' class="dup1" class="dup2"'
    if rng.random() < 0.04:
        attrs += " checked"  # bare attribute
    open_tag = f"<{tag}{attrs}>"
    if tag in ("br", "hr", "img", "input"):
        return open_tag
    inner = rand_content(rng, depth + 1)
    # sometimes leave unclosed / double-close / stray close
    r = rng.random()
    if r < 0.7:
        return f"{open_tag}{inner}</{tag}>"
    if r < 0.8:
        return f"{open_tag}{inner}"
    if r < 0.9:
        return f"{open_tag}{inner}</{tag}></{tag}>"
    return f"{open_tag}{inner}</{rng.choice(TAGS)}>"


def rand_content(rng: random.Random, depth: int) -> str:
    parts = []
    for _ in range(rng.randrange(1, 5 if depth < 4 else 2)):
        if depth < 4 and rng.random() < 0.5:
            parts.append(rand_elem(rng, depth))
        else:
            parts.append(rand_text(rng))
        if rng.random() < 0.08:
            parts.append(rng.choice([
                "<!-- comment -->", "<!-- unterminated", "<!DOCTYPE html>",
                "<![CDATA[cd <x> ata]]>", "<?pi data?>", "</>", "<>",
                "<!ENTITY x = 'y'>", "<!weird a=b>",
                "<table><tr><td><table><tr><td>deep</td></tr></table>",
                "<dl><dt>t<dd>d<dt>t2", "<ul><li><ul><li>n",
                "<!DOCTYPE html [<!ENTITY foo 'bar'>]>",
            ]))
    return "".join(parts)


def gen_doc(rng: random.Random) -> tuple[bytes, dict]:
    title = " ".join(rng.choice(WORDS) for _ in range(4))
    body = rand_content(rng, 0)
    meta = ""
    r = rng.random()
    if r < 0.15:
        cs = rng.choice(["utf-8", "windows-1252", "iso-8859-1", "bogus-enc"])
        meta = f'<meta http-equiv="Content-Type" content="text/html; charset={cs}">'
    elif r < 0.2:
        meta = '<meta http-equiv="Content-Type" content="text/html; charset&#61;windows-1252">'
    if rng.random() < 0.1:
        body = (
            "<script>var a = '<div>'; if (x < 3 && y > 1) {}</script>" + body
        )
    head = (
        f"<head><title>{title}</title>{meta}</head>"
        if rng.random() < 0.8
        else meta
    )
    shell = rng.random()
    if shell < 0.7:
        doc = f"<html>{head}<body>{body}</body></html>"
    elif shell < 0.85:
        doc = f"<html>{head}{body}</html>"
    else:
        doc = body

    enc = rng.random()
    if enc < 0.7:
        raw = doc.encode("utf-8")
    elif enc < 0.8:
        raw = b"\xef\xbb\xbf" + doc.encode("utf-8")
    elif enc < 0.88:
        # latin-1 with smart-quote bytes sprinkled in
        raw = doc.encode("latin-1", "replace")
        if rng.random() < 0.7:
            raw = raw.replace(b"alpha", b"al\x93ph\x94a\x97")
    elif enc < 0.94:
        raw = b"\xff\xfe" + doc.encode("utf-16-le")
    else:
        raw = doc.encode("utf-8") + b"\xff\x00\x9d"  # trailing garbage bytes

    settings = {}
    if rng.random() < 0.25:
        settings["footnote_links"] = True
        if rng.random() < 0.5:
            settings["readable_footnote_links"] = True
            settings["service_uri"] = "http://r.example.com/g?u=%s"
    if rng.random() < 0.1:
        settings["read_margin"] = rng.choice(
            ["margin-x-narrow", "margin-narrow", "margin-wide", "margin-x-wide"]
        )
    return raw, settings


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(seed)
    cases = []
    for i in range(n):
        html, settings = gen_doc(rng)
        url = f"http://fuzz.example.com/f/{i}.html" if rng.random() < 0.8 else None
        cases.append((i, html, url, settings))

    reqs = "".join(
        json.dumps(
            {
                "id": i,
                "html_b64": base64.b64encode(h).decode(),
                "url": u,
                "settings": s,
                "mode": "extract",
            }
        )
        + "\n"
        for i, h, u, s in cases
    )
    env = dict(os.environ)
    env["PYENV_VERSION"] = "2.7.18"
    proc = subprocess.run(
        ["python2", os.path.join(REPO, "tools", "oracle_runner.py")],
        input=reqs.encode(),
        capture_output=True,
        env=env,
    )
    oracle = {
        json.loads(line)["id"]: json.loads(line)
        for line in proc.stdout.decode().splitlines()
    }

    from readability_py_spark.core.arc90 import extract_document

    mismatches = []
    n_oracle_err = 0
    n_both_err = 0
    for i, html, url, settings in cases:
        o = oracle[i]
        try:
            mine = extract_document(
                html, url=url, include_render_extras=True, **settings
            )
            my_err = None
        except Exception as e:
            mine = None
            my_err = f"{type(e).__name__}: {e}"
        if not o["ok"]:
            n_oracle_err += 1
            if mine is not None:
                mismatches.append((i, html, url, "oracle-errored-mine-didnt", o["error"], my_err))
            else:
                n_both_err += 1
            continue
        if mine is None:
            mismatches.append((i, html, url, "mine-errored", o.get("error"), my_err))
            continue
        for field, key in [
            ("title", "title_b64"),
            ("article_text", "text_b64"),
            ("article_html", "body_b64"),
            ("full_html", "full_b64"),
            ("pretty_html", "pretty_b64"),
            ("docrender_html", "docrender_b64"),
        ]:
            if mine[field].encode("utf-8") != base64.b64decode(o[key]):
                mismatches.append((i, html, url, field, None, None))
                break

    print(f"{n} cases: {len(mismatches)} mismatches, "
          f"{n_oracle_err} oracle errors ({n_both_err} matched by mine)")
    if mismatches:
        out = os.path.join(REPO, "tests", "fixtures", "fuzz_failures.jsonl")
        with open(out, "a") as fh:
            for i, html, url, field, oerr, merr in mismatches:
                fh.write(
                    json.dumps(
                        {
                            "seed": seed,
                            "case": i,
                            "url": url,
                            "field": field,
                            "oracle_error": oerr,
                            "my_error": merr,
                            "html_b64": base64.b64encode(html).decode(),
                        }
                    )
                    + "\n"
                )
        print(f"wrote failures to {out}")
        for m in mismatches[:5]:
            print("  case", m[0], m[3], (m[4] or "")[:80], (m[5] or "")[:80])


if __name__ == "__main__":
    main()
