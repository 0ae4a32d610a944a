"""Deterministic fixture corpus (FIXTURES.md §3) + pages-table synthesis.

Every fixture family pins a slice of reference behavior; the golden
outputs come from executing the python2 reference itself
(tools/make_goldens.py). All generation is seeded — no external data.

Families deliberately avoid exact score ties in title-contest and
pagination scoring: the reference breaks those ties by CPython-2 dict
iteration order (readability.py:565-568, 1171-1176), which is not a
behavior any reimplementation can or should chase.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

WORDS = (
    "the quick brown fox jumps over lazy dog while many readers enjoy "
    "long articles about technology science culture history travel food "
    "economics software parsing data systems design networks languages "
    "theory practice evidence analysis discovery method pattern detail"
).split()


@dataclass
class Fixture:
    fixture_id: str
    family: str
    url: str | None
    html: bytes
    settings: dict = field(default_factory=dict)


def _sentence(rng: random.Random, n_words: int, commas: int = 0) -> str:
    words = [rng.choice(WORDS) for _ in range(n_words)]
    for _ in range(commas):
        pos = rng.randrange(1, max(2, len(words) - 1))
        if not words[pos].endswith(","):
            words[pos] += ","
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."

def _para(rng: random.Random, n_sent: int = 3, wps: int = 18, commas: int = 2) -> str:
    return " ".join(_sentence(rng, wps, commas) for _ in range(n_sent))


def _nav(rng: random.Random) -> str:
    return (
        '<div id="nav"><a href="/">Home</a> <a href="/about.html">About</a> '
        '<a href="/contact.html">Contact</a></div>'
    )


def _sidebar(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/tag/{rng.choice(WORDS)}.html">{rng.choice(WORDS)}</a></li>'
        for _ in range(4)
    )
    return f'<div class="sidebar"><ul>{items}</ul></div>'


def _footer(rng: random.Random) -> str:
    return '<div id="footer"><p>Copyright 2026 example. All rights reserved.</p></div>'


def _page(title: str, body: str, head_extra: str = "") -> bytes:
    return (
        f"<html><head><title>{title}</title>{head_extra}</head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")


# -- families ----------------------------------------------------------------

def gen_simple_article(rng, i):
    title = f"Article {i} about {rng.choice(WORDS)} - Example Site"
    paras = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(4 + i % 3))
    body = (
        _nav(rng)
        + f'<div class="article-content"><h2>Article {i} heading words</h2>{paras}</div>'
        + _sidebar(rng)
        + _footer(rng)
    )
    return _page(title, body), f"http://ex{i % 5:02d}.example.com/posts/article-{i}.html", {}


def gen_div_soup(rng, i):
    inner = "".join(
        f"<div>{_para(rng, 2, 22, 3)}</div>" for _ in range(3)
    )
    mixed = (
        f"<div>bare leading text {_sentence(rng, 12, 2)}"
        f"<p>{_para(rng, 2, 18, 2)}</p>tail text {_sentence(rng, 10, 1)}</div>"
    )
    body = _nav(rng) + f"<div id='main'>{inner}{mixed}</div>" + _footer(rng)
    return _page(f"Div soup {i}", body), f"http://divs.example.com/d/{i}.html", {}


def gen_table_layout(rng, i):
    cells = "".join(
        f"<tr><td>{_para(rng, 2, 20, 3)}</td></tr>" for _ in range(3)
    )
    junk_table = (
        "<table class='layout'><tr><td><img src='a.gif'><img src='b.gif'>"
        "<input type='text'></td></tr></table>"
    )
    list_block = "<ul>" + "".join(f"<li>{_sentence(rng, 4)}</li>" for _ in range(5)) + "</ul>"
    body = (
        _nav(rng)
        + f"<table id='content'>{cells}</table>"
        + junk_table
        + list_block
        + _footer(rng)
    )
    return _page(f"Table layout {i}", body), f"http://tables.example.com/t/{i}.html", {}


def gen_link_farm(rng, i):
    farm = "".join(
        f'<p><a href="/l/{k}.html">{_sentence(rng, 8)}</a></p>' for k in range(6)
    )
    art = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(3))
    body = (
        _nav(rng)
        + f'<div class="links">{farm}</div>'
        + f'<div class="story-body">{art}<p><a href="/more-{i}.html">related link here</a> '
        + f"{_sentence(rng, 15, 2)}</p></div>"
        + _footer(rng)
    )
    return _page(f"Link farm {i}", body), f"http://links.example.com/f/{i}.html", {}


def gen_short_content(rng, i):
    # total text < 250 chars → retry cascade (readability.py:762-777)
    body = (
        _nav(rng)
        + f'<div class="post"><p>{_sentence(rng, 8 + i % 4, 1)}</p></div>'
        + _footer(rng)
    )
    return _page(f"Short {i}", body), f"http://short.example.com/s/{i}.html", {}


def gen_title_contest(rng, i):
    # h1/h2 with distinct word overlaps vs <title>; no score ties
    title = f"grand unified {rng.choice(WORDS)} theory explained fully {i}"
    h1 = f"<h1 id='page-title'>grand unified theory explained</h1>"
    h2a = f"<h2 class='title-block'>unrelated heading entirely {rng.choice(WORDS)}</h2>"
    h2b = f"<h2>grand theory explained fully {i}</h2>"
    art = "".join(f"<p>{_para(rng, 3, 18, 3)}</p>" for _ in range(4))
    body = _nav(rng) + h1 + f"<div class='content'>{h2a}{h2b}{art}</div>" + _footer(rng)
    return _page(title, body), f"http://titles.example.com/a/{i}.html", {}


def gen_no_body(rng, i):
    html = (
        f"<html><head><title>No body {i}</title></head>"
        f"<p>{_para(rng, 3, 20, 3)}</p><p>{_para(rng, 3, 20, 2)}</p></html>"
    ).encode("utf-8")
    return html, f"http://nobody.example.com/n/{i}.html", {}


def gen_multi_body(rng, i):
    html = (
        f"<html><head><title>Multi body {i}</title></head>"
        f"<body><p>{_para(rng, 3, 20, 3)}</p></body>"
        f"<body><p>{_para(rng, 3, 20, 2)}</p></body></html>"
    ).encode("utf-8")
    return html, f"http://multi.example.com/m/{i}.html", {}


def gen_malformed_nesting(rng, i):
    body = (
        _nav(rng)
        + f"<div class='entry'><p>{_para(rng, 2, 20, 3)}"  # unclosed p
        + f"<p>{_para(rng, 2, 18, 2)}<b>bold <b>double bold</b></b>"
        + "</table>"  # stray close
        + f"<li>orphan item {_sentence(rng, 8)}<li>second orphan {_sentence(rng, 6)}"
        + f"<p>{_para(rng, 2, 20, 2)}</p></div>"
        + _footer(rng)
    )
    return _page(f"Malformed {i}", body), f"http://broken.example.com/b/{i}.html", {}


def gen_encodings(rng, i):
    kind = i % 6
    text = _para(rng, 3, 20, 3)
    if kind == 0:
        # windows-1252 smart quotes, no meta (utf-8 fails → cp1252)
        body = f"<div class='post'><p>He said \x93{text}\x94 and left \x97 quickly. {_para(rng, 2, 20, 2)}</p></div>"
        html = (f"<html><head><title>CP1252 {i}</title></head><body>{body}</body></html>").encode("latin-1")
    elif kind == 1:
        # UTF-8 BOM + accents
        body = f"<div class='post'><p>Café déjà-vu naïve — {text} {_para(rng, 2, 20, 2)}</p></div>"
        html = b"\xef\xbb\xbf" + (f"<html><head><title>BOM {i}</title></head><body>{body}</body></html>").encode("utf-8")
    elif kind == 2:
        # declared meta charset (windows-1252) visible to the byte scan
        body = f"<div class='post'><p>Smart \x91{text}\x92 dash \x96 end. {_para(rng, 2, 20, 2)}</p></div>"
        html = (
            f"<html><head><title>Meta cp1252 {i}</title>"
            f"<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">"
            f"</head><body>{body}</body></html>"
        ).encode("latin-1")
    elif kind == 3:
        # entities + numeric/hex charrefs
        body = (
            f"<div class='post'><p>A&nbsp;B &amp; C &#8212; D &#x2014; E. {text}</p>"
            f"<p>{_para(rng, 2, 20, 2)}</p></div>"
        )
        html = (f"<html><head><title>Entities {i}</title></head><body>{body}</body></html>").encode("utf-8")
    elif kind == 4:
        # UTF-16LE with BOM (exercises the sniff + re-encode path,
        # readability.py:3118-3131)
        body = f"<div class='post'><p>Unicode déjà — {text} {_para(rng, 2, 20, 2)}</p></div>"
        html = b"\xff\xfe" + (
            f"<html><head><title>UTF16 {i}</title></head><body>{body}</body></html>"
        ).encode("utf-16-le")
    else:
        # late meta charset invisible to the byte scan ('charset&#61=')
        # → StopParsing restart (readability.py:2816-2861)
        body = f"<div class='post'><p>Smart \x93{text}\x94 quote. {_para(rng, 2, 20, 2)}</p></div>"
        html = (
            f"<html><head><title>Restart {i}</title>"
            f"<meta http-equiv=\"Content-Type\" content=\"text/html; charset&#61;windows-1252\">"
            f"</head><body>{body}</body></html>"
        ).encode("latin-1")
    return html, f"http://enc.example.com/e/{i}.html", {}


def gen_media_embeds(rng, i):
    body = (
        _nav(rng)
        + "<div class='post'>"
        + f"<p>{_para(rng, 3, 20, 3)}</p>"
        + '<iframe src="http://www.youtube.com/embed/abc123"></iframe>'
        + '<iframe src="http://tracker.example.net/frame"></iframe>'
        + f'<p><img src="/images/pic{i}.jpg" width="{500 + 200 * (i % 2)}" height="400"> {_para(rng, 2, 18, 2)}</p>'
        + f'<p><img src="rel{i}.png"> {_para(rng, 2, 18, 2)}</p>'
        + "</div>"
        + _footer(rng)
    )
    return _page(f"Media {i}", body), f"http://media.example.com/v/{i}.html", {}


def gen_footnotes_links(rng, i):
    body = (
        _nav(rng)
        + "<div class='post'>"
        + f'<p>{_para(rng, 2, 18, 2)} <a href="/deep/page{i}.html">an interesting reference here</a> {_sentence(rng, 10, 1)}</p>'
        + f'<p>{_para(rng, 2, 18, 2)} <a href="http://other.example.org/doc.html">external material source</a> {_sentence(rng, 12, 2)}</p>'
        + "</div>"
        + _footer(rng)
    )
    return (
        _page(f"Footnotes {i}", body),
        f"http://notes.example.com/fn/{i}.html",
        {"footnote_links": True},
    )


def gen_pagination(rng, i):
    art = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(4))
    pager = (
        "<div class='pagination'>"
        f"<a href='/fp/{i}/2.html'>2</a> "
        f"<a href='/fp/{i}/3.html'>3</a> "
        f"<a href='/fp/{i}/2.html' class='next'>Next</a>"
        "</div>"
    )
    body = _nav(rng) + f"<div class='story'>{art}</div>" + pager + _footer(rng)
    return _page(f"Paginated {i}", body), f"http://pages.example.com/fp/{i}/1.html", {}


def gen_whitespace_entities(rng, i):
    body = (
        "<div class='post'>"
        + f"<p>{_para(rng, 2, 18, 2)}</p>"
        + "<br><br><br>"
        + f"<p>A&nbsp;&nbsp;B\n\n   C\t D {_sentence(rng, 14, 2)}</p>"
        + f"<pre>  pre   text\n  with   spacing  kept {rng.choice(WORDS)}</pre>"
        + f"<p>{_para(rng, 2, 18, 2)}</p>"
        + "</div>"
    )
    return _page(f"Whitespace {i}", body), f"http://ws.example.com/w/{i}.html", {}


def gen_apology_page(rng, i):
    # next to no content → the apology paragraph output
    html = f"<html><head><title>Empty {i}</title></head><body><div id='x'></div></body></html>".encode()
    return html, f"http://empty.example.com/a/{i}.html", {}


def gen_exotic_markup(rng, i):
    """CDATA, processing instructions, doctype, MS marked sections,
    bogus declarations, SGML shorttags — the tokenizer's rare paths
    (readability.py:2686-2708, markupbase declaration scanners)."""
    kind = i % 4
    art = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(3))
    if kind == 0:
        pre = "<!DOCTYPE html><?php echo 'hi'; ?><![CDATA[raw <b>stuff</b> &amp;]]>"
    elif kind == 1:
        pre = "<![if !IE]><!-- conditional --><![endif]>"
    elif kind == 2:
        # bogus declaration → SGMLParseError → rest-as-data is too
        # destructive mid-page; put it after the article
        pre = "<!-- normal comment -->"
        art += "<!bogus@decl>"
    else:
        pre = "<!>"  # empty declaration
    body = pre + f"<div class='article'>{art}</div>" + _footer(rng)
    return _page(f"Exotic {i}", body), f"http://exotic.example.com/x/{i}.html", {}


def gen_readable_footnotes(rng, i):
    """footnote_links + readable_footnote_links + service_uri — the
    urllib.quote rewriting path (readability.py:334-359)."""
    body = (
        _nav(rng)
        + "<div class='post'>"
        + f'<p>{_para(rng, 2, 18, 2)} <a href="/ref/a{i}.html?q=1&x=2">the primary reference material</a> {_sentence(rng, 12, 2)}</p>'
        + f'<p>{_para(rng, 2, 18, 2)} <a href="http://alt.example.org/doc{i}.html">another interesting source</a> {_sentence(rng, 10, 1)}</p>'
        + "</div>"
        + _footer(rng)
    )
    return (
        _page(f"Readable footnotes {i}", body),
        f"http://rfn.example.com/p/{i}.html",
        {
            "footnote_links": True,
            "readable_footnote_links": True,
            "service_uri": "http://readable.example.com/g?u=%s",
            "read_margin": "margin-wide",
        },
    )


def gen_no_title(rng, i):
    """No <title>; a single h1 becomes the candidate title
    (readability.py:495-498)."""
    art = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(3))
    h1 = f"<h1>The Lone Heading Number {i}</h1>"
    html = (
        f"<html><head></head><body>{_nav(rng)}{h1}"
        f"<div class='content'>{art}</div>{_footer(rng)}</body></html>"
    ).encode("utf-8")
    return html, f"http://untitled.example.com/u/{i}.html", {}


def gen_dup_attrs(rng, i):
    """Duplicate attribute keys interacting with the reference's cached
    attr map: del tag['class'] clears the cache but the skip-bug leaves
    a list duplicate, so later get('class') sees the stale empty cache
    (found by differential fuzzing, round 1)."""
    art = "".join(f"<p>{_para(rng, 3, 20, 3)}</p>" for _ in range(3))
    body = (
        "<div class='story' class='story-alt'>"
        + art
        + f'<p><img src="pic{i}.png" width="{400 + 100 * (i % 3)}" class="c1" class="c2"> {_para(rng, 2, 18, 2)}</p>'
        + f"<p><a href='/x{i}.html' id='lnk' id='lnk2'>some linked reference text</a> {_sentence(rng, 12, 2)}</p>"
        + "</div>"
        + _footer(rng)
    )
    return _page(f"Dup attrs {i}", body), f"http://dup.example.com/d/{i}.html", {}


def gen_encodings_tail(rng, i):
    """Round-3 golden family (VERDICT r2 item 6): the rarest branches
    of the O2 encoding cascade.

    - UTF-16LE/BE WITHOUT a BOM: only detectable from the XML
      declaration byte pattern ('<\\x00?\\x00' / '\\x00<\\x00?',
      readability.py:3100-3116) — a plain no-BOM UTF-16 HTML page is
      undetectable by design, so the fixtures carry the declaration.
    - ISO-8859-2 declared LATE via an entity-obfuscated meta (invisible
      to the byte scan → StopParsing restart, readability.py:2816-2861)
      with Latin-2 letters whose cp1252 decoding differs.
    - MS smart-quote substitution: declared ISO-8859-1 content carrying
      the full \\x80-\\x9f table (readability.py:3201-3248) — the BS3
      smartQuotesTo='xml' path must map each to its entity.
    """
    kind = i % 6
    text = _para(rng, 3, 20, 3)
    tail = _para(rng, 2, 20, 2)
    if kind == 0:
        # UTF-16LE, no BOM, XML declaration carries the detection bytes
        doc = (
            f"<?xml version=\"1.0\"?><html><head><title>U16LE {i}</title>"
            f"</head><body><div class='post'><p>Déjà — {text} {tail}</p>"
            f"</div></body></html>"
        )
        html = doc.encode("utf-16-le")
    elif kind == 1:
        # UTF-16BE, no BOM
        doc = (
            f"<?xml version=\"1.0\"?><html><head><title>U16BE {i}</title>"
            f"</head><body><div class='post'><p>Naïve café — {text} {tail}</p>"
            f"</div></body></html>"
        )
        html = doc.encode("utf-16-be")
    elif kind == 2:
        # UTF-16BE WITH BOM (the existing encodings family covers LE)
        doc = (
            f"<html><head><title>U16BE BOM {i}</title></head><body>"
            f"<div class='post'><p>Résumé — {text} {tail}</p></div>"
            f"</body></html>"
        )
        html = b"\xfe\xff" + doc.encode("utf-16-be")
    elif kind == 3:
        # ISO-8859-2 declared late (entity-obfuscated '=' hides it from
        # the byte scan; the parser sees it mid-parse → restart) with
        # Latin-2 letters: ± (b1) is ą, ¾ (be) is ž, ¿ (bf) is ż
        body = (
            f"<div class='post'><p>Gda\xf1sk \xb1 \xbe \xbf \xe6 - {text} "
            f"{tail}</p></div>"
        )
        doc = (
            f"<html><head><title>Latin2 late {i}</title>"
            f"<meta http-equiv=\"Content-Type\" "
            f"content=\"text/html; charset&#61;iso-8859-2\">"
            f"</head><body>{body}</body></html>"
        )
        html = doc.encode("latin-1")
    elif kind == 4:
        # ISO-8859-2 declared normally (visible to the byte scan)
        body = (
            f"<div class='post'><p>\xa3\xf3d\xbf \xb6wietnie - {text} "
            f"{tail}</p></div>"
        )
        doc = (
            f"<html><head><title>Latin2 {i}</title>"
            f"<meta http-equiv=\"Content-Type\" "
            f"content=\"text/html; charset=iso-8859-2\">"
            f"</head><body>{body}</body></html>"
        )
        html = doc.encode("latin-1")
    else:
        # declared ISO-8859-1 carrying the full MS \x80-\x9f range —
        # every smart char must come out as its substitution entity
        ms = "".join(chr(c) for c in range(0x80, 0xA0))
        body = f"<div class='post'><p>MS[{ms}] sweep. {text} {tail}</p></div>"
        doc = (
            f"<html><head><title>MS chars {i}</title>"
            f"<meta http-equiv=\"Content-Type\" "
            f"content=\"text/html; charset=iso-8859-1\">"
            f"</head><body>{body}</body></html>"
        )
        html = doc.encode("latin-1")
    return html, f"http://enctail.example.com/t/{i}.html", {}


# Golden-only families: byte-identity coverage that is NOT part of the
# pages corpus (generate_page_row indexes FAMILIES by position, so
# appending there would silently reshuffle every bench/scaling corpus).
GOLDEN_ONLY_FAMILIES = {
    "encodings_tail": gen_encodings_tail,
}

FAMILIES = {
    "simple_article": gen_simple_article,
    "dup_attrs": gen_dup_attrs,
    "exotic_markup": gen_exotic_markup,
    "readable_footnotes": gen_readable_footnotes,
    "no_title": gen_no_title,
    "div_soup": gen_div_soup,
    "table_layout": gen_table_layout,
    "link_farm": gen_link_farm,
    "short_content": gen_short_content,
    "title_contest": gen_title_contest,
    "no_body": gen_no_body,
    "multi_body": gen_multi_body,
    "malformed_nesting": gen_malformed_nesting,
    "encodings": gen_encodings,
    "media_embeds": gen_media_embeds,
    "footnotes_links": gen_footnotes_links,
    "pagination": gen_pagination,
    "whitespace_entities": gen_whitespace_entities,
    "apology_page": gen_apology_page,
}


def generate_fixtures(per_family: int = 4, seed: int = 42) -> list[Fixture]:
    fixtures = []
    for family, gen in {**FAMILIES, **GOLDEN_ONLY_FAMILIES}.items():
        for i in range(per_family):
            rng = random.Random(f"{seed}:{family}:{i}")
            html, url, settings = gen(rng, i)
            fixtures.append(
                Fixture(
                    fixture_id=f"{family}_{i:03d}",
                    family=family,
                    url=url,
                    html=html,
                    settings=settings,
                )
            )
    return fixtures


_OVERSIZE_PARA = (
    "<p>Synthetic oversized paragraph with plenty of commas, words, "
    "clauses, and sentences, repeated to inflate the document body, "
    "testing large page extraction cost at megabyte scale.</p>"
)


def _oversized_html(k: int) -> bytes:
    """Deterministic 1-2 MB page (round-3 skew corpus, VERDICT r2
    item 4): extraction cost is ~linear in bytes (~0.6 s/MB single
    core), so one outlier ≈ 500 normal docs — the straggler shape a
    real crawl's tail produces."""
    target = 1_000_000 + (k * 37_503) % 1_000_000
    n = max(1, target // len(_OVERSIZE_PARA))
    return (
        f"<html><head><title>Oversized {k}</title></head><body>"
        "<div class='nav'><a href='/'>Home</a></div>"
        "<div class='article-content'>" + _OVERSIZE_PARA * n + "</div>"
        "<div id='footer'><p>Copyright.</p></div></body></html>"
    ).encode("utf-8")


def generate_page_row(k: int, seed: int = 42, oversize_every: int = 0) -> dict:
    """One deterministic pages-corpus row (shared by the in-memory
    generator and the parallel parquet writer). ``oversize_every=N``
    replaces every Nth page's html with a 1-2 MB outlier document
    (host skew stays as-is — the Zipf-hot host is already built in)."""
    import datetime
    import re as _re

    langs = ["en"] * 9 + ["de", "fr", ""]
    fams = list(FAMILIES)
    rng = random.Random(f"pages:{seed}:{k}")
    r = rng.random()
    if r < 0.35:
        host = 0
    elif r < 0.55:
        host = 1
    else:
        host = rng.randrange(2, 40)
    family = fams[k % len(fams)]
    html, _url, settings = FAMILIES[family](rng, k % 7)
    if oversize_every and k % oversize_every == 0:
        html = _oversized_html(k)
    text = _re.sub(r"<[^>]+>", " ", html.decode("utf-8", "replace"))
    text = _re.sub(r"\s+", " ", text).strip()
    return {
        "url": f"http://host{host:04d}.example.com/{family}/post-{k:06d}.html",
        "warc_ts": datetime.datetime(2026, 1, 1)
        + datetime.timedelta(seconds=k % 86400),
        "html": html,
        "text": text,
        "lang": langs[k % len(langs)],
        "settings": settings,
    }


def generate_pages_rows(n_rows: int, seed: int = 42):
    """Synthesize the Common-Crawl-style pages corpus rows
    (url, warc_ts, html, text, lang) — the BASELINE.json input_hint
    shape. Hosts are Zipf-skewed (host 0 ≈ 35% of pages) to exercise
    skew handling; every 17th url is duplicated with a later warc_ts to
    exercise dedup-by-latest."""
    import datetime

    rows = [generate_page_row(k, seed) for k in range(n_rows)]
    for k in range(0, n_rows, 17):
        dup = dict(rows[k])
        dup["warc_ts"] = dup["warc_ts"] + datetime.timedelta(days=1)
        rows.append(dup)
    return rows
