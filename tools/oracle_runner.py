# -*- coding: utf-8 -*-
"""Python-2 oracle runner. Executes /root/reference/readability.py on
fixture documents and emits golden outputs as JSON lines.

Input (stdin):  one JSON object per line:
  {"id": ..., "html_b64": ..., "url": ..., "settings": {...},
   "mode": "extract" | "parse"}
Output (stdout): one JSON object per line:
  extract: {"id", "ok", "title_b64", "body_b64", "text_b64",
            "footnotes", "full_b64"} (error: {"id", "ok": false, "error"})
  parse:   {"id", "ok", "render_b64"}  (str(soup) round-trip only)

Run: PYENV_VERSION=2.7.18 python2 tools/oracle_runner.py < in.jsonl > out.jsonl
"""

import base64
import json
import sys

sys.path.insert(0, '/root/reference')

import readability
from readability import Readability, ICantBelieveItsBeautifulSoup, get_inner_text


def b64(s):
    if isinstance(s, unicode):
        s = s.encode('utf-8')
    return base64.b64encode(s)


def run_parse(html):
    soup = ICantBelieveItsBeautifulSoup(html)
    return soup.renderContents()  # utf-8 bytes


def run_extract(html, url, settings):
    r = Readability(html, url=url, **settings)
    r.process_document()
    title = r.get_title() or u''
    body = r.get_article_body()
    text = get_inner_text(r._articleBody)
    footnotes = [
        [b64(h), b64(t)] for (h, t) in r.get_article_footnotes()
    ]
    full = r.get_html(prettyPrint=False)
    # call order matters for parity: plain render first, then pretty
    # (comment removal already happened in the first call), then the
    # get_doc round-trip re-parse (readability.py:122-126)
    pretty = r.get_html(prettyPrint=True)
    docrender = r.get_doc().renderContents()
    return title, body, text, footnotes, full, pretty, docrender


def main():
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        html = base64.b64decode(req['html_b64'].encode('ascii'))
        out = {'id': req['id']}
        try:
            if req.get('mode') == 'parse':
                out['render_b64'] = b64(run_parse(html))
                out['ok'] = True
            else:
                settings = {}
                for k, v in (req.get('settings') or {}).items():
                    settings[k.encode('ascii')] = v
                title, body, text, footnotes, full, pretty, docrender = \
                    run_extract(html, req.get('url'), settings)
                out['ok'] = True
                out['title_b64'] = b64(title)
                out['body_b64'] = b64(body)
                out['text_b64'] = b64(text)
                out['footnotes'] = footnotes
                out['full_b64'] = b64(full)
                out['pretty_b64'] = b64(pretty)
                out['docrender_b64'] = b64(docrender)
        except Exception, e:  # noqa: py2 syntax
            out['ok'] = False
            out['error'] = '%s: %s' % (type(e).__name__, e)
        sys.stdout.write(json.dumps(out))
        sys.stdout.write('\n')


if __name__ == '__main__':
    main()
