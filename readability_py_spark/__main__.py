"""One-document CLI face — the reference's first entry point
(readability.py:3264-3279: ``python readability.py <url>`` fetches one
page, extracts, and prints ``get_html(prettyPrint=True)``).

Usage:
    python -m readability_py_spark <file-or-url> [options]

Defaults mirror the reference CLI invocation exactly
(footnote_links=True, readable_links=True, the reference's service
URI, margin-wide); the extraction itself is the byte-identical core
the Spark pipeline uses, so this doubles as a single-doc debugging
tool for cluster jobs.
"""

from __future__ import annotations

import argparse
import sys

# readability.py:3275-3276 — the reference CLI's hardcoded settings
REF_CLI_SERVICE_URI = "http://ahrefs.appspot.com/g?u=%s"
REF_CLI_READ_MARGIN = "margin-wide"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m readability_py_spark",
        description="Extract the readable article from one HTML page "
        "and print the rendered output (reference CLI parity).",
    )
    ap.add_argument("source", help="local file path or http(s) URL")
    ap.add_argument(
        "--url",
        default=None,
        help="document URL for link absolutization when SOURCE is a file",
    )
    ap.add_argument(
        "--no-footnote-links",
        action="store_true",
        help="disable footnote generation (reference CLI enables it)",
    )
    ap.add_argument(
        "--no-readable-links",
        action="store_true",
        help="disable readable-link rewriting (reference CLI enables it)",
    )
    ap.add_argument(
        "--service-uri",
        default=REF_CLI_SERVICE_URI,
        help="readable-link service URI template",
    )
    ap.add_argument(
        "--read-margin",
        default=REF_CLI_READ_MARGIN,
        help="output margin class (reference CLI uses margin-wide)",
    )
    ap.add_argument(
        "--plain",
        action="store_true",
        help="render without prettyPrint indentation",
    )
    ap.add_argument(
        "--text",
        action="store_true",
        help="print the extracted article text instead of HTML",
    )
    args = ap.parse_args(argv)

    if args.source.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(args.source) as resp:
            html = resp.read()
        url = args.source
    else:
        with open(args.source, "rb") as fh:
            html = fh.read()
        url = args.url or f"file://{args.source}"

    from .core.arc90 import Arc90Document

    doc = Arc90Document(
        html,
        url=url,
        footnote_links=not args.no_footnote_links,
        readable_links=not args.no_readable_links,
        service_uri=args.service_uri,
        read_margin=args.read_margin,
    )
    doc.process_document()
    if args.text:
        out = doc.get_article_text()
    else:
        out = doc.get_html(pretty_print=not args.plain)
    sys.stdout.write(out)
    if not out.endswith("\n"):
        sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
