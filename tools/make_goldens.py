#!/usr/bin/env python3
"""Generate golden fixture outputs by executing the python2 reference
oracle on the deterministic fixture corpus (FIXTURES.md §2-3).

Writes tests/fixtures/goldens.jsonl: one JSON object per fixture with
base64-encoded html + expected outputs. Run whenever fixture families
change:  python tools/make_goldens.py
"""

from __future__ import annotations

import base64
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from readability_py_spark.sources.fixtures import generate_fixtures  # noqa: E402

OUT = os.path.join(REPO, "tests", "fixtures", "goldens.jsonl")


def main() -> None:
    fixtures = generate_fixtures(per_family=6, seed=42)
    reqs = "".join(
        json.dumps(
            {
                "id": f.fixture_id,
                "html_b64": base64.b64encode(f.html).decode(),
                "url": f.url,
                "settings": f.settings,
                "mode": "extract",
            }
        )
        + "\n"
        for f in fixtures
    )
    env = dict(os.environ)
    env["PYENV_VERSION"] = "2.7.18"
    proc = subprocess.run(
        ["python2", os.path.join(REPO, "tools", "oracle_runner.py")],
        input=reqs.encode(),
        capture_output=True,
        env=env,
    )
    if proc.returncode:
        sys.stderr.write(proc.stderr.decode())
        sys.exit(1)
    oracle = {
        json.loads(line)["id"]: json.loads(line)
        for line in proc.stdout.decode().splitlines()
    }
    n_err = 0
    with open(OUT, "w") as fh:
        for f in fixtures:
            o = oracle[f.fixture_id]
            rec = {
                "id": f.fixture_id,
                "family": f.family,
                "url": f.url,
                "settings": f.settings,
                "html_b64": base64.b64encode(f.html).decode(),
                "ok": o["ok"],
            }
            if o["ok"]:
                rec.update(
                    {
                        "title_b64": o["title_b64"],
                        "body_b64": o["body_b64"],
                        "text_b64": o["text_b64"],
                        "footnotes": o["footnotes"],
                        "full_b64": o["full_b64"],
                        "pretty_b64": o["pretty_b64"],
                        "docrender_b64": o["docrender_b64"],
                    }
                )
            else:
                rec["error"] = o["error"]
                n_err += 1
                print(f"oracle ERROR on {f.fixture_id}: {o['error']}")
            fh.write(json.dumps(rec) + "\n")
    print(f"wrote {len(fixtures)} goldens to {OUT} ({n_err} oracle errors)")


if __name__ == "__main__":
    main()
