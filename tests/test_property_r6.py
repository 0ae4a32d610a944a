"""Property-based test (hypothesis) for ``snapshot_diff_from``: under
ARBITRARY pairs of snapshots (arbitrary key overlap, arbitrary text
changes) the diff must equal the set-algebra reference computed in
plain Python with hashlib md5. Unlike the r5 kernel properties this
drives Spark itself (the property under test IS the full-outer join
semantics), so the example budget is small."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.text(alphabet="ab ", min_size=0, max_size=6)
snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=12), texts, max_size=8
)


def _ref_diff(old: dict, new: dict) -> dict:
    def fp(t: str) -> str:
        return hashlib.md5(t.encode("utf-8")).hexdigest()

    out = {}
    for k in set(old) | set(new):
        if k not in old:
            out[k] = ("added", "", fp(new[k]))
        elif k not in new:
            out[k] = ("removed", fp(old[k]), "")
        elif fp(old[k]) == fp(new[k]):
            out[k] = ("unchanged", fp(old[k]), fp(new[k]))
        else:
            out[k] = ("changed", fp(old[k]), fp(new[k]))
    return out


@settings(max_examples=12, deadline=None)
@given(old=snapshot, new=snapshot)
def test_snapshot_diff_matches_set_algebra(spark, old, new):
    from readability_py_spark.operators.incremental import snapshot_diff_from

    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(list(old.items()) or [], schema)
    new_df = spark.createDataFrame(list(new.items()) or [], schema)
    got = {
        r.doc_id: (r.status, r.old_fp, r.new_fp)
        for r in snapshot_diff_from(old_df, new_df).collect()
    }
    assert got == _ref_diff(old, new)
