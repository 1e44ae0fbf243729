"""Registry hygiene: no silently-shadowed queries or oracles.

Python dict literals and repeated ``ORACLES[k] =`` / ``QUERIES.update``
assignments are last-binding-wins, so a re-used name silently replaces
an earlier operator while every sweep stays green (it happened twice:
q_funnel/q_inverted_index in round 5's first session, q_cube in its
second).  These tests parse the SOURCE, not the built dicts, so a
duplicate can't hide behind the very semantics that cause the bug.
"""

import re
from collections import Counter
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "bb_ocr_ray" / "pipelines"


def _dupes(names):
    return {k: v for k, v in Counter(names).items() if v > 1}


def test_no_duplicate_oracle_keys():
    src = (SRC / "oracles.py").read_text()
    keys = re.findall(r'ORACLES\["(\w+)"\]\s*=', src)
    assert not _dupes(keys), f"shadowed oracle keys: {_dupes(keys)}"


def test_no_duplicate_query_defs_or_registrations():
    src = (SRC / "queries.py").read_text()
    defs = re.findall(r"^def (q\w+)\(", src, re.M)
    assert not _dupes(defs), f"shadowed query functions: {_dupes(defs)}"
    # registry names are q_<name> or q<digit><name> (q1/q5/q6); the
    # narrower class keeps row-dict keys like "query_id"/"qlabel" out
    regs = re.findall(r'"(q_\w+|q\d\w*)"\s*:', src)
    assert not _dupes(regs), f"double-registered query names: {_dupes(regs)}"


def test_registry_and_oracles_align():
    # every query has an oracle and vice versa (the driver records a
    # weaker rows-only check for missing oracles — keep that set empty)
    from bb_ocr_ray.pipelines.oracles import ORACLES
    from bb_ocr_ray.pipelines.queries import QUERIES

    assert set(QUERIES) == set(ORACLES), (
        sorted(set(QUERIES) ^ set(ORACLES)))
