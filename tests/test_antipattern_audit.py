"""The anti-pattern audit record must match the tree (r11 verdict #2).

A deliberate new `.collect()` / `.crossJoin(` / Arrow site fails here
until `python scripts/audit_antipatterns.py --update` regenerates
AUDIT.json — making the reviewer re-justify the site's bounded class
instead of letting the recorded count drift silently (it went stale in
both r10 and r11). Pure-filesystem test: no SparkSession needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from audit_antipatterns import HARD_ZERO, check  # noqa: E402


def test_audit_counts_match_record():
    ok, got, want = check()
    assert ok, (
        f"anti-pattern counts drifted from AUDIT.json: measured {got}, "
        f"recorded {want} — review the new sites "
        "(scripts/audit_antipatterns.py --sites <key>) and regenerate "
        "with --update"
    )


def test_banned_classes_are_zero():
    _, got, _ = check()
    for key in HARD_ZERO:
        assert got[key] == 0, f"{key} sites found: banned outright"
