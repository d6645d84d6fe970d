"""Ledger-hygiene tests for tools_attest.py (VERDICT r08 Next-round
#5): a malformed (non-dict) ATTESTED.json row — hand edit, bad merge —
must surface as ACTIONABLE stale in --check (unknown provenance must
not hide an edited query behind the awaiting-sync line) and must be
repaired, not crashed on, by --sync. No Spark session needed: the
registry registers plans at import and the tool is pure file I/O."""

from __future__ import annotations

import json
import sys


def _run_main(monkeypatch, capsys, ledger_path, argv):
    import tools_attest

    monkeypatch.setattr(tools_attest, "LEDGER", str(ledger_path))
    monkeypatch.setattr(sys, "argv", ["tools_attest.py", *argv])
    tools_attest.main()
    return capsys.readouterr().out


def _stage_correctness(tmp_path):
    """latest_green_round scans dirname(LEDGER) — stage the repo's
    newest CORRECTNESS file next to the temp ledger so the green set
    matches reality."""
    import glob
    import os
    import shutil

    import tools_attest

    root = os.path.dirname(tools_attest.LEDGER)
    newest = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))[-1]
    shutil.copy(newest, tmp_path / os.path.basename(newest))


def _green_attested_name():
    """A name that is green in the newest CORRECTNESS file AND has a
    fresh dict row in the committed ledger (so corrupting only the
    ledger row isolates the malformed-row path)."""
    import tools_attest
    from martian_moments_spark.plans import load_all
    from martian_moments_spark.plans import registry as R

    load_all()
    green = tools_attest.latest_green_round()
    ledger = R._attested_ledger(tools_attest.LEDGER)
    fresh = R._attested_fresh(ledger)
    candidates = sorted(set(green) & fresh & set(R.REGISTRY))
    assert candidates, "no green+fresh name to corrupt — ledger out of sync?"
    return candidates[0], ledger


def test_non_dict_row_is_actionable_stale(tmp_path, monkeypatch, capsys):
    name, ledger = _green_attested_name()
    corrupt = dict(ledger)
    corrupt[name] = "garbage-string-row"
    path = tmp_path / "ATTESTED.json"
    path.write_text(json.dumps(corrupt))
    _stage_correctness(tmp_path)

    out = _run_main(monkeypatch, capsys, path, ["--check"])
    stale_lines = [ln for ln in out.splitlines() if ln.startswith("stale:")]
    # the malformed row must land on the ACTIONABLE line, not be
    # silently parked as awaiting-sync
    assert stale_lines and name in stale_lines[0], out


def test_sync_repairs_non_dict_row(tmp_path, monkeypatch, capsys):
    name, ledger = _green_attested_name()
    corrupt = dict(ledger)
    corrupt[name] = ["not", "a", "dict"]
    path = tmp_path / "ATTESTED.json"
    path.write_text(json.dumps(corrupt))
    _stage_correctness(tmp_path)

    out = _run_main(monkeypatch, capsys, path, ["--sync"])
    assert "synced:" in out
    repaired = json.loads(path.read_text())
    row = repaired[name]
    assert isinstance(row, dict) and set(row) == {"hash", "round"}, row
    # and the repaired ledger now reports the name fresh
    out2 = _run_main(monkeypatch, capsys, path, ["--check"])
    stale_lines = [ln for ln in out2.splitlines() if ln.startswith("stale:")]
    assert not stale_lines or name not in stale_lines[0], out2


def test_latest_green_round_skips_non_dict_correctness_rows(tmp_path, monkeypatch):
    """A malformed row inside a CORRECTNESS file itself must be
    skipped, not crash the scan (the same degrade rule)."""
    import tools_attest

    bogus = {
        "good_query": {"hash_match": True, "rows_match": True, "err": None},
        "bad_query": "not-a-dict",
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(bogus))
    monkeypatch.setattr(
        tools_attest, "LEDGER", str(tmp_path / "ATTESTED.json")
    )
    green = tools_attest.latest_green_round()
    assert "good_query" in green and "bad_query" not in green
