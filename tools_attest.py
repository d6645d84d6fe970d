#!/usr/bin/env python
"""Maintain ATTESTED.json — the change-aware attestation ledger.

The driver's CORRECTNESS_r{N}.json rows say a query name passed, but
not WHICH form of the query: a green row earned before a rewrite must
not keep the rewritten query out of the 50-slot window (VERDICT r05
What's-wrong #1). This tool records, per attested name, the content
hash (sha256 over undecorated function source + oracle SQL) of the
form the driver actually verified; ``registry._ordered_names()`` then
treats any query whose CURRENT hash differs as needing re-attestation.

Usage:
  python tools_attest.py --sync [--exclude a,b,c] [--all-rounds]
      Record current hashes for queries with a passing row in the
      NEWEST CORRECTNESS_r*.json (--all-rounds sweeps every file —
      bootstrap only). RUN AT ROUND START, BEFORE EDITING — that is
      what makes "current source == attested source" true. Latest-only
      is the safe default: a green row from an older round may attest
      a form that was since rewritten, and re-recording it mid-round
      would silently mark a stale query fresh. Names in --exclude are
      known rewritten-after-green and are left out (they re-queue).
      Existing ledger entries are kept unless the name is excluded.
  python tools_attest.py --check
      Report never-attested / stale / fresh counts and the first 50
      export names (the next driver window).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from martian_moments_spark.plans import load_all  # noqa: E402
from martian_moments_spark.plans import registry as R  # noqa: E402

LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ATTESTED.json")


def latest_green_round(all_rounds: bool = False) -> dict[str, str]:
    """name -> basename of the newest CORRECTNESS file with a passing
    row for it (provenance only; freshness is decided by hash). With
    ``all_rounds=False`` only the newest file is read — the safe
    --sync scope (see module docstring)."""
    import glob

    paths = sorted(glob.glob(os.path.join(os.path.dirname(LEDGER), "CORRECTNESS_r*.json")))
    if not all_rounds:
        paths = paths[-1:]
    out: dict[str, str] = {}
    for path in paths:
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or (
                row.get("err") in (None, "no_oracle") and row.get("rows_match")
            ):
                out[name] = os.path.basename(path)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sync", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--all-rounds", action="store_true", help="sweep every CORRECTNESS file (bootstrap); default is newest only")
    ap.add_argument("--exclude", default="", help="comma-separated names rewritten after their green row")
    args = ap.parse_args()

    load_all()
    ledger = R._attested_ledger(LEDGER)
    green = latest_green_round(all_rounds=args.all_rounds)
    exclude = {n for n in args.exclude.split(",") if n}

    if args.sync:
        unknown = exclude - set(R.REGISTRY)
        if unknown:
            raise SystemExit(f"--exclude names not registered: {sorted(unknown)}")
        added, dropped = [], []
        for name in exclude:
            if name in ledger:
                ledger.pop(name)
                dropped.append(name)
        for name, rnd in sorted(green.items()):
            if name in exclude or name not in R.REGISTRY:
                continue
            h = R.content_hash(R.REGISTRY[name])
            row = ledger.get(name)
            # a malformed row (hand edit / bad merge) must be repaired
            # by sync, not crash it — same degrade rule as the registry
            if not isinstance(row, dict) or row.get("hash") != h:
                ledger[name] = {"hash": h, "round": rnd}
                added.append(name)
        with open(LEDGER, "w") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"synced: {len(added)} recorded, {len(dropped)} excluded-dropped, ledger={len(ledger)}")

    if args.check or not args.sync:
        fresh = R._attested_fresh(R._attested_ledger(LEDGER))
        attested = R._driver_attested()
        oracle = {n for n, s in R.REGISTRY.items() if s.oracle is not None}
        never = oracle - attested
        stale = (oracle & attested) - fresh
        order = R._ordered_names()
        # A name green in the NEWEST correctness file but absent from
        # the ledger is merely awaiting --sync, not real debt; print
        # the actionable number so a pre-sync --check doesn't read as
        # alarming (VERDICT r06 What's-wrong #4). Assumes no edits
        # since round close — sync first if in doubt.
        newest_green = latest_green_round(all_rounds=False)
        led = R._attested_ledger(LEDGER)
        # already synced from the newest file and STILL stale means
        # the code was edited after sync — real debt. A NON-DICT
        # ledger row has unknown provenance and must also count as
        # real debt (a malformed row must not hide an edited query
        # from the actionable line); only a missing row or a dict
        # row from an older round is genuinely awaiting --sync.
        pending_sync = set()
        for n in stale & set(newest_green):
            row = led.get(n)
            if row is None or (
                isinstance(row, dict) and row.get("round") != newest_green[n]
            ):
                pending_sync.add(n)
        actionable = stale - pending_sync
        print(f"registered={len(R.REGISTRY)} oracle-paired={len(oracle)}")
        print(f"never-attested={len(never)} stale={len(stale)} fresh={len(fresh)}")
        if pending_sync:
            print(
                f"  ({len(pending_sync)} of the stale are green in the newest "
                f"CORRECTNESS file and just await --sync; actionable stale={len(actionable)})"
            )
        if actionable:
            print("stale:", ", ".join(sorted(actionable)))
        print("next window (50):")
        for i, n in enumerate(order[:50], 1):
            tag = "NEVER" if n in never else ("STALE" if n in stale else "fresh")
            print(f"  {i:2d} [{tag}] {n}")


if __name__ == "__main__":
    main()
