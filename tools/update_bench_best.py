#!/usr/bin/env python3
"""Merge a families-mode bench artifact into BENCH_BEST.json.

Usage: tools/update_bench_best.py BENCH_rNN.json [more.json ...]

Each input is either the driver's wrapper ({"tail": "...{one JSON
line}..."}) or a raw one-line bench JSON. Per-gate minima are kept;
the sources list records which artifacts contributed. Only artifacts
whose sf matches the ledger's sf are merged (same-protocol, same-scale
readings only — that is the point of the ledger). sf is compared by
BASENAME, matching the Scala consumer (Bench.loadBest): the prefix is
machine-/checkout-specific.
"""
import json
import os
import re
import sys

LEDGER = "BENCH_BEST.json"


def bench_line(path):
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return doc
    hay = doc.get("tail", "") if isinstance(doc, dict) else raw
    # the line is a full JSON object (since r15 it contains nested objects
    # after "errors" — vs_best — so a brace-counting regex can't bound it);
    # raw_decode from each anchor parses exactly one balanced value, and a
    # truncated/quoted first occurrence falls through to later anchors
    # instead of crashing the merge
    for m in re.finditer(r'\{"metric":"total"', hay):
        try:
            line, _ = json.JSONDecoder().raw_decode(hay, m.start())
            if isinstance(line, dict) and "queries" in line:
                return line
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no parseable bench JSON line found")


def main():
    ledger = json.load(open(LEDGER))
    changed = []
    for path in sys.argv[1:]:
        line = bench_line(path)
        sf = os.path.basename((line.get("sf") or "").rstrip("/"))
        want = os.path.basename(ledger["sf"].rstrip("/"))
        if sf != want:
            print(f"skip {path}: sf {line.get('sf')} != ledger {ledger['sf']}")
            continue
        for q, v in (line.get("queries") or {}).items():
            if v is None:
                continue
            old = ledger["best"].get(q)
            if old is None or v < old:
                ledger["best"][q] = v
                changed.append(f"{q}: {old} -> {v} ({path})")
        # best (= lowest) calibration reading: the quiet-box reference
        # box_drift is computed against; data-independent, so no sf gate
        cal = line.get("calibration")
        if isinstance(cal, (int, float)) and cal > 0:
            old = ledger.get("calibration")
            if old is None or cal < old:
                ledger["calibration"] = cal
                changed.append(f"calibration: {old} -> {cal} ({path})")
        if path not in ledger["sources"]:
            ledger["sources"].append(path)
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=2)
        f.write("\n")
    print("\n".join(changed) if changed else "no improvements")


if __name__ == "__main__":
    main()
