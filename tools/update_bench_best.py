#!/usr/bin/env python3
"""Merge a families-mode bench artifact into BENCH_BEST.json.

Usage: tools/update_bench_best.py BENCH_rNN.json [more.json ...]

Each input is either the driver's wrapper ({"tail": "...{one JSON
line}..."}) or a raw one-line bench JSON. Only artifacts whose sf
matches the ledger's sf are merged (same-protocol, same-scale readings
only — that is the point of the ledger). sf is compared by BASENAME,
matching the Scala consumer (Bench.loadBest): the prefix is
machine-/checkout-specific. Artifacts already in `sources` are skipped,
so re-running over the same files is idempotent.

Since r17 the ledger keeps per-gate `readings` (most recent WINDOW
values) and the effective best is the CONFIRMED best: the minimum only
gates when a second reading sits within 5% above it, otherwise the
second-lowest gates. The authoritative implementation of that rule is
Bench.confirmedBest (Scala — pinned by BenchLedgerSpec); the `best` map
written here applies the same rule so humans read the effective values.
A one-off quiet reading (q_ann_lsh's 0.229, which flagged 6 of 7
calibrated r16 readings on unchanged code) can no longer become a bar
every honest run fails.
"""
import json
import os
import re
import sys

LEDGER = "BENCH_BEST.json"
WINDOW = 16  # readings kept per gate (rolling; old quiet boxes age out)


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


def confirmed_best(readings):
    """Mirror of Bench.confirmedBest: min gates only when attested by a
    second reading within 5% above it; else the second-lowest gates."""
    s = sorted(v for v in readings if v and v > 0)
    if not s:
        return None
    if len(s) == 1:
        return s[0]
    return s[0] if s[1] <= s[0] * 1.05 else s[1]


def main():
    ledger = json.load(open(LEDGER))
    readings = ledger.setdefault("readings", {})
    changed = []
    for path in sys.argv[1:]:
        if path in ledger["sources"]:
            print(f"skip {path}: already merged")
            continue
        line = bench_line(path)
        sf = os.path.basename((line.get("sf") or "").rstrip("/"))
        want = os.path.basename(ledger["sf"].rstrip("/"))
        if sf != want:
            print(f"skip {path}: sf {line.get('sf')} != ledger {ledger['sf']}")
            continue
        for q, v in (line.get("queries") or {}).items():
            if v is None:
                continue
            readings[q] = (readings.get(q, []) + [v])[-WINDOW:]
            changed.append(f"{q}: reading {v} ({path})")
        # best (= lowest) calibration reading: the quiet-box reference
        # box_drift is computed against; data-independent, so no sf gate
        cal = line.get("calibration")
        if isinstance(cal, (int, float)) and cal > 0:
            old = ledger.get("calibration")
            if old is None or cal < old:
                ledger["calibration"] = cal
                changed.append(f"calibration: {old} -> {cal} ({path})")
        ledger["sources"].append(path)
    # recompute the effective (confirmed) best for every gate with
    # readings; gates without readings keep their legacy best entry
    for q, rs in readings.items():
        cb = confirmed_best(rs)
        if cb is not None:
            old = ledger["best"].get(q)
            ledger["best"][q] = cb
            if old != cb:
                changed.append(f"best {q}: {old} -> {cb}")
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=2)
        f.write("\n")
    print("\n".join(changed) if changed else "no improvements")


if __name__ == "__main__":
    main()
