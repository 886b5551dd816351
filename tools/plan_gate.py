#!/usr/bin/env python3
"""Plan-SHAPE regression gate.

Time-gating on this host false-trips under phase noise (+-20%); what a
timing gate cannot see is a query silently gaining an exchange or losing
a broadcast. This gate compares the structural plan counts emitted by
`sbt "runMain graft.Explain json"` against the committed plan_ref.json
and trips ONLY on shape drift:

  - exchanges (exch) increased          -> new shuffle
  - broadcast joins (bhj) decreased     -> a broadcast fell back to SMJ
  - sort-merge joins (smj) increased    -> same, from the other side
  - parquet scans (scans) increased     -> lost scan/exchange reuse
  - pushed-filter scans (pushed) decreased -> a predicate no longer
    reaches the parquet reader
  - any red flag (cartesian, bnlj, onepart_window) newly non-zero
  - a query erroring that didn't, or disappearing entirely

Improvements (fewer exchanges, more broadcasts) pass with a note; run
with --update to re-baseline after intentional plan changes.

Usage:
  sbt -batch "runMain graft.Explain json" 2>/dev/null | grep PLANJSON > /tmp/plan.txt
  python3 tools/plan_gate.py /tmp/plan.txt            # gate
  python3 tools/plan_gate.py /tmp/plan.txt --update   # re-baseline
"""
import json
import os
import sys

REF = os.path.join(os.path.dirname(__file__), "..", "plan_ref.json")
RED_FLAGS = ("cartesian", "bnlj", "onepart_window")
# higher is worse / lower is worse
WORSE_UP = ("exch", "smj", "scans")
WORSE_DOWN = ("bhj", "pushed")


def load_current(path):
    with open(path) as f:
        for line in f:
            # sbt prefixes stdout with "[info] "
            idx = line.find("PLANJSON ")
            if idx >= 0:
                return json.loads(line[idx + len("PLANJSON "):])
            if line.strip().startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no PLANJSON line found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    if len(args) != 1:
        raise SystemExit(__doc__)
    cur = load_current(args[0])

    if update or not os.path.exists(REF):
        with open(REF, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"plan_gate: baseline written ({len(cur)} queries) -> {REF}")
        return

    with open(REF) as f:
        ref = json.load(f)

    trips, notes = [], []
    for name, r in sorted(ref.items()):
        c = cur.get(name)
        if c is None:
            trips.append(f"{name}: query disappeared")
            continue
        if "error" in c:
            if "error" in r:
                continue
            trips.append(f"{name}: now errors: {c['error']}")
            continue
        if "error" in r:
            notes.append(f"{name}: previously errored, now plans")
            continue
        for k in WORSE_UP:
            if c.get(k, 0) > r.get(k, 0):
                trips.append(f"{name}: {k} {r.get(k, 0)} -> {c.get(k, 0)}")
            elif c.get(k, 0) < r.get(k, 0):
                notes.append(f"{name}: {k} {r.get(k, 0)} -> {c.get(k, 0)} (improved)")
        for k in WORSE_DOWN:
            if c.get(k, 0) < r.get(k, 0):
                trips.append(f"{name}: {k} {r.get(k, 0)} -> {c.get(k, 0)}")
            elif c.get(k, 0) > r.get(k, 0):
                notes.append(f"{name}: {k} {r.get(k, 0)} -> {c.get(k, 0)} (improved)")
        for k in RED_FLAGS:
            if c.get(k, 0) > 0 and r.get(k, 0) == 0:
                trips.append(f"{name}: red flag {k}={c[k]}")
    for name in sorted(set(cur) - set(ref)):
        notes.append(f"{name}: new query (not in baseline; --update to adopt)")

    for n in notes:
        print(f"plan_gate NOTE  {n}")
    for t in trips:
        print(f"plan_gate TRIP  {t}")
    print(f"plan_gate: {len(ref)} baselined, {len(trips)} trips, "
          f"{len(notes)} notes")
    if trips:
        sys.exit(1)


if __name__ == "__main__":
    main()
