#!/usr/bin/env python3
"""Merge a controlled graft.Bench run into BENCH_REF.json.

Usage: merge_bench_ref.py <bench_jsonl> [--replace gate1,gate2,...]

Reads the {"metric":"total",...} line (per-query best-of-iterations)
from the bench output, then:
  - gates listed in --replace take the NEW value verbatim (baseline
    refresh for entries known to be stale/unreproducible);
  - gates missing from BENCH_REF are added (baseline backfill);
  - every other gate keeps min(old, new), EXCEPT that an improvement
    larger than 40% is held back and reported instead of merged: a
    one-off lucky sample must not ratchet the baseline to a number no
    honest re-run can reproduce (round-9 lesson: pack_sequences
    ratcheted 0.33→0.17 on one run, flagging every later round as a
    2× "regression"). A genuine optimization that big deserves an
    explicit, documented --replace.
Rewrites BENCH_REF.json in place with the updated total.
"""
import json
import sys

args = sys.argv[1:]
replace = set()
if "--replace" in args:
    i = args.index("--replace")
    replace = set(args[i + 1].split(","))
    del args[i:i + 2]
bench_path = args[0]

total_line = None
for line in open(bench_path):
    line = line.strip()
    if line.startswith('{"metric":"total"'):
        total_line = json.loads(line)
if total_line is None:
    sys.exit("no total line found in " + bench_path)
if total_line.get("stat") != "min":
    sys.exit("bench output is not min-stat; refusing to merge")

ref = json.load(open("BENCH_REF.json"))
if ref.get("sf") != total_line.get("sf"):
    sys.exit(f"sf mismatch: ref={ref.get('sf')} bench={total_line.get('sf')}")

new = total_line["queries"]
old = ref["queries"]
added, refreshed, improved, held = [], [], [], []
for k, v in new.items():
    if k in replace:
        if k in old and abs(old[k] - v) > 1e-9:
            refreshed.append((k, old.get(k), v))
        old[k] = round(v, 4)
    elif k not in old:
        old[k] = round(v, 4)
        added.append(k)
    elif v < old[k]:
        if v < 0.6 * old[k] and old[k] - v > 0.05:
            held.append((k, old[k], v))  # suspicious lucky sample
        else:
            improved.append((k, old[k], v))
            old[k] = round(v, 4)

ref["queries"] = dict(sorted(old.items()))
ref["total"] = round(sum(old.values()), 4)
json.dump(ref, open("BENCH_REF.json", "w"), indent=1)
print(f"added {len(added)}: {sorted(added)}")
print(f"refreshed {len(refreshed)}: {refreshed}")
print(f"improved {len(improved)}: {improved}")
if held:
    print(f"HELD {len(held)} (>40% drop — re-run controlled and use "
          f"--replace if real): {held}")
    # Persist held gates to a sidecar so the "re-run controlled and
    # --replace" follow-up survives the terminal session instead of
    # dying with the scrollback. Append-only, one record per merge.
    import datetime
    with open("BENCH_REF_HELD.jsonl", "a") as f:
        f.write(json.dumps({
            "when": datetime.datetime.now(datetime.timezone.utc)
                .strftime("%Y-%m-%dT%H:%M:%SZ"),
            "source": bench_path,
            "held": [{"gate": k, "ref": o, "observed": v}
                     for k, o, v in held],
        }) + "\n")
    print("held gates appended to BENCH_REF_HELD.jsonl")
print(f"now {len(old)} gates, total {ref['total']}")
