#!/usr/bin/env python3
"""Re-pin BENCH.pin.json from a fresh quiet-host Bench artifact
(builder-side tool). Usage: repin.py <bench_out.json> [note] [round]

Applies the BASELINE.md protocol mechanically: the current pin is
appended to `history` (with its stamps and protocol), `value` /
`n_queries` / `queries` / load stamps are replaced by the new run's
medians, and the protocol string is refreshed. Refuses a contended or
failed run.
"""
import json, sys

src = json.load(open(sys.argv[1]))
note = sys.argv[2] if len(sys.argv) > 2 else ""
assert not src.get("contended"), "refusing to pin a contended run"
assert not src.get("failed"), f"refusing to pin with failures: {src['failed']}"
assert src.get("runs", 0) >= 3, "pin protocol requires >= 3 runs"

pin = json.load(open("BENCH.pin.json"))
old = {k: v for k, v in pin.items() if k != "history"}
history = pin.get("history", [])
history.append(old)

queries = src["queries"]
total = round(sum(queries.values()), 3)
new = {
    "metric": "pin",
    "value": total,
    "unit": "sec",
    "runs": src["runs"],
    "cpus": src["cpus"],
    "load_pre": src["load_pre"],
    "load_post": src["load_post"],
    "contended": False,
    "isolated": False,
    "failed": 0,
    "sf": src["sf"],
    "pinned_round": int(sys.argv[3]) if len(sys.argv) > 3
                    else pin["pinned_round"],
    "n_queries": len(queries),
    "protocol": (
        "per-query median of %d (SPARK_GRAFT_BENCH_RUNS), local[%d], "
        "shuffle.partitions=%d, noop-sink full materialization; quiet "
        "host (load_pre %s on %d cpus, contended=false). %s The "
        "operative per-query medians are the `queries` field (sum == "
        "value). The 2x gate denominator is floored at "
        "max(noise_envelope_sec) per BASELINE.md."
        % (src["runs"], src["cpus"], src["cpus"], src["load_pre"],
           src["cpus"], note)
    ).strip(),
    "noise_envelope_sec": pin["noise_envelope_sec"],
    "noise_note": pin["noise_note"],
    "queries": {k: round(v, 3) for k, v in sorted(queries.items())},
    "history": history,
}
# the raw rep arrays (round 15+): rep spread is the first line of
# adjudication evidence per BASELINE.md, so the pin carries it too
if "reps" in src:
    new["reps"] = {k: src["reps"][k] for k in sorted(src["reps"])}
json.dump(new, open("BENCH.pin.json", "w"))
print(f"pinned {total} s over {len(queries)} queries "
      f"(was {old['value']} over {old['n_queries']})")
