#!/usr/bin/env python3
"""Annotate PROGRESS.jsonl with a derived `generation` marker.

PROGRESS.jsonl is appended by the round driver; its `wall_s` counter
resets whenever the tracker restarts mid-round, which breaks
monotonicity for any consumer that assumes a single clock (the r6/r7
review item). The tracker's schema is not ours to change, so this
script derives the missing fields deterministically on the consumer
side:

  generation   int   increments every time wall_s decreases vs the
                     previous entry (a tracker restart)
  cum_wall_s   float monotonic continuation: the sum of completed
                     generations' final wall_s plus this entry's wall_s

Usage:
  python3 scripts/progress_generations.py [PROGRESS.jsonl]   # annotated JSONL to stdout
  python3 scripts/progress_generations.py --summary [file]   # one line per generation
"""
import json
import sys


def annotate(lines):
    gen, base, prev = 0, 0.0, None
    out = []
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        e = json.loads(ln)
        w = float(e.get("wall_s", 0.0))
        if prev is not None and w < prev:
            gen += 1
            base += prev
        prev = w
        e["generation"] = gen
        e["cum_wall_s"] = round(base + w, 1)
        out.append(e)
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--summary"]
    summary = "--summary" in sys.argv[1:]
    path = args[0] if args else "PROGRESS.jsonl"
    with open(path) as f:
        entries = annotate(f.readlines())
    if summary:
        by_gen = {}
        for e in entries:
            by_gen.setdefault(e["generation"], []).append(e)
        for g, es in sorted(by_gen.items()):
            rounds = sorted({e.get("round") for e in es})
            print(json.dumps({
                "generation": g,
                "entries": len(es),
                "rounds": rounds,
                "wall_s_span": [es[0]["wall_s"], es[-1]["wall_s"]],
                "cum_wall_s_end": es[-1]["cum_wall_s"],
            }))
    else:
        for e in entries:
            print(json.dumps(e))


if __name__ == "__main__":
    main()
