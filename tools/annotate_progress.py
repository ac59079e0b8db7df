#!/usr/bin/env python3
"""Idempotently annotate PROGRESS.jsonl lines with a `session` field.

The driver appends one line per heartbeat with a `wall_s` that counts from
the start of the CURRENT builder session — so a `wall_s` decrease marks a
session boundary. This derives a 1-based session number from those resets
and rewrites the file with the field added (lines that already carry
`session` keep it verbatim). Run from the repo root; safe to re-run after
the driver appends more lines.
"""
import json
import os
import sys

PATH = os.path.join(os.path.dirname(__file__), "..", "PROGRESS.jsonl")


def main() -> int:
    with open(PATH) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    session = 1
    prev_wall = None
    changed = 0
    for d in lines:
        if prev_wall is not None and d["wall_s"] < prev_wall:
            session += 1
        prev_wall = d["wall_s"]
        if "session" not in d:
            d["session"] = session
            changed += 1
        else:
            # trust existing labels, and keep numbering continuous from them
            session = d["session"]
    if changed:
        tmp = PATH + ".tmp"
        with open(tmp, "w") as f:
            for d in lines:
                f.write(json.dumps(d) + "\n")
        os.replace(tmp, PATH)
    print(f"annotated {changed} of {len(lines)} lines; last session={session}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
