"""Bench-artifact self-check (r16, VERDICT r15 item 6).

``BENCH_r14.json`` carried ``parsed: null`` — the driver could not
``json.loads`` the artifact's JSON line, which silently cost the whole
round-over-round PERF comparison (every prev column null).  This script
protects the contract: run ``bench.py`` exactly as the driver does,
capture stdout, and assert

- the LAST stdout line round-trips through ``json.loads``;
- the required contract keys are present with the right types;
- nothing prints to stdout after the JSON line (trailing output is what
  truncated-tail capture can destroy).

Run it before closing a round (it executes a full bench pass, so give
it a quiet host); a fast syntax-only mode that replays an EXISTING
artifact's ``tail`` field is available via ``--artifact``.

Usage:
  python scripts/check_bench_json.py              # full bench + check
  python scripts/check_bench_json.py --artifact BENCH_r15.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUIRED = {
    "metric": str,
    "value": (int, float),
    "unit": str,
    "queries": dict,
    "sf": (int, float),
}


def check_line(line: str) -> dict:
    obj = json.loads(line)
    for key, typ in REQUIRED.items():
        if key not in obj:
            raise AssertionError(f"bench JSON missing required key {key!r}")
        if not isinstance(obj[key], typ):
            raise AssertionError(
                f"bench JSON key {key!r} has type {type(obj[key]).__name__}, "
                f"expected {typ}")
    if obj["unit"] != "sec":
        raise AssertionError(f'unit must be "sec", got {obj["unit"]!r}')
    for name, sec in obj["queries"].items():
        if not isinstance(sec, (int, float)):
            raise AssertionError(f"queries[{name!r}] is not a number: {sec!r}")
    return obj


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--artifact":
        with open(os.path.join(REPO, sys.argv[2])) as f:
            art = json.load(f)
        # the driver stores the raw captured tail; the JSON line must be
        # its last non-empty line
        tail = art.get("tail", "")
        lines = [ln for ln in tail.splitlines() if ln.strip()]
        if not lines:
            raise AssertionError("artifact tail is empty")
        # the tail may clip the line's HEAD (fixed-size capture), so for
        # artifact mode only verify the driver itself parsed it
        if art.get("parsed") is None:
            raise AssertionError(
                "artifact parsed=null — the driver failed to json.loads the "
                "bench stdout (the r14 failure); re-run the bench and check "
                "live with no --artifact")
        print(json.dumps({"artifact": sys.argv[2], "ok": True,
                          "value": art["parsed"].get("value")}))
        return

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=dict(os.environ), timeout=7200,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise AssertionError(f"bench.py exited {proc.returncode}")
    out_lines = proc.stdout.splitlines()
    non_empty = [ln for ln in out_lines if ln.strip()]
    if not non_empty:
        raise AssertionError("bench.py printed nothing to stdout")
    last = non_empty[-1]
    if out_lines and out_lines[-1].strip() and out_lines[-1] != last:
        raise AssertionError("trailing stdout after the JSON line")
    obj = check_line(last)
    # the whole point of the one-line contract: the line IS the artifact
    if len(non_empty) != 1:
        sys.stderr.write(
            f"WARNING: {len(non_empty) - 1} extra stdout line(s) before the "
            "JSON line — a tail-capture window could clip the artifact\n")
    print(json.dumps({"ok": True, "value": obj["value"],
                      "n_queries": len(obj["queries"]),
                      "extra_stdout_lines": len(non_empty) - 1}))


if __name__ == "__main__":
    main()
