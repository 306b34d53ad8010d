"""CLI parity with the reference's `aira tiffdump`
(/root/reference/crates/aira-cli/src/cmd/tiffdump.rs:10-12):

    python -m aira_spark tiffdump [--json] [--max N] FILE...

Dumps every IFD of every file — terminal form by default, JSON lines with
--json. Runs on the pure-Python decode core (no Spark session needed for
local files; the distributed form is operators/tiffdump.ifd_entries).
"""

from __future__ import annotations

import argparse
import json
import sys


def tiffdump(argv: list[str]) -> int:
    from .operators.tiffdump import _dump_rows

    ap = argparse.ArgumentParser(prog="aira_spark tiffdump")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    ap.add_argument("--max", type=int, default=10, help="max items per value")
    args = ap.parse_args(argv)

    status = 0
    for path in args.files:
        try:
            with open(path, "rb") as f:
                buf = f.read()
        except OSError as exc:
            print(f"{path}: {exc}", file=sys.stderr)
            status = 1
            continue
        rows = _dump_rows(path, buf, args.max)
        if args.json:
            for r in rows:
                print(json.dumps(r))
            continue
        last = None
        for r in rows:
            if r["error"] and r["tag"] is None:
                print(f"{path}: error: {r['error']}", file=sys.stderr)
                status = 1
                continue
            if r["page"] != last:
                print(f"== {path} directory {r['page']} ==")
                last = r["page"]
            print(
                f"  {r['tag_name']} ({r['tag']}) "
                f"{r['dtype_name']}[{r['count']}] = {r['value']}"
            )
    return status


def main() -> int:
    ap = argparse.ArgumentParser(prog="aira_spark")
    ap.add_argument("command", choices=["tiffdump"])
    args, rest = ap.parse_known_args()
    if args.command == "tiffdump":
        return tiffdump(rest)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
