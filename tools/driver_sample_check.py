"""Run the STRICT local mirror (tools/check_correctness.py) on exactly
the query names the driver sampled in its latest CORRECTNESS_r*.json —
so each round's record shows mirror-vs-driver agreement per query.

Usage: python tools/driver_sample_check.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_correctness_file() -> str:
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json found")
    return max(files, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def main() -> int:
    path = latest_correctness_file()
    names = list(json.load(open(path)))
    print(f"# driver sample: {len(names)} queries from {os.path.basename(path)}")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.argv = [sys.argv[0], sf_dir, *names]
    import check_correctness

    return check_correctness.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
