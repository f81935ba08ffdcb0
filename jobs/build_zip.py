"""L4 — package the engine for `spark-submit --py-files engine.zip`.

    python -m jobs.build_zip [--out engine.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGES = ("engine", "oracle")


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in PACKAGES:
            for dirpath, _dirs, files in os.walk(os.path.join(REPO, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for fn in files:
                    if fn.endswith((".py", ".json")):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "engine.zip"))
    args = ap.parse_args()
    print(build(args.out))
