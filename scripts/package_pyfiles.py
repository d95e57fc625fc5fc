"""Build dist/engine.zip for spark-submit --py-files distribution."""

from __future__ import annotations

import os
import zipfile


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "embulk_filter_expand_json_spark")
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".pyc"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, repo))
    print(out)


if __name__ == "__main__":
    main()
