"""Per-image annotation count statistics for a YOLO label folder.

Capability parity with reference tools/find_max_annotations.py (and its
import consumer viz_annotations.py): reports max/mean counts and the top
images, and exposes ``find_max_annotations()`` for reuse.

Usage:
  python tools/find_max_annotations.py LABELS_DIR [--top 10]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from _common import *  # noqa: F401,F403

from geotrax_tpu.train.data import load_label  # noqa: E402


def find_max_annotations(labels_dir: Path, top_n: int | None = None,
                         types: list | None = None) -> list:
    """[(count, label_path)] sorted descending. ``types`` restricts the count
    to the given class ids (reference viz_annotations.py ranks respecting
    --type); ``top_n`` truncates the result."""
    counts = []
    for p in sorted(Path(labels_dir).rglob("*.txt")):
        labels = load_label(p)
        if types is not None and len(labels):
            labels = labels[[int(c) in set(types) for c in labels[:, 0]]]
        counts.append((len(labels), p))
    counts.sort(key=lambda t: -t[0])
    return counts[:top_n] if top_n else counts


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("labels", type=Path)
    parser.add_argument("--top", type=int, default=10)
    args = parser.parse_args()

    counts = find_max_annotations(args.labels)
    if not counts:
        print("No label files found.")
        return 1
    values = [c for c, _ in counts]
    print(f"{len(values)} label files; max {values[0]}, mean {sum(values) / len(values):.1f}")
    for count, path in counts[: args.top]:
        print(f"  {count:>5}  {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
