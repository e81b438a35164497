"""Build an MC-OCR-style ``annotation.txt`` from a rec_lines output tree.

The text-line generator (`generator/rec_lines.py`) writes VietOCR-style
pairs (``part_NNN/<i>.jpg`` + ``<i>.txt``). The rec evaluation CLI and the
holdout-training queue consume MC-OCR annotation files
(``filename<TAB>label`` — reference format: `/root/reference/src/rec2/
dataset.py` annotation loader). This tool bridges the two so any
generated corpus doubles as an eval split:

  python tools/make_annotation.py data/rec_hold_val
"""

from __future__ import annotations

import sys
from pathlib import Path


def build(root: Path) -> int:
    rows = []
    for txt in sorted(root.glob("part_*/**/*.txt")) + sorted(root.glob("part_*/*.txt")):
        img = txt.with_suffix(".jpg")
        if not img.exists():
            continue
        label = txt.read_text(encoding="utf-8").strip()
        if not label or "\t" in label:
            continue
        rows.append(f"{img.relative_to(root)}\t{label}")
    # dedupe while keeping order (the two globs can overlap)
    seen, out = set(), []
    for r in rows:
        if r not in seen:
            seen.add(r)
            out.append(r)
    (root / "annotation.txt").write_text("\n".join(out) + "\n", encoding="utf-8")
    return len(out)


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: make_annotation.py DIR [DIR...]")
        return 2
    for d in args:
        n = build(Path(d))
        print(f"{d}: {n} entries -> annotation.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
