"""Dev harness: compare md/itxt output against every reference HTML golden.

Run: python tests/golden_compare.py [fixture_name] [--diff]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_plus_spark.html import convert_html  # noqa: E402

HTML_DIR = Path("/root/reference/docling/tests/data/html")
GOLD_DIR = Path("/root/reference/docling/tests/data/groundtruth/docling_v2")


def compare(name: str, show_diff: bool = False) -> dict:
    data = (HTML_DIR / f"{name}.html").read_bytes()
    doc = convert_html(data, name=name, filename=f"{name}.html")
    results = {}
    for ext, render in (("md", doc.export_to_markdown), ("itxt", doc.export_to_element_tree), ("json", doc.export_to_json)):
        gold_path = GOLD_DIR / f"{name}.html.{ext}"
        if not gold_path.exists():
            results[ext] = None
            continue
        gold = gold_path.read_text()
        ours = render()
        results[ext] = gold == ours
        if show_diff and gold != ours:
            import difflib

            print(f"===== {name}.{ext} =====")
            diff = list(
                difflib.unified_diff(
                    gold.splitlines(), ours.splitlines(), "gold", "ours", lineterm=""
                )
            )
            print("\n".join(diff[:120]))
    return results


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_diff = "--diff" in sys.argv
    names = args or sorted(p.stem for p in HTML_DIR.glob("*.html"))
    ok = 0
    total = 0
    for name in names:
        try:
            res = compare(name, show_diff)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR: {type(exc).__name__}: {exc}")
            total += 2
            continue
        for ext in ("md", "itxt", "json"):
            if res.get(ext) is None:
                continue
            total += 1
            ok += bool(res[ext])
        status = " ".join(
            f"{ext}={'OK' if res.get(ext) else 'X' if res.get(ext) is not None else '-'}"
            for ext in ("md", "itxt", "json")
        )
        print(f"{name:32s} {status}")
    print(f"\n{ok}/{total} artifacts byte-identical")


if __name__ == "__main__":
    main()
