"""Input/output + console formatting utilities.

Functional spec: reference nerfstudio/utils/io.py:23-43 (JSON helpers) and
nerfstudio/utils/printing.py:36-45 (human_format). The reference's rich
console wrappers collapse to plain prints here (no rich dependency in the
hermetic image); status banners are one-line prefixed prints so logs stay
greppable on headless TPU runs.
"""
from __future__ import annotations

import json
from math import floor, log
from pathlib import Path
from typing import Any, Dict


def load_from_json(filename: Path) -> Dict[str, Any]:
    """Load a dictionary from a ``.json`` file (reference io.py:23-31)."""
    filename = Path(filename)
    assert filename.suffix == ".json", f"not a .json file: {filename}"
    with open(filename, encoding="UTF-8") as file:
        return json.load(file)


def write_to_json(filename: Path, content: dict) -> None:
    """Write a dictionary to a ``.json`` file (reference io.py:34-43)."""
    filename = Path(filename)
    assert filename.suffix == ".json", f"not a .json file: {filename}"
    with open(filename, "w", encoding="UTF-8") as file:
        json.dump(content, file)


def human_format(num: float) -> str:
    """1234567 -> '1.23 M' (reference printing.py:36-45)."""
    if num == 0:
        return "0.00 "
    units = ["", "K", "M", "B", "T", "P"]
    k = 1000.0
    magnitude = min(int(floor(log(abs(num), k))), len(units) - 1)
    magnitude = max(magnitude, 0)
    return f"{(num / k**magnitude):.2f} {units[magnitude]}"


def status(message: str, tag: str = "sdfstudio-tpu") -> None:
    """One-line status banner (the reference uses rich CONSOLE.print)."""
    print(f"[{tag}] {message}", flush=True)
