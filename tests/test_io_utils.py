"""utils/io.py parity helpers (reference utils/io.py + printing.py)."""
import pytest

from sdfstudio_tpu.utils.io import human_format, load_from_json, write_to_json


def test_json_roundtrip(tmp_path):
    p = tmp_path / "x.json"
    write_to_json(p, {"a": 1, "b": [1, 2]})
    assert load_from_json(p) == {"a": 1, "b": [1, 2]}


def test_json_suffix_guard(tmp_path):
    with pytest.raises(AssertionError):
        write_to_json(tmp_path / "x.txt", {})


def test_human_format():
    assert human_format(1_234_567) == "1.23 M"
    assert human_format(999) == "999.00 "
    assert human_format(12_500) == "12.50 K"
    assert human_format(0) == "0.00 "
