"""Per-method scan-K table (engine/safe_k.py): probe results round-trip
and drive auto steps_per_call resolution (docs/tpu-design.md scan-K fault)."""
import json

from sdfstudio_tpu.engine import safe_k


def test_table_ships_verified_entries():
    table = safe_k.load_table()
    # probe-verified deployment facts (commit 1dff0b0 / docs/tpu-design.md)
    assert table["neus-facto-tpu"] == 25
    # round 5: the K>=16 full-step fault stopped reproducing after the
    # searchsorted comparison-count rewrite (scan_fault_repro --k 25:
    # full=ok), so neus-facto was raised to 25 on run-verified evidence
    assert table["neus-facto"] == 25
    assert table["neus-facto-tpu-p8"] == 25  # verified by the 20k arm
    assert table["neusW"] == 10  # verified by the 20k heritage run
    assert all(isinstance(v, int) and v >= 1 for v in table.values())


def test_record_roundtrip(tmp_path, monkeypatch):
    p = tmp_path / "safe_k.json"
    monkeypatch.setattr(safe_k, "TABLE_PATH", p)
    safe_k.record("mymethod", 7)
    assert safe_k.lookup("mymethod") == 7
    assert safe_k.lookup("unprobed") == 0
    safe_k.record("mymethod", 12)  # update in place
    assert json.loads(p.read_text())["mymethod"] == 12


def test_underscore_keys_ignored(tmp_path, monkeypatch):
    p = tmp_path / "safe_k.json"
    p.write_text('{"_source": "comment", "m": 3}')
    monkeypatch.setattr(safe_k, "TABLE_PATH", p)
    assert safe_k.load_table() == {"m": 3}
