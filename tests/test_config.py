import yaml

from tokensgen_tpu.utils.config import (
    Config, create_output_folders, input_items, load_config, merge,
)


def test_load_and_attribute_access(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  b: two\n  deep:\n    c: 3.0\n")
    cfg = load_config(str(p))
    assert cfg.a == 1
    assert cfg.nested.b == "two"
    assert cfg.get_path("nested.deep.c") == 3.0
    assert cfg.get_path("missing.path", "dflt") == "dflt"


def test_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  b: 2\n")
    cfg = load_config(str(p), overrides={"nested.b": 9, "new.x": 5})
    assert cfg.nested.b == 9
    assert cfg.new.x == 5


def test_merge_nested():
    base = {"a": 1, "n": {"x": 1, "y": 2}}
    out = merge(base, {"n": {"y": 3}, "b": 4})
    assert out.n.x == 1 and out.n.y == 3 and out.b == 4
    assert base["n"]["y"] == 2  # base untouched


def test_input_items_public_merge(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "input_config": {
            "public": {"fps": 10, "res": [480, 720]},
            "item_a": {"prompt": "hi", "params": {"fps": 24}},
            "item_b": {"prompt": "yo", "video": "v.mp4"},
        }
    }))
    items = input_items(load_config(str(p)))
    by_name = {it["name"]: it for it in items}
    assert by_name["item_a"]["fps"] == 24  # item param overrides public
    assert by_name["item_a"]["res"] == [480, 720]
    assert by_name["item_b"]["fps"] == 10
    assert by_name["item_b"]["video"] == "v.mp4"
    assert by_name["item_a"]["prompt"] == "hi"


def test_input_items_external_json(tmp_path):
    """`input_config.input_json` loads extra items from a JSON file that
    extend/override the in-config ones (`infer_cogvideo_mp_fifo.py:238-242`)."""
    import json

    j = tmp_path / "items.json"
    j.write_text(json.dumps({"input_config": {
        "item_b": {"prompt": "override", "params": {"fps": 30}},
        "item_c": {"prompt": "new", "video": "c.mp4"},
    }}))
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "input_config": {
            "public": {"fps": 10},
            "input_json": str(j),
            "item_a": {"prompt": "hi"},
            "item_b": {"prompt": "old"},
        }
    }))
    items = input_items(load_config(str(p)))
    by_name = {it["name"]: it for it in items}
    assert set(by_name) == {"item_a", "item_b", "item_c"}
    assert by_name["item_b"]["prompt"] == "override"
    assert by_name["item_b"]["fps"] == 30
    assert by_name["item_c"]["video"] == "c.mp4"
    assert by_name["item_a"]["fps"] == 10  # public still applies


def test_create_output_folders_archives_config(tmp_path):
    import os

    p = tmp_path / "c.yaml"
    p.write_text("a: 1\n")
    run = create_output_folders(str(tmp_path / "out"), "test", str(p))
    assert os.path.exists(os.path.join(run, "config.yaml"))
