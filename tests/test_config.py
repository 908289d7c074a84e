import yaml

from ovo_tpu.config import load_config, update_recursive


def test_update_recursive_merges_nested():
    dst = {"a": {"x": 1, "y": 2}, "b": 3}
    update_recursive(dst, {"a": {"y": 20, "z": 30}, "c": 4})
    assert dst == {"a": {"x": 1, "y": 20, "z": 30}, "b": 3, "c": 4}


def test_update_recursive_overwrites_non_dict():
    dst = {"a": [1, 2]}
    update_recursive(dst, {"a": [3]})
    assert dst == {"a": [3]}


def test_load_config_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    base.write_text(yaml.safe_dump({"m": {"a": 1, "b": 2}, "top": "base"}))
    child.write_text(yaml.safe_dump(
        {"inherit_from": str(base), "m": {"b": 22}, "extra": True}))
    cfg = load_config(child)
    assert cfg["m"] == {"a": 1, "b": 22}
    assert cfg["top"] == "base"
    assert cfg["extra"] is True


def test_load_config_inherit_relative(tmp_path):
    (tmp_path / "base.yaml").write_text(yaml.safe_dump({"v": 1}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({"inherit_from": "base.yaml", "w": 2}))
    cfg = load_config(child)
    assert cfg == {"inherit_from": "base.yaml", "v": 1, "w": 2}
