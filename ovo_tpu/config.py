"""Config system: YAML tree with ``inherit_from`` recursion + deep merge.

Behavior parity with the reference's config loader
(/root/reference/ovo/utils/io_utils.py:13-61): a config file may name a parent
via ``inherit_from``; parents load first and children deep-merge on top.
Merge rule: dict values merge recursively, everything else overwrites.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import yaml


def update_recursive(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    """Deep-merge ``src`` into ``dst`` in place (dicts merge, leaves overwrite)."""
    for key, value in src.items():
        if isinstance(value, dict):
            node = dst.get(key)
            if not isinstance(node, dict):
                node = {}
                dst[key] = node
            update_recursive(node, value)
        else:
            dst[key] = value


def load_config(path: str | Path, default_path: Optional[str | Path] = None,
                inherit: bool = True) -> Dict[str, Any]:
    """Load a YAML config, resolving ``inherit_from`` chains (child wins)."""
    path = Path(path)
    with open(path, "r") as f:
        cfg_special = yaml.safe_load(f) or {}
    cfg: Dict[str, Any] = {}
    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None and inherit:
        parent = Path(inherit_from)
        if not parent.is_absolute() and not parent.exists():
            # Allow parent paths relative to the child config's directory
            # or to the repo root (reference configs use repo-root-relative
            # inherit_from, but our CLI may run from any cwd).
            for base in (path.parent, Path(__file__).resolve().parents[1]):
                candidate = base / parent
                if candidate.exists():
                    parent = candidate
                    break
        cfg = load_config(parent, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.safe_load(f) or {}
    update_recursive(cfg, cfg_special)
    return cfg


def save_config(cfg: Dict[str, Any], path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def assemble_run_config(config_root: str | Path, dataset: str, scene: str,
                        overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Layered config assembly with the reference's precedence
    (/root/reference/run_eval.py:64-94):

    base ovo.yaml <- slam/<module>/<dataset>.yaml <- <Dataset>/<dataset>.yaml
    <- optional <Dataset>/<scene>.yaml <- overrides.
    """
    root = Path(config_root)
    cfg = load_config(root / "ovo.yaml")

    map_module = cfg["slam"]["slam_module"]
    if overrides:  # an overridden module must select its slam layer too
        map_module = overrides.get("slam", {}).get("slam_module", map_module)
    is_orb = map_module.startswith("orbslam")
    if is_orb:
        map_module = "vanilla"  # orbslam reuses the vanilla mapping params
    slam_cfg_path = root / "slam" / map_module / f"{dataset.lower()}.yaml"
    if slam_cfg_path.exists():
        update_recursive(cfg, load_config(slam_cfg_path))
    if is_orb:
        # ORB tracker gates layered per dataset and (optionally) per scene,
        # mirroring the reference's per-scene orbslam2 yamls
        # (/root/reference/data/working/configs/slam/orbslam2/,
        # orbslam.py:28-34): scene-tuned thresholds are how the reference
        # keeps ORB stable across ScanNet scenes
        orb_ds = root / "slam" / "orbslam" / f"{dataset.lower()}.yaml"
        if orb_ds.exists():
            update_recursive(cfg, load_config(orb_ds))
        orb_scene = root / "slam" / "orbslam" / dataset.lower() / \
            f"{scene}.yaml"
        if orb_scene.exists():
            update_recursive(cfg, load_config(orb_scene))

    ds_cfg_path = root / dataset / f"{dataset.lower()}.yaml"
    if ds_cfg_path.exists():
        update_recursive(cfg, load_config(ds_cfg_path))

    scene_cfg_path = root / dataset / f"{scene}.yaml"
    if scene_cfg_path.exists():
        update_recursive(cfg, load_config(scene_cfg_path))

    cfg.setdefault("data", {})
    cfg["data"]["scene_name"] = scene
    if overrides:
        update_recursive(cfg, overrides)
    return cfg
