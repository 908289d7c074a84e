"""Run logger with the reference's stat names and file layout
(/root/reference/ovo/entities/logger.py:9-107).

Stats: frame_id, t_sam, t_obj, n_obj, n_matches, t_up, t_seg, t_clip,
avg_fps, ram, vram, spf -- one ``<key>.log`` text file each under
``<output>/logger/``. ``vram`` reports live-buffer bytes on the first jax
device (the TPU analogue of ``torch.cuda.memory_allocated``). wandb is
optional and gated (not installed in this image).
"""
from __future__ import annotations

import pprint
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None

try:
    import wandb  # noqa: F401

    _HAS_WANDB = True
except ImportError:
    _HAS_WANDB = False

STAT_KEYS = ["frame_id", "t_sam", "t_obj", "n_obj", "n_matches", "t_up",
             "t_seg", "t_clip", "avg_fps", "ram", "vram", "spf"]


def _device_bytes_in_use() -> float:
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"]
    except Exception:
        pass
    return 0.0


class Logger:
    def __init__(self, output_path: str | Path, pid: Optional[int] = None,
                 use_wandb: bool = False) -> None:
        self.output_path = Path(output_path)
        (self.output_path / "logger").mkdir(exist_ok=True, parents=True)
        self.stats: Dict[str, list] = {key: [] for key in STAT_KEYS}
        self.process = psutil.Process(pid) if psutil is not None else None
        self.use_wandb = use_wandb and _HAS_WANDB

    def log_ovo_stats(self, stats: Dict[str, Any], print_output: bool = False) -> None:
        for key, item in stats.items():
            self.stats.setdefault(key, []).append(item)
        if self.use_wandb:
            import wandb

            wandb.log({f"Semantic/{k}": v for k, v in stats.items()
                       if not isinstance(v, list)})
        if print_output:
            pprint.pprint(stats, width=160, compact=True)

    def log_fps(self, avg_fps: float) -> None:
        self.stats["avg_fps"].append(avg_fps)
        if self.use_wandb:
            import wandb

            wandb.log({"Semantic/avg_fps": avg_fps})

    def log_spf(self, spf) -> None:
        self.stats["spf"].append(spf)

    def log_memory_usage(self, frame_id: int) -> None:
        vram = _device_bytes_in_use() / (1000 ** 3)
        ram = (self.process.memory_info().rss / (1000 ** 3)) if self.process else 0.0
        self.stats["vram"].append(vram)
        self.stats["ram"].append(ram)
        if self.use_wandb:
            import wandb

            wandb.log({"Semantic/Frame": frame_id, "Semantic/vram": vram,
                       "Semantic/ram": ram})

    def log_max_memory_usage(self) -> None:
        self.stats["max_vram"] = [max(self.stats["vram"], default=0.0)]
        self.stats["max_ram"] = [max(self.stats["ram"], default=0.0)]

    def write_stats(self) -> None:
        for key, stat in self.stats.items():
            if key == "n_obj":
                continue
            with open(self.output_path / "logger" / f"{key}.log", "w") as f:
                f.write("\n".join(str(i) for i in stat))

    def print_final_stats(self) -> None:
        summary = {}
        for key, stat in self.stats.items():
            if key in ("frame_id", "max_vram", "max_ram") or not stat:
                continue
            try:
                summary[f"Avg {key}"] = float(np.mean(np.asarray(stat, dtype=float)).round(3))
            except (TypeError, ValueError):
                continue
        if self.stats.get("max_ram"):
            summary["Max RAM"] = round(self.stats["max_ram"][0], 2)
            summary["Max vRAM"] = round(self.stats["max_vram"][0], 2)
        print("Final statistics:")
        pprint.pprint(summary, compact=True)
