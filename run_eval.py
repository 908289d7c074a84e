#!/usr/bin/env python
"""Three-phase evaluation CLI, flag-compatible with the reference
(/root/reference/run_eval.py:169-181):

  --run      per-scene online mapping -> ovo_map.ckpt
  --segment  label the GT point cloud from the checkpoint
  --eval     confusion-matrix metrics over the labelled scenes

Same config layering, output tree (data/output/<Dataset>/<exp>/<scene>),
checkpoint format and metric definitions as the reference.
"""
from __future__ import annotations

import argparse
import gc
import os
import shutil
import time
from datetime import datetime
from pathlib import Path

import numpy as np
import yaml

from ovo_tpu.config import assemble_run_config
from ovo_tpu.eval.semantics import eval_semantics
from ovo_tpu.eval.transfer import match_labels_to_vtx
from ovo_tpu.mapping.pipeline import OVOSemMap
from ovo_tpu.mapping.semantic import SemanticMapper
from ovo_tpu.utils import io as io_utils
from ovo_tpu.utils.seeding import setup_seed

CONFIG_ROOT = Path(__file__).parent / "configs"


def load_representation(scene_path: Path, eval: bool = False,
                        debug_info: bool = False):
    """Rebuild an eval-only SemanticMapper from a checkpoint
    (reference run_eval.py:19-28)."""
    from ovo_tpu.factory import build_embedder

    config = yaml.safe_load(open(scene_path / "config.yaml"))
    ckpt = io_utils.load_ckpt(scene_path / "ovo_map.ckpt")
    map_params = ckpt.get("map_params") or ckpt["gaussian_params"]
    embedder = build_embedder(config["semantic"])
    ovo = SemanticMapper(config["semantic"], eval=True, embedder=embedder)
    ovo.restore_dict(ckpt["ovo_map_params"], debug_info=debug_info)
    return ovo, map_params


def compute_scene_labels(scene_path: Path, dataset_name: str, scene_name: str,
                         data_path: str, dataset_info: dict) -> None:
    ovo, map_params = load_representation(scene_path, eval=True)
    pcd_pred = np.asarray(map_params["xyz"])
    points_obj_ids = np.asarray(map_params["obj_ids"]).reshape(-1)

    _, pcd_gt = io_utils.load_scene_data(dataset_name, scene_name, data_path,
                                         dataset_info, False)
    classes = (dataset_info["class_names"]
               if dataset_info.get("map_to_reduced") is None
               else dataset_info["class_names_reduced"])
    pred_path = scene_path.parent / dataset_info["dataset"]
    os.makedirs(pred_path, exist_ok=True)

    print("Computing predicted instances labels ...")
    instances_info = ovo.classify_instances(classes)

    print("Matching instances to ground truth mesh ...")
    mesh_ins, mesh_masks, matched_ids = match_labels_to_vtx(
        points_obj_ids, pcd_pred, pcd_gt)
    id_to_idx = {int(i): k for k, i in enumerate(instances_info["ids"])}
    mesh_labels = instances_info["classes"][
        np.vectorize(lambda v: id_to_idx[int(v)])(mesh_ins)]
    instances_info["masks"] = mesh_masks.astype(np.int32)

    out_file = pred_path / f"{scene_name}.txt"
    print(f"Writing prediction to {out_file}!")
    io_utils.write_labels(out_file, mesh_labels)
    io_utils.write_instances(scene_path.parent, scene_name, instances_info)


def run_scene(scene: str, dataset: str, experiment_name: str,
              tmp_run: bool = False, depth_filter=None) -> None:
    config = assemble_run_config(CONFIG_ROOT, dataset, scene)
    config["data"]["input_path"] = f"data/input/Datasets/{dataset}/{scene}"

    output_path = Path(f"data/output/{dataset}/")
    if tmp_run:
        output_path = output_path / "tmp"
    output_path = output_path / experiment_name / scene

    if depth_filter is not None:
        config["semantic"]["depth_filter"] = depth_filter
    if os.getenv("DISABLE_WANDB") == "true":
        config["use_wandb"] = False
    elif config.get("use_wandb"):
        # reference run lifecycle (run_eval.py:96-107): per-scene run with
        # config capture, grouped by scene when an experiment name is given
        import time as _time
        import uuid

        try:
            import wandb
        except ImportError:
            print("[run_eval] use_wandb set but wandb is not installed; "
                  "disabling")
            config["use_wandb"] = False
            wandb = None
        if wandb is not None:
            wandb.init(
                project=config.get("project_name", "ovo-tpu"),
                config=config,
                dir="data/working/output/wandb",
                group=(config["data"]["scene_name"] if experiment_name != ""
                       else experiment_name),
                name=(f'{config["data"]["scene_name"]}_'
                      f'{_time.strftime("%Y%m%d_%H%M%S", _time.localtime())}_'
                      f"{str(uuid.uuid4())[:5]}"),
            )

    setup_seed(config.get("seed", 0))
    sem_map = OVOSemMap(config, output_path=output_path)
    sem_map.run()

    if tmp_run:
        final_path = Path(f"data/output/{dataset}/") / experiment_name / scene
        final_path.parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(output_path), str(final_path))

    if config.get("use_wandb"):
        import wandb

        wandb.finish()  # close the per-scene run (reference :117-118)
    print("Finished run.✨")


def _scene_worker(scene: str, dataset: str, experiment_name: str,
                  tmp_run: bool, device_idx: int, n_devices: int) -> None:
    """One scene in its own process, pinned to one local accelerator chip.
    Scene-level mapping is embarrassingly parallel (SURVEY.md section 2.7);
    on a v5e-8 host this is the multi-scene fan-out of BASELINE config 5."""
    if n_devices > 1:
        os.environ["TPU_VISIBLE_DEVICES"] = str(device_idx)
        os.environ["TPU_PROCESS_BOUNDS"] = "1,1,1"
    t0 = time.time()
    run_scene(scene, dataset, experiment_name, tmp_run=tmp_run)
    print(f"Scene {scene} took: {time.time() - t0:.2f}")


def _run_scenes_parallel(scenes, dataset, experiment_name, tmp_run,
                         n_workers: int) -> None:
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    pending = list(scenes)
    running = []
    slot = 0
    while pending or running:
        while pending and len(running) < n_workers:
            scene = pending.pop(0)
            p = ctx.Process(target=_scene_worker,
                            args=(scene, dataset, experiment_name, tmp_run,
                                  slot % n_workers, n_workers))
            p.start()
            running.append((scene, p))
            slot += 1
        for scene, p in list(running):
            p.join(timeout=1)
            if not p.is_alive():
                running.remove((scene, p))
                if p.exitcode != 0:
                    raise RuntimeError(
                        f"scene {scene} failed (exit {p.exitcode})")


def main(args):
    if args.experiment_name is None:
        experiment_name = datetime.now().strftime("%Y%m%d_%H%M")
        tmp_run = True
    else:
        assert len(args.experiment_name) > 0, "Experiment name cannot be ''"
        experiment_name = args.experiment_name
        tmp_run = False

    experiment_path = Path("data/output") / args.dataset_name / experiment_name

    if args.scenes_list is not None:
        scenes = open(args.scenes_list).read().splitlines()
    else:
        scenes = args.scenes

    dataset_info = None
    if len(scenes) == 0 or args.segment or args.eval:
        info_path = CONFIG_ROOT / args.dataset_name / args.dataset_info_file
        dataset_info = yaml.safe_load(open(info_path))
        if len(scenes) == 0:
            scenes = dataset_info["scenes"]

    input_path = ""
    if args.run and args.parallel_scenes > 1:
        _run_scenes_parallel(scenes, args.dataset_name, experiment_name,
                             tmp_run, args.parallel_scenes)
        input_path = (f"./data/input/Datasets/{args.dataset_name}/"
                      f"{scenes[-1]}" if scenes else "")
    else:
        for scene in scenes:
            input_path = f"./data/input/Datasets/{args.dataset_name}/{scene}"
            if args.run:
                t0 = time.time()
                run_scene(scene, args.dataset_name, experiment_name,
                          tmp_run=tmp_run)
                print(f"Scene {scene} took: {time.time() - t0:.2f}")
            gc.collect()

    if args.segment:
        for scene in scenes:
            compute_scene_labels(experiment_path / scene, args.dataset_name,
                                 scene, "data/input/Datasets/", dataset_info)

    if args.eval:
        if dataset_info["dataset"] == "scannet200":
            gt_path = Path(input_path).parent / "scannet200_gt"
        else:
            gt_path = Path(input_path).parent / "semantic_gt"
        eval_semantics(experiment_path / dataset_info["dataset"], gt_path,
                       scenes, dataset_info,
                       ignore_background=args.ignore_background)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Arguments to run and evaluate over a dataset")
    parser.add_argument("--dataset_name",
                        help="Dataset used. Choose either `Replica`, `ScanNet`")
    parser.add_argument("--scenes", nargs="+", type=str, default=[],
                        help="List of scenes from the dataset to run.")
    parser.add_argument("--scenes_list", type=str, default=None,
                        help="Path to a txt with one scene name per line.")
    parser.add_argument("--dataset_info_file", type=str,
                        default="eval_info.yaml")
    parser.add_argument("--experiment_name", default=None, type=str)
    parser.add_argument("--run", action="store_true")
    parser.add_argument("--segment", action="store_true")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--ignore_background", action="store_true")
    parser.add_argument("--parallel_scenes", type=int, default=1,
                        help="run N scenes concurrently, one process per "
                             "local accelerator chip (scene-level fan-out)")
    main(parser.parse_args())
