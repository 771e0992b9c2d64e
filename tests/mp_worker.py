"""Worker for the 2-process DCN-path test (tests/test_multiprocess.py).

Each process calls engine.launch.launch() with a real coordinator address
(reference launch semantics: detectron2/engine/launch.py:24-84), bringing up
``jax.distributed`` with world_size=2 on the CPU backend, then exercises the
multi-process code paths that single-process CI can only run degenerately:

  * utils/comm.py all_gather / gather / shared_random_seed / synchronize /
    reduce_dict with world_size 2 (reference comm.py:139-263 gloo gathers);
  * COCOEvaluator with distributed=True: each rank processes a DISJOINT half
    of a fake COCO dataset; rank 0's evaluate() must merge predictions from
    both ranks (reference evaluation/coco_evaluation.py gather-to-rank0).

Usage: python mp_worker.py <rank> <world> <host:port> <json> <imgdir> <out>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run(rank, world, json_file, img_dir, out_dir):
    import jax

    from fsgd_tpu.utils import comm

    assert jax.process_count() == world, jax.process_count()
    assert comm.get_world_size() == world
    assert comm.get_rank() == rank
    assert comm.is_main_process() == (rank == 0)
    record = {"rank": rank, "world": world}

    # ---- comm primitives (variable payload sizes exercise the padded path)
    payload = {"rank": rank, "data": list(range(rank * 3 + 1))}
    gathered = comm.all_gather(payload)
    assert [g["rank"] for g in gathered] == list(range(world)), gathered
    assert [len(g["data"]) for g in gathered] == [1, 4][:world]

    g0 = comm.gather({"from": rank}, dst=0)
    if rank == 0:
        assert [g["from"] for g in g0] == list(range(world)), g0
    else:
        assert g0 == [], g0

    seed = comm.shared_random_seed()
    seeds = comm.all_gather(seed)
    assert len(set(seeds)) == 1, seeds
    record["shared_seed"] = int(seed)

    red = comm.reduce_dict({"x": float(rank), "y": 2.0}, average=True)
    assert abs(float(red["x"]) - (world - 1) / 2.0) < 1e-9, red
    assert abs(float(red["y"]) - 2.0) < 1e-9, red

    comm.synchronize()

    # ---- distributed evaluator merge over a sharded dataset
    from fsgd_tpu.data.datasets import register_coco_instances
    from fsgd_tpu.data.catalog import DatasetCatalog
    from fsgd_tpu.evaluation import COCOEvaluator
    from fsgd_tpu.structures import Boxes, BoxMode, Instances

    name = "mp_fake_coco"
    register_coco_instances(name, {}, json_file, img_dir)
    dicts = DatasetCatalog.get(name)
    assert len(dicts) >= world

    evaluator = COCOEvaluator(
        name, distributed=True, output_dir=os.path.join(out_dir, "eval")
    )
    evaluator.reset()
    mine = [d for i, d in enumerate(dicts) if i % world == rank]
    record["n_processed"] = len(mine)
    for d in mine:
        inst = Instances((d["height"], d["width"]))
        boxes = np.array(
            [BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYXY_ABS)
             for a in d["annotations"]],
            dtype=np.float32,
        )
        inst.pred_boxes = Boxes(boxes)
        inst.scores = np.full((len(boxes),), 0.95, np.float32)
        inst.pred_classes = np.array(
            [a["category_id"] for a in d["annotations"]], np.int64
        )
        evaluator.process([{"image_id": d["image_id"]}], [{"instances": inst}])
    results = evaluator.evaluate()
    if rank == 0:
        # predictions merged from BOTH ranks: GT-as-predictions over the full
        # dataset scores AP 100; a rank-0-only evaluation would miss half the
        # images and drop far below that.
        assert results and "bbox" in results, results
        record["bbox_AP"] = float(results["bbox"]["AP"])
        assert abs(record["bbox_AP"] - 100.0) < 1e-4, results["bbox"]
        with open(os.path.join(out_dir, "eval", "coco_instances_results.json")) as f:
            merged = json.load(f)
        record["n_merged_predictions"] = len(merged)
    else:
        assert not results, results

    comm.synchronize()
    with open(os.path.join(out_dir, "rank%d.json" % rank), "w") as f:
        json.dump(record, f)


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    coordinator, json_file, img_dir, out_dir = sys.argv[3:7]

    from fsgd_tpu.engine.launch import launch

    launch(
        run,
        num_machines=world,
        machine_rank=rank,
        dist_url="tcp://" + coordinator,
        args=(rank, world, json_file, img_dir, out_dir),
    )


if __name__ == "__main__":
    main()
