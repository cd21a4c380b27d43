"""Experiment DAG runner: infer -> eval in one command.

Local/multi-host equivalent of the reference's SLURM dependency DAG
(`infer_eval_scripts/infer_eval_iground.sh:23-31`: embed_tokens -> infer ->
eval). In the functional grove_tpu design the embedding table is part of the
params (no embed_tokens stage needed); checkpoint conversion happens inline
in the infer driver.

Run: python -m grove_tpu.tools.run_experiment --task iground \
        --ann_dir ... --video_dir ... [--version ckpt.bin] --workdir out/
"""

from __future__ import annotations

import argparse
import os
import sys


TASKS = ["iground", "vidstg", "anet", "groundingyoutube",
         "youcookinteractions"]


def _make_synthetic(args) -> None:
    """Generate synthetic data INTO the workdir (not infer's temp dir) so
    the eval stage has the ground truth for every task's smoke DAG."""
    import json
    import pickle

    root = os.path.join(args.workdir, "synthetic")
    os.makedirs(root, exist_ok=True)
    if args.task == "iground":
        from ..data.synthetic import make_synthetic_howto_dataset
        args.ann_dir, args.video_dir, _ = make_synthetic_howto_dataset(root)
    elif args.task == "vidstg":
        from ..data.synthetic import make_synthetic_vidstg
        args.ann_dir, args.video_dir = make_synthetic_vidstg(root)
    elif args.task == "anet":
        from ..data.synthetic import make_synthetic_anet
        args.ann_dir, args.video_dir, fts = make_synthetic_anet(root)
        args.frame_timestamps = os.path.join(root, "fts.json")
        with open(args.frame_timestamps, "w") as f:
            json.dump(fts, f)
    else:
        from ..data.synthetic import make_synthetic_pointing
        key = ("segment_groundingyoutube_idx"
               if args.task == "groundingyoutube"
               else "segment_youcookinteractions_idx")
        secs = ("secs_absolute" if args.task == "groundingyoutube"
                else "secs_relative")
        args.ann_dir, args.video_dir, gt_data = make_synthetic_pointing(
            root, segment_key=key, secs_key=secs)
        gt_path = os.path.join(root, "pointing_gt.pkl")
        with open(gt_path, "wb") as f:
            pickle.dump(gt_data, f)
        args.gt = args.gt or gt_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="iground", choices=TASKS)
    p.add_argument("--model_size", default="tiny")
    p.add_argument("--version", default=None)
    p.add_argument("--ann_dir", default=None,
                   help="annotation dir (iground) or file (other tasks)")
    p.add_argument("--video_dir", default=None)
    p.add_argument("--frame_timestamps", default=None,
                   help="frame-timestamps json (anet task)")
    p.add_argument("--gt", default=None,
                   help="eval ground truth (defaults to --ann_dir)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--workdir", default="./experiment")
    p.add_argument("--max_new_tokens", default=64, type=int)
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    pred_path = os.path.join(args.workdir, f"{args.task}_predictions.pkl")
    if args.synthetic:
        _make_synthetic(args)

    # stage 1: inference
    from ..infer.drivers import main as infer_main
    infer_args = ["--task", args.task, "--model_size", args.model_size,
                  "--output", pred_path,
                  "--max_new_tokens", str(args.max_new_tokens)]
    if args.version:
        infer_args += ["--version", args.version]
    if args.ann_dir:
        infer_args += ["--ann_dir", args.ann_dir]
    if args.video_dir:
        infer_args += ["--video_dir", args.video_dir]
    if args.frame_timestamps:
        infer_args += ["--frame_timestamps", args.frame_timestamps]
    infer_main(infer_args)

    # stage 2: evaluation
    gt = args.gt or args.ann_dir
    if gt is None:
        print("no ground truth available; skipping eval stage")
        return
    import jax
    if jax.process_index() != 0:
        return
    if args.task == "iground":
        from ..evals.run_iground import main as eval_main
        return eval_main(["--ann_dir", gt,
                          "--video_dir", args.video_dir or "",
                          "--pred", pred_path])
    from ..evals.run_all import main as eval_main
    if args.task == "vidstg":
        return eval_main(["vidstg", "--ann", gt, "--pred", pred_path])
    if args.task == "anet":
        return eval_main(["anet", "--ann", gt, "--pred", pred_path])
    key = ("segment_groundingyoutube_idx"
           if args.task == "groundingyoutube"
           else "segment_youcookinteractions_idx")
    return eval_main(["pointing", "--ann", gt, "--pred", pred_path,
                      "--segment_key", key])


if __name__ == "__main__":
    main()
