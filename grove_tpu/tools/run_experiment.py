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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="iground",
                   choices=["iground", "vidstg", "groundingyoutube",
                            "youcookinteractions"])
    p.add_argument("--model_size", default="tiny")
    p.add_argument("--version", default=None)
    p.add_argument("--ann_dir", default=None,
                   help="annotation dir (iground) or file (other tasks)")
    p.add_argument("--video_dir", default=None)
    p.add_argument("--gt", default=None,
                   help="eval ground truth (defaults to --ann_dir)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--workdir", default="./experiment")
    p.add_argument("--max_new_tokens", default=64, type=int)
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    pred_path = os.path.join(args.workdir, f"{args.task}_predictions.pkl")

    # stage 1: inference
    from ..infer.drivers import main as infer_main
    infer_args = ["--task", args.task, "--model_size", args.model_size,
                  "--output", pred_path,
                  "--max_new_tokens", str(args.max_new_tokens)]
    if args.synthetic:
        infer_args.append("--synthetic")
    if args.version:
        infer_args += ["--version", args.version]
    if args.ann_dir:
        infer_args += ["--ann_dir", args.ann_dir]
    if args.video_dir:
        infer_args += ["--video_dir", args.video_dir]
    infer_main(infer_args)

    # stage 2: evaluation (skipped for synthetic non-iground runs where the
    # generated annotations live in a temp dir unknown to us)
    gt = args.gt or args.ann_dir
    if gt is None:
        print("no ground truth available; skipping eval stage")
        return
    import jax
    if jax.process_index() != 0:
        return
    if args.task == "iground":
        from ..evals.run_iground import main as eval_main
        eval_main(["--ann_dir", gt, "--video_dir", args.video_dir or "",
                   "--pred", pred_path])
    elif args.task == "vidstg":
        from ..evals.run_all import main as eval_main
        eval_main(["vidstg", "--ann", gt, "--pred", pred_path])
    else:
        from ..evals.run_all import main as eval_main
        key = ("segment_groundingyoutube_idx"
               if args.task == "groundingyoutube"
               else "segment_youcookinteractions_idx")
        eval_main(["pointing", "--ann", gt, "--pred", pred_path,
                   "--segment_key", key])


if __name__ == "__main__":
    main()
