"""Training driver: CLI, epoch loop, validation, checkpointing, logging.

TPU-native rebuild of the reference `train.py` (937 LoC single file):
  * argparse surface keeps the reference's meaningful flags
    (`train.py:40-112`) plus mesh/model-size knobs;
  * DeepSpeed ZeRO-2 engine -> jit-sharded train step over a (data, model)
    mesh with optax AdamW + WarmupDecayLR (`train.py:466-487`);
  * per-rank loggers + rank-0 TensorBoard scalars (`train.py:579-606,
    715-731`);
  * loss-mode / bbox-mode validation gating best checkpoints
    (`train.py:657-680,796-916`);
  * `--auto_resume` from the latest Orbax step (`train.py:489-501`).

Run `python -m grove_tpu.train.driver --synthetic --model_size tiny` for a
data-free smoke run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..checkpoint.orbax_io import CheckpointManager
from ..data.loader import GroundingLoader
from ..data.video import VideoDecoder
from ..models.grove import GroveModel, init_grove_params
from ..parallel.mesh import make_mesh
from ..parallel.sharding import params_shardings, shard_pytree
from ..utils.meters import AverageMeter, ProgressMeter, Summary
from .step import (OptimizerConfig, combine_params, make_optimizer,
                   make_train_step, partition_params, trainable_mask)


def parse_args(args=None):
    p = argparse.ArgumentParser(description="GROVE TPU training")
    # model
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "small", "full"])
    p.add_argument("--version", default=None,
                   help="torch .bin checkpoint to convert+load")
    p.add_argument("--model_max_length", default=None, type=int)
    p.add_argument("--num_frames", default=None, type=int)
    p.add_argument("--train_mask_decoder", action="store_true", default=True)
    p.add_argument("--out_dim", default=None, type=int)
    p.add_argument("--ce_loss_weight", default=1.0, type=float)
    p.add_argument("--giou_loss_weight", default=1.0, type=float)
    p.add_argument("--temp_objectness_loss_weight", default=1.0, type=float)
    # data
    p.add_argument("--dataset", default="HowToGround",
                   choices=["HowToGround", "VidSTG", "ActivityNetEntities"])
    p.add_argument("--frame_timestamps", default=None,
                   help="frame-timestamps json for ActivityNetEntities")
    p.add_argument("--max_restarts", default=0, type=int,
                   help="in-process elastic restarts on failure "
                        "(torchrun --max_restarts equivalent)")
    p.add_argument("--ann_dir", default=None)
    p.add_argument("--manifest", default=None,
                   help="prebuilt key manifest (tools/build_index.py) for "
                        "streaming-scale startup; shards the index across "
                        "hosts instead of listing ann_dir")
    p.add_argument("--video_dir", default=None)
    p.add_argument("--val_ann_dir", default=None)
    p.add_argument("--val_video_dir", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic dataset (no real data needed)")
    p.add_argument("--num_workers", default=4, type=int)
    # optimization
    p.add_argument("--epochs", default=2, type=int)
    p.add_argument("--steps_per_epoch", default=10, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--grad_accumulation_steps", default=1, type=int)
    p.add_argument("--lr", default=5e-5, type=float)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--beta2", default=0.95, type=float)
    p.add_argument("--warmup_steps", default=100, type=int)
    p.add_argument("--grad_clip", default=1.0, type=float)
    p.add_argument("--moment_dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="Adam moment storage (bf16 halves optimizer "
                        "state; see train/lowmem.py)")
    p.add_argument("--no_train_embeddings", action="store_true",
                   help="freeze lm_head + embed_tokens (reference trains "
                        "them; freezing shrinks trainable 712M -> 450M "
                        "for single-chip fine-tunes)")
    p.add_argument("--no_freeze", action="store_true",
                   help="train all params (reference trains adapters/heads)")
    p.add_argument("--lora_r", default=0, type=int)
    p.add_argument("--lora_alpha", default=16.0, type=float)
    # parallelism
    p.add_argument("--mesh_model", default=1, type=int)
    p.add_argument("--pipeline_stages", default=0, type=int,
                   help="GPipe-shard the LLM stack over this many devices "
                        "(0 = off; mutually exclusive with --mesh_model>1)")
    p.add_argument("--pipeline_microbatches", default=4, type=int)
    # logging / checkpointing
    p.add_argument("--log_base_dir", default="./runs", type=str)
    p.add_argument("--exp_name", default="grove_tpu", type=str)
    p.add_argument("--print_freq", default=1, type=int)
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--val_mode", default="giou", choices=["loss", "giou"])
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler trace of steps 2-4 here")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize LLM blocks (activation checkpointing)")
    p.add_argument("--train_clip_adapters", action="store_true",
                   help="lift the CLIP-tower stop_gradient so its video "
                        "adapters actually train (the reference's "
                        "@torch.no_grad quirk zeroes them; see config)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host "
                        "pods; the SLURM/torchrun rendezvous equivalent)")
    return p.parse_args(args)


def build_config(args) -> GroveConfig:
    cfg = {"tiny": GroveConfig.tiny, "small": GroveConfig.small,
           "full": GroveConfig}[args.model_size]()
    import dataclasses
    overrides = {}
    if args.model_max_length:
        overrides["max_seq_len"] = args.model_max_length
    if args.out_dim:
        overrides["out_dim"] = args.out_dim
    overrides["ce_loss_weight"] = args.ce_loss_weight
    overrides["giou_loss_weight"] = args.giou_loss_weight
    overrides["temp_objectness_loss_weight"] = args.temp_objectness_loss_weight
    if getattr(args, "train_clip_adapters", False):
        overrides["train_clip_adapters"] = True
    if getattr(args, "lora_r", 0):
        overrides["llama"] = dataclasses.replace(
            cfg.llama, lora_r=args.lora_r, lora_alpha=args.lora_alpha)
    # objectness head only trains on HowToGround (`train.py:205`)
    if getattr(args, "dataset", "HowToGround") != "HowToGround":
        overrides["use_temp_objectness"] = False
        overrides["sam_dec"] = dataclasses.replace(
            cfg.sam_dec, use_temp_objectness=False)
    return dataclasses.replace(cfg, **overrides)


def build_tokenizer(args, cfg):
    if args.synthetic or args.version is None:
        from ..text.mock_tokenizer import MockTokenizer
        return MockTokenizer(model_max_length=cfg.max_seq_len)
    import transformers
    tok = transformers.AutoTokenizer.from_pretrained(
        args.version, model_max_length=cfg.max_seq_len, padding_side="right",
        use_fast=False)
    tok.pad_token = tok.unk_token
    from ..text.constants import GROVE_EXTRA_TOKENS
    tok.add_tokens(list(GROVE_EXTRA_TOKENS), special_tokens=True)
    return tok


def build_datasets(args, cfg):
    if args.synthetic:
        import tempfile
        root = tempfile.mkdtemp(prefix="grove_synth_")
        if args.dataset == "VidSTG":
            from ..data.synthetic import make_synthetic_vidstg
            ann, video_dir = make_synthetic_vidstg(
                root, num_videos=max(4, args.batch_size * 2))
            args.ann_dir = args.val_ann_dir = ann
        else:
            from ..data.synthetic import make_synthetic_howto_dataset
            ann, video_dir, _ = make_synthetic_howto_dataset(
                root, num_videos=max(4, args.batch_size * 2))
            args.ann_dir = args.val_ann_dir = ann
            args.dataset = "HowToGround"
        args.video_dir = args.val_video_dir = video_dir
    common = dict(decoder_factory=VideoDecoder, num_frames=cfg.num_frames,
                  clip_size=cfg.clip.image_size,
                  sam_size=cfg.sam_enc.img_size,
                  max_phrases=cfg.max_phrases)
    if args.dataset == "VidSTG":
        from ..data.datasets.vidstg import VidSTGDataset
        train_ds = VidSTGDataset(ann_path=args.ann_dir,
                                 video_dir=args.video_dir,
                                 validation=False, **common)
        val_ds = (VidSTGDataset(ann_path=args.val_ann_dir,
                                video_dir=args.val_video_dir,
                                validation=True, **common)
                  if args.val_ann_dir else None)
    elif args.dataset == "ActivityNetEntities":
        import json
        from ..data.datasets.anet_entities import ActivityNetEntitiesDataset
        with open(args.frame_timestamps) as f:
            fts = json.load(f)
        anet_common = dict(frame_timestamps=fts,
                           decoder_factory=VideoDecoder,
                           num_frames=cfg.num_frames,
                           clip_size=cfg.clip.image_size,
                           sam_size=cfg.sam_enc.img_size,
                           max_phrases=cfg.max_phrases)
        train_ds = ActivityNetEntitiesDataset(
            args.ann_dir, args.video_dir, validation=False, **anet_common)
        val_ds = (ActivityNetEntitiesDataset(
            args.val_ann_dir, args.val_video_dir, validation=True,
            **anet_common) if args.val_ann_dir else None)
    else:
        from ..data.datasets.howto100m import HowTo100MDataset
        shard = {}
        if getattr(args, "manifest", None):
            # streaming-scale: pre-shard the index across hosts; the loader
            # then must not shard again (see build_loaders)
            shard = dict(manifest=args.manifest,
                         shard_rank=jax.process_index(),
                         shard_world=jax.process_count())
        train_ds = HowTo100MDataset(ann_dir=args.ann_dir,
                                    video_dir=args.video_dir,
                                    validation=False, **shard, **common)
        val_ds = (HowTo100MDataset(ann_dir=args.val_ann_dir,
                                   video_dir=args.val_video_dir,
                                   validation=True, **common)
                  if args.val_ann_dir else None)
    return train_ds, val_ds


def validate(model, params, loader, cfg, args):
    """bbox-mode validation: mean GIoU + objectness accuracy
    (`train.py:797-875`); loss-mode: mean val loss (`train.py:876-916`)."""
    from ..ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou

    giou_m = AverageMeter("giou", ":.4f")
    acc_m = AverageMeter("obj_acc", ":.4f")
    loss_m = AverageMeter("loss", ":.4f")

    @jax.jit
    def val_boxes(params, batch):
        return model.apply({"params": params}, batch,
                           method=GroveModel.forward_boxes)

    @jax.jit
    def val_loss(params, batch):
        return model.apply({"params": params}, batch,
                           method=GroveModel.forward_train)

    for batch, meta in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        if args.val_mode == "loss":
            out = val_loss(params, jb)
            loss_m.update(float(out["loss"]), len(batch["input_ids"]))
            continue
        out = val_boxes(params, jb)
        pred = np.asarray(out["pred_boxes"], np.float32)
        obj_logits = (np.asarray(out["objectness_logits"], np.float32)
                      if out["objectness_logits"] is not None else None)
        gt = batch["gt_boxes"]
        gt_obj = batch["gt_objectness"]
        pm = batch["phrase_mask"][:, None, :]
        mask = (gt_obj * pm).astype(bool)
        if mask.any():
            g = np.asarray(generalized_box_iou(
                box_cxcywh_to_xyxy(pred[mask]), box_cxcywh_to_xyxy(gt[mask])))
            giou_m.update(float(g.mean()), int(mask.sum()))
        if obj_logits is not None:
            vm = np.broadcast_to(pm, gt_obj.shape).astype(bool)
            if vm.any():
                pred_obj = (obj_logits > 0)[vm]
                acc_m.update(
                    float((pred_obj == gt_obj[vm].astype(bool)).mean()),
                    int(vm.sum()))
    for m in (giou_m, acc_m, loss_m):
        m.all_reduce()
    if args.val_mode == "loss":
        return {"val_loss": loss_m.avg, "key_metric": -loss_m.avg}
    return {"val_giou": giou_m.avg, "val_obj_acc": acc_m.avg,
            "key_metric": giou_m.avg}


def _run(args):
    if args.multihost and jax.process_count() == 1:
        # TPU pods: env-driven coordinator discovery (replaces the
        # reference's NCCL + SLURM/torchrun rendezvous plumbing,
        # `utils/utils.py:186-228`)
        jax.distributed.initialize()
    np.random.seed(args.seed)

    cfg = build_config(args)
    tokenizer = build_tokenizer(args, cfg)
    # special-token ids must come from the ACTUAL tokenizer (the config
    # defaults assume the published 32000-base vocab)
    import dataclasses
    from ..text.tokenizer import special_token_ids_from
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tokenizer))
    train_ds, val_ds = build_datasets(args, cfg)

    mesh = make_mesh(model=args.mesh_model)
    dtype = jnp.float32 if args.model_size == "tiny" else jnp.bfloat16
    model, variables = init_grove_params(
        cfg, jax.random.PRNGKey(args.seed), dtype=dtype,
        batch=args.batch_size, remat=args.remat)
    params = variables["params"]

    if args.version and os.path.exists(args.version):
        import torch
        from ..checkpoint.torch_convert import convert_state_dict, merge_into
        from ..tools.merge_lora import normalize_peft_state_dict
        sd = torch.load(args.version, map_location="cpu")
        sd = {k: v.float().numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        sd = normalize_peft_state_dict(sd)
        converted, report = convert_state_dict(sd, cfg)
        params, missing, mismatched = merge_into(params, converted)
        print(f"loaded {report['converted']} tensors from {args.version}; "
              f"missing={len(missing)} mismatched={len(mismatched)}")

    total_steps = args.epochs * args.steps_per_epoch
    opt_cfg = OptimizerConfig(
        lr=args.lr, betas=(args.beta1, args.beta2),
        warmup_steps=args.warmup_steps, total_steps=total_steps,
        grad_clip=args.grad_clip, train_mask_decoder=args.train_mask_decoder,
        freeze=not args.no_freeze, moment_dtype=args.moment_dtype,
        train_embeddings=not args.no_train_embeddings)
    optimizer = make_optimizer(params, opt_cfg)
    if args.grad_accumulation_steps > 1:
        import optax
        optimizer = optax.MultiSteps(optimizer,
                                     args.grad_accumulation_steps)

    if args.pipeline_stages > 1:
        # pipeline mode: leave params on default placement — the GPipe
        # shard_map's own mesh takes ownership of the stacked LLM layers
        # (replicating over the dp/tp mesh first would pin arguments to a
        # conflicting device set)
        pass
    else:
        p_shard = params_shardings(params, mesh)
        params = shard_pytree(params, p_shard)
    mask = trainable_mask(params, opt_cfg)
    trainable, frozen = partition_params(params, mask)
    n_train = sum(int(np.prod(x.shape))
                  for x in jax.tree.leaves(trainable))
    n_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"trainable params: {n_train/1e6:.1f}M / {n_total/1e6:.1f}M")
    opt_state = optimizer.init(trainable)
    if args.pipeline_stages > 1:
        assert args.mesh_model == 1, \
            "--pipeline_stages and --mesh_model>1 are mutually exclusive"
        assert cfg.llama.num_layers % args.pipeline_stages == 0, \
            (cfg.llama.num_layers, args.pipeline_stages)
        assert args.batch_size % args.pipeline_microbatches == 0, \
            (args.batch_size, args.pipeline_microbatches)
        from ..parallel.pipeline import make_pipe_mesh
        from .step import make_pipelined_train_step
        pipe = make_pipe_mesh(args.pipeline_stages)
        print(f"pipeline-parallel LLM: {args.pipeline_stages} stages x "
              f"{cfg.llama.num_layers // args.pipeline_stages} layers, "
              f"{args.pipeline_microbatches} microbatches")
        train_step = jax.jit(make_pipelined_train_step(
            model, optimizer, pipe, args.pipeline_microbatches))
    else:
        train_step = jax.jit(make_train_step(model, optimizer))

    log_dir = os.path.join(args.log_base_dir, args.exp_name)
    os.makedirs(log_dir, exist_ok=True)
    writer = None
    if jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir)
        except Exception:
            writer = None
    ckpt = CheckpointManager(log_dir)

    start_epoch = 0
    if args.auto_resume:
        latest = ckpt.latest_step()
        if latest is not None:
            restored = ckpt.restore(latest, {"params": params,
                                             "opt_state": opt_state})
            trainable, frozen = partition_params(restored["params"], mask)
            opt_state = restored["opt_state"]
            start_epoch = latest // args.steps_per_epoch
            print(f"resumed from step {latest} (epoch {start_epoch})")

    from ..text.prompts import (VIDEO_GROUNDING_QUESTIONS,
                                VIDEO_STG_QUESTIONS)
    qts = (VIDEO_STG_QUESTIONS if args.dataset == "VidSTG"
           else VIDEO_GROUNDING_QUESTIONS)
    # with a manifest the dataset is already host-sharded — the loader must
    # not stride it again (shuffle then happens shard-locally, which is the
    # streaming-scale recipe; see data/index.py)
    presharded = (dict(process_index=0, process_count=1)
                  if getattr(args, "manifest", None) else {})
    loader = GroundingLoader(train_ds, tokenizer, cfg,
                             batch_size=args.batch_size,
                             num_workers=args.num_workers, seed=args.seed,
                             question_templates=qts, **presharded)
    val_loader = None
    if val_ds is not None:
        val_loader = GroundingLoader(val_ds, tokenizer, cfg,
                                     batch_size=args.batch_size,
                                     shuffle=False, drop_last=False,
                                     num_workers=args.num_workers,
                                     question_templates=qts)

    best_metric = ckpt.best_metric_from_marker() or -1e9
    global_step = start_epoch * args.steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        meters = {k: AverageMeter(k, ":.4f") for k in
                  ("loss", "ce_loss", "giou_loss", "l1_loss",
                   "temp_objectness_loss")}
        bt = AverageMeter("secs/batch", ":.2f")
        dt = AverageMeter("data_secs", ":.2f")
        progress = ProgressMeter(
            args.steps_per_epoch,
            [bt, dt] + list(meters.values()), prefix=f"Epoch[{epoch}]")

        it = iter(loader)
        t_end = time.time()
        for step in range(args.steps_per_epoch):
            try:
                batch, meta = next(it)
            except StopIteration:
                loader.set_epoch(epoch * 1000 + step)
                it = iter(loader)
                batch, meta = next(it)
            dt.update(time.time() - t_end)
            if args.profile_dir and global_step == 2:
                jax.profiler.start_trace(args.profile_dir)
            if jax.process_count() > 1:
                # each host's local batch becomes its shard of the global
                # array; one SPMD program spans all hosts
                from ..parallel.mesh import globalize_batch
                jb = globalize_batch(batch, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
            trainable, opt_state, metrics = train_step(trainable, frozen,
                                                       opt_state, jb)
            if args.profile_dir and global_step == 4:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
            loss = float(metrics["loss"])
            for k, m in meters.items():
                if k in metrics:
                    m.update(float(metrics[k]))
            bt.update(time.time() - t_end)
            t_end = time.time()
            global_step += 1
            if step % args.print_freq == 0:
                progress.display(step)
            if writer:
                writer.add_scalar("train/loss", loss, global_step)
                for k, m in meters.items():
                    writer.add_scalar(f"train/{k}", m.val, global_step)
                writer.add_scalar("metrics/total_secs_per_batch", bt.val,
                                  global_step)
                writer.add_scalar("metrics/data_secs_per_batch", dt.val,
                                  global_step)

        params = combine_params(trainable, frozen)
        if val_loader is not None:
            val_metrics = validate(model, params, val_loader, cfg, args)
            print(f"epoch {epoch} val: "
                  + " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()))
            if writer:
                for k, v in val_metrics.items():
                    if k != "key_metric":
                        writer.add_scalar(f"val/{k}", v, global_step)
            if val_metrics["key_metric"] > best_metric:
                best_metric = val_metrics["key_metric"]
                if jax.process_index() == 0:
                    ckpt.save_best(epoch, jax.device_get(params),
                                   "metric", best_metric)
        ckpt.save(global_step, jax.device_get(params),
                  jax.device_get(opt_state))

    ckpt.close()
    if writer:
        writer.close()
    print(f"training done: {global_step} steps, best={best_metric:.4f}")
    return best_metric


def main(args=None):
    """Entry with in-process elastic restarts (reference torchrun
    `--max_restarts`, `train_scripts/train_howtoground.sh:21-29`)."""
    parsed = parse_args(args)
    attempt = 0
    while True:
        try:
            return _run(parsed)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            if attempt >= parsed.max_restarts:
                raise
            attempt += 1
            print(f"training failed ({type(e).__name__}: {e}); "
                  f"restart {attempt}/{parsed.max_restarts} with "
                  f"auto_resume", flush=True)
            parsed.auto_resume = True


if __name__ == "__main__":
    main()
