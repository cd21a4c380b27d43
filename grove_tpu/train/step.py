"""Training step: optimizer, freeze policy, jitted sharded update.

Optimizer recipe matches the reference DeepSpeed config (`train.py:466-487`):
AdamW lr 5e-5(3e-4 pretrain) betas (0.9, 0.95), WarmupDecayLR (linear warmup
`warmup_num_steps`, linear decay to 0 at `total_num_steps`), grad clip 1.0,
bf16 compute. ZeRO-2's sharded optimizer state maps to sharding the optax
state over the data axis (`parallel.sharding.zero_sharding`).

The freeze policy reproduces `prepare_model_for_training`
(`train.py:234-334`): everything frozen except both encoders' adapters, the
box/objectness heads (+ optionally the whole mask decoder), text_hidden_fcs,
mm_projector, lm_head and embed_tokens. LLM LoRA is planned separately; the
`full_llm` flag instead unfreezes the whole LLaMA (superset capability).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.grove import GroveModel
from ..parallel.sharding import path_str

TRAINABLE_PATTERNS_FINETUNE = (
    r"adapters_\d+",            # both towers' video adapters
    r"mask_decoder/bbox_head",
    r"mask_decoder/temporal_objectness_head",
    r"text_hidden_fcs",
    r"mm_projector",
    r"lm_head",
    r"embed_tokens",
    r"_lora",                   # LoRA adapters (q/v projections)
)


@dataclasses.dataclass
class OptimizerConfig:
    lr: float = 5e-5
    betas: Tuple[float, float] = (0.9, 0.95)
    weight_decay: float = 0.0
    warmup_steps: int = 100
    total_steps: int = 7000
    grad_clip: float = 1.0
    train_mask_decoder: bool = True
    full_llm: bool = False
    freeze: bool = True
    # reference trains lm_head + embed_tokens (`train.py:300-311`);
    # freezing them (False) shrinks trainable params 712M -> 450M for
    # the single-chip low-memory fine-tune
    train_embeddings: bool = True
    # "f32" (optax default) or "bf16" (`train.lowmem.adamw_bf16` —
    # halves Adam state for the single-chip fine-tune)
    moment_dtype: str = "f32"


def warmup_decay_schedule(cfg: OptimizerConfig):
    """DeepSpeed WarmupDecayLR: linear warmup then linear decay to 0."""
    return optax.join_schedules([
        optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
        optax.linear_schedule(cfg.lr, 0.0,
                              max(cfg.total_steps - cfg.warmup_steps, 1)),
    ], [cfg.warmup_steps])


def trainable_mask(params, cfg: OptimizerConfig):
    pats = list(TRAINABLE_PATTERNS_FINETUNE)
    if not cfg.train_embeddings:
        pats = [x for x in pats if x not in (r"lm_head", r"embed_tokens")]
    if cfg.train_mask_decoder:
        pats.append(r"mask_decoder")
    if cfg.full_llm:
        pats.append(r"llama")
    regex = re.compile("|".join(pats))

    # Quantized modules can never train (int kernels have no gradients;
    # training only their f32 scales would silently train a different
    # model) — with a quantized frozen base (QLoRA-style fine-tune), a
    # pattern like `lm_head` matching an Int8Dense must stay frozen.
    quant_parents = set()
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        p = path_str(path)
        if p.endswith(("kernel_q", "kernel_q4p")):
            quant_parents.add(p.rsplit("/", 1)[0])

    def f(path, v):
        p = path_str(path)
        if p.rsplit("/", 1)[0] in quant_parents:
            return False
        if not jnp.issubdtype(jnp.asarray(v).dtype
                              if not hasattr(v, "dtype") else v.dtype,
                              jnp.inexact):
            return False
        if not cfg.freeze:
            return True
        return bool(regex.search(p))
    return jax.tree_util.tree_map_with_path(f, params)


def partition_params(params, mask):
    """Split a param tree into (trainable, frozen) trees with None holes
    (equinox partition/combine pattern). Keeping frozen params OUT of the
    differentiated argument means XLA never materializes their gradients —
    essential at 8B+ scale where the fine-tune recipe trains ~5% of params
    (the reference's requires_grad policy has the same effect under torch)."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine_params(trainable, frozen):
    is_none = lambda x: x is None  # noqa: E731
    return jax.tree.map(lambda a, b: b if a is None else a,
                        trainable, frozen, is_leaf=is_none)


def make_optimizer(params, cfg: OptimizerConfig):
    """AdamW over the TRAINABLE subtree only (optimizer state is never
    allocated for frozen params — the ZeRO-adjacent memory saving the
    reference gets from DeepSpeed's requires_grad filtering)."""
    sched = warmup_decay_schedule(cfg)
    if cfg.moment_dtype == "bf16":
        from .lowmem import adamw_bf16
        return adamw_bf16(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                          weight_decay=cfg.weight_decay,
                          grad_clip=cfg.grad_clip)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1],
                    weight_decay=cfg.weight_decay),
    )


def make_train_step(model: GroveModel, optimizer):
    """Returns train_step(trainable, frozen, opt_state, batch) ->
    (trainable, opt_state, metrics). Grads exist only for `trainable`."""

    def loss_fn(trainable, frozen, batch):
        params = combine_params(trainable, frozen)
        out = model.apply({"params": params}, batch,
                          method=GroveModel.forward_train)
        return out["loss"], out

    def train_step(trainable, frozen, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return train_step


def make_eval_step(model: GroveModel):
    def eval_step(params, batch):
        return model.apply({"params": params}, batch,
                           method=GroveModel.forward_train)
    return eval_step


def make_pipelined_train_step(model: GroveModel, optimizer, pipe_mesh,
                              n_microbatches: int):
    """Train step with the LLM block stack pipeline-parallel over
    `pipe_mesh`'s "pipe" axis (GPipe schedule, `parallel/pipeline.py`).

    Same loss semantics as `make_train_step` — encoders, splice, grounding
    head and losses run replicated; only the decoder stack (the FLOP/memory
    king during a full-LLM fine-tune) is sharded across stages, each
    holding num_layers/n_stages layers. Loss and grads match the
    sequential step (tested). Requires equal-length packed prompts (the
    training collator's static batches) and num_layers divisible by the
    number of stages."""
    import jax.numpy as jnp

    from ..models.llama import LlamaLMHead
    from ..ops import losses as loss_ops
    from ..parallel.pipeline import pipelined_llama_forward

    cfg = model.cfg
    lm_head = LlamaLMHead(cfg.llama, dtype=model.dtype)

    def loss_fn(trainable, frozen, batch):
        params = combine_params(trainable, frozen)
        video_embeds, _ = model.apply(
            {"params": params}, batch["frames_clip"],
            method=GroveModel.encode_video)
        image_embeddings = model.apply(
            {"params": params}, batch["frames_sam"],
            batch.get("sam_valid_hw"),
            method=GroveModel.encode_grounding)
        x = model.apply({"params": params}, batch["input_ids"],
                        video_embeds, batch["video_start"],
                        method=GroveModel._splice)
        positions = jnp.arange(batch["input_ids"].shape[1])
        hidden = pipelined_llama_forward(
            cfg.llama, params["llama"], x, positions, pipe_mesh,
            n_microbatches, dtype=model.dtype, remat=model.remat)
        logits = lm_head.apply({"params": params["lm_head"]}, hidden)
        boxes, obj = model.apply({"params": params}, hidden,
                                 batch["det_positions"], image_embeddings,
                                 method=GroveModel.ground)
        out = loss_ops.grove_total_loss(
            logits, batch["labels"], boxes, obj, batch["gt_boxes"],
            batch["gt_objectness"], batch["phrase_mask"],
            ce_weight=cfg.ce_loss_weight,
            giou_weight=cfg.giou_loss_weight,
            objectness_weight=cfg.temp_objectness_loss_weight,
            use_temp_objectness=cfg.use_temp_objectness,
            ignore_index=cfg.tokens.ignore_index)
        return out["loss"], out

    def train_step(trainable, frozen, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return train_step
