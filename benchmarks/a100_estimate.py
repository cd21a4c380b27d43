"""Analytic A100-80GB estimate of the REFERENCE pipeline's clips/s.

The BASELINE.md speed gate is ">= 2x A100 clips/sec per v5e chip", but the
reference (ekazakos/grove) publishes no numbers and no A100 is reachable
from this environment. The reference pins its pipeline precisely enough to
build an honest per-stage roofline estimate, which this script derives from
first principles and writes to A100_ESTIMATE.json. bench.py reads that file
and reports `vs_a100_estimate` alongside the self-baseline ratio.

What is being modeled — ONE inference unit of the reference pipeline
(`/root/reference/infer_iground.py:150-295`), batch 1 per GPU as the
reference runs it (`infer_eval_scripts/infer_iground.sh:2-9`):

  1. SAM ViT-H grounding encoder over 8 frames @ 512^2
     (`model/SAM/modeling/image_encoder.py:172-191`): 32 layers d=1280,
     window 14 (28 windowed blocks pay the same pad-to-42^2 -> 9x196
     token cost torch's window_partition pays), 4 global blocks @ 1024
     tokens, + 4 Conv3d(3^3) adapters + neck.
  2. CLIP ViT-L/336 over 8 frames (`clip_encoder.py:55-82`): 24 layers
     d=1024, 577 tokens/frame, 8 Conv3d adapters, eager bmm attention
     (the vendored copy does NOT use flash attention,
     `modeling_clip.py:232-334`).
  3. LLaMA-7B prefill of the multimodal prompt (~624 tokens: instruction
     + 576 video tokens, `llava_llama.py:100-125`) with flash-attn2.
  4. 64-step greedy HF decode at batch 1 (`model/GROVE.py:412-451`):
     HBM-bandwidth-bound on the ~13.8 GB of bf16 LLaMA weights per step.
  5. Grounding head (prompt encoder + 2-layer two-way transformer +
     heads, `mask_decoder.py:155-205`): negligible FLOPs, counted anyway.

A100-80GB-SXM peaks: 312 TF/s dense bf16, 2.039 TB/s HBM2e.

Efficiency assumptions (stated, deliberately GENEROUS to the A100 so the
resulting ">= 2x" comparison cannot be accused of a strawman; the real
reference stack — eager PyTorch modules, per-step HF generate glue,
hidden-state concatenation — would land below these):

  - SAM-H eager torch encoder: 45% MFU. Dense d=1280 matmuls run near
    cuBLAS peak, but windowed attention is 196-token bmms and eager
    launches dominate small ops. (For scale: our own TPU tower, after
    two rounds of kernel work, runs 36-46% MFU bf16-equivalent.)
  - CLIP-L eager, bmm attention: 40% MFU.
  - LLaMA-7B prefill with flash-attn2: 55% MFU (HF transformers at
    seq 624, batch 1).
  - Greedy decode: 75% of HBM peak on weight+KV bytes/step — above
    what HF generate at batch 1 typically sustains (its per-step Python
    glue alone costs ~1-2 ms), i.e. generous.
  - Conv3d adapters via cuDNN: 45% MFU.

Run: python benchmarks/a100_estimate.py [--out A100_ESTIMATE.json]
"""

import argparse
import json
import math
import os

# ---- A100-80GB SXM datasheet ----
A100_TFLOPS_BF16 = 312.0      # dense (no 2:4 sparsity)
A100_HBM_GBS = 2039.0

# ---- stated efficiency assumptions (see module docstring) ----
MFU_SAM = 0.45
MFU_CLIP = 0.40
MFU_PREFILL = 0.55
HBM_EFF_DECODE = 0.75
MFU_CONV = 0.45

# ---- reference model dims (train.py:44-46, build_sam.py:57-113,
#      pooling.py:13, HF llama-7b config) ----
FRAMES = 8
SAM_IMG, SAM_PATCH, SAM_D, SAM_DEPTH = 512, 16, 1280, 32
SAM_MLP = 4 * SAM_D
SAM_WINDOW, SAM_GLOBAL_BLOCKS = 14, 4
CLIP_IMG, CLIP_PATCH, CLIP_D, CLIP_DEPTH = 336, 14, 1024, 24
CLIP_MLP = 4096
CLIP_ADAPTERS = CLIP_DEPTH // 3
LLAMA_D, LLAMA_INTER, LLAMA_LAYERS = 4096, 11008, 32
LLAMA_VOCAB = 32024            # 32000 + grove special tokens
PREFILL_TOKENS = 624           # instruction + 576 video tokens (measured
                               # layout, matches our TPU bench unit)
DECODE_STEPS = 64              # max_new_tokens (model/GROVE.py:418-422)


def vit_layer_flops(tokens: int, d: int, inter: int, attn_seq: int,
                    n_attn_groups: int) -> float:
    """FLOPs for one ViT encoder layer (MACs x 2).

    tokens: total tokens through the projections/MLP.
    attn_seq/n_attn_groups: attention runs as n_attn_groups independent
    (attn_seq x attn_seq) softmax-attentions.
    """
    proj = 2 * tokens * 4 * d * d
    mlp = 2 * tokens * 2 * d * inter
    attn = 2 * n_attn_groups * 2 * attn_seq * attn_seq * d
    return proj + mlp + attn


def sam_flops() -> float:
    grid = SAM_IMG // SAM_PATCH                      # 32
    tokens = grid * grid                             # 1024 per frame
    # windowed blocks pad the 32x32 grid to 42x42 -> 9 windows of 196
    pad_grid = math.ceil(grid / SAM_WINDOW) * SAM_WINDOW
    n_win = (pad_grid // SAM_WINDOW) ** 2            # 9
    win_tokens = n_win * SAM_WINDOW * SAM_WINDOW     # 1764 per frame
    n_windowed = SAM_DEPTH - SAM_GLOBAL_BLOCKS
    f = 0.0
    f += n_windowed * FRAMES * vit_layer_flops(
        win_tokens, SAM_D, SAM_MLP, SAM_WINDOW * SAM_WINDOW, n_win)
    f += SAM_GLOBAL_BLOCKS * FRAMES * vit_layer_flops(
        tokens, SAM_D, SAM_MLP, tokens, 1)
    # patchify conv 16x16x3 -> d
    f += 2 * FRAMES * tokens * (SAM_PATCH * SAM_PATCH * 3) * SAM_D
    # 4 Conv3d(d, d, 3^3) adapters over (t=8, 32, 32)
    f += SAM_GLOBAL_BLOCKS * 2 * 27 * SAM_D * SAM_D * FRAMES * tokens
    # neck: 1x1 d->256 + 3x3 256->256
    f += 2 * FRAMES * tokens * (SAM_D * 256 + 9 * 256 * 256)
    return f


def clip_flops() -> float:
    grid = CLIP_IMG // CLIP_PATCH                    # 24
    tokens = grid * grid + 1                         # 577 per frame
    f = CLIP_DEPTH * FRAMES * vit_layer_flops(
        tokens, CLIP_D, CLIP_MLP, tokens, 1)
    f += 2 * FRAMES * tokens * (CLIP_PATCH * CLIP_PATCH * 3) * CLIP_D
    # 8 Conv3d adapters over the 576 patch tokens (t=8)
    f += CLIP_ADAPTERS * 2 * 27 * CLIP_D * CLIP_D * FRAMES * (grid * grid)
    # mm_projector 1024->4096->4096 on 576 pooled tokens
    f += 2 * 576 * (CLIP_D * LLAMA_D + LLAMA_D * LLAMA_D)
    return f


def prefill_flops(seq: int) -> float:
    per_tok = 2 * LLAMA_LAYERS * (4 * LLAMA_D * LLAMA_D
                                  + 3 * LLAMA_D * LLAMA_INTER)
    attn = 2 * LLAMA_LAYERS * 2 * (seq * seq / 2) * LLAMA_D
    lm_head = 2 * seq * LLAMA_D * LLAMA_VOCAB
    return seq * per_tok + attn + lm_head


def llama_param_bytes() -> float:
    per_layer = 4 * LLAMA_D * LLAMA_D + 3 * LLAMA_D * LLAMA_INTER
    params = LLAMA_LAYERS * per_layer + 2 * LLAMA_VOCAB * LLAMA_D
    return params * 2.0  # bf16


def decode_step_bytes(ctx: int) -> float:
    kv = ctx * 2 * LLAMA_LAYERS * LLAMA_D * 2.0
    return llama_param_bytes() + kv


def ground_flops() -> float:
    # prompt encoder + 2-layer TwoWayTransformer over 8 frames x 1024
    # image tokens at d=256 + heads — generous upper bound
    toks = FRAMES * 1024
    return 2 * 2 * (toks * 4 * 256 * 256 + toks * 2 * 256 * 2048
                    + 2 * toks * 8 * 256)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "A100_ESTIMATE.json"))
    args = p.parse_args()

    stages = {}
    sam_f = sam_flops()
    stages["sam_encode"] = {
        "tflops": round(sam_f / 1e12, 3), "mfu": MFU_SAM,
        "ms": round(sam_f / (A100_TFLOPS_BF16 * MFU_SAM) / 1e9, 2)}
    clip_f = clip_flops()
    stages["clip_encode"] = {
        "tflops": round(clip_f / 1e12, 3), "mfu": MFU_CLIP,
        "ms": round(clip_f / (A100_TFLOPS_BF16 * MFU_CLIP) / 1e9, 2)}
    pre_f = prefill_flops(PREFILL_TOKENS)
    stages["lm_prefill"] = {
        "tflops": round(pre_f / 1e12, 3), "mfu": MFU_PREFILL,
        "ms": round(pre_f / (A100_TFLOPS_BF16 * MFU_PREFILL) / 1e9, 2)}
    # decode: average context over the 64 steps
    avg_ctx = PREFILL_TOKENS + DECODE_STEPS // 2
    step_bytes = decode_step_bytes(avg_ctx)
    step_ms = step_bytes / (A100_HBM_GBS * HBM_EFF_DECODE) / 1e6
    stages["decode"] = {
        "gb_per_step": round(step_bytes / 1e9, 2),
        "hbm_eff": HBM_EFF_DECODE, "steps": DECODE_STEPS,
        "ms_per_step": round(step_ms, 2),
        "ms": round(step_ms * DECODE_STEPS, 1)}
    g_f = ground_flops()
    stages["ground"] = {
        "tflops": round(g_f / 1e12, 4), "mfu": MFU_CONV,
        "ms": round(g_f / (A100_TFLOPS_BF16 * MFU_CONV) / 1e9, 2)}

    total_ms = sum(s["ms"] for s in stages.values())
    clips_per_sec = 1000.0 / total_ms  # batch 1/GPU as the reference runs

    report = {
        "what": "analytic A100-80GB estimate of the reference pipeline "
                "(one 8-frame window: encode + prefill + 64-token greedy "
                "decode + ground, batch 1/GPU)",
        "a100_peaks": {"tflops_bf16": A100_TFLOPS_BF16,
                       "hbm_gbs": A100_HBM_GBS},
        "assumptions": {
            "sam_mfu": MFU_SAM, "clip_mfu": MFU_CLIP,
            "prefill_mfu": MFU_PREFILL, "decode_hbm_eff": HBM_EFF_DECODE,
            "note": "deliberately generous to the A100; eager-PyTorch + "
                    "HF-generate glue would land below these"},
        "stages": stages,
        "total_ms_per_clip": round(total_ms, 1),
        "clips_per_sec_per_a100": round(clips_per_sec, 3),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
