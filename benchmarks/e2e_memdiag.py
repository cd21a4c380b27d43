"""Phase-by-phase HBM accounting of the integrated e2e driver path.

The b24 AND b16 integrated e2e runs die RESOURCE_EXHAUSTED at the first
fetch (NOTES_ROUND5), while the same stages run fine in isolation
(BENCH_FULL_*) and b8 integrated ran in round 4. Every stage is async-
queued before the first fetch, so the traceback does not localize the
OOM. This script replays the driver's exact device sequence one phase
at a time with a blocking fetch + `memory_stats()` after each, printing
bytes_in_use / peak_bytes_in_use per phase.

Run: python benchmarks/e2e_memdiag.py [--batch 16] [--max_new 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from _flagship import build_flagship_serving  # noqa: E402  (cache too)


def stats(tag, t0):
    s = jax.devices()[0].memory_stats() or {}
    line = {"phase": tag,
            "in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
            "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 2),
            "t_s": round(time.time() - t0, 1)}
    print(json.dumps(line), flush=True)
    return line


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--max_new", default=64, type=int)
    args = p.parse_args()
    b = args.batch

    from grove_tpu.infer.generate import greedy_decode
    from grove_tpu.infer.jit_utils import apply_jit, encode_grounding_auto
    from grove_tpu.text.mock_tokenizer import MockTokenizer
    from grove_tpu.text.tokenizer import special_token_ids_from
    from grove_tpu.text.packing import pack_text
    from grove_tpu.text.prompts import grounding_prompt, tokenize_with_video

    t0 = time.time()
    tok = MockTokenizer()
    cfg, model, variables = build_flagship_serving(
        tokens=special_token_ids_from(tok))
    stats("model built (5.77 GB weights expected)", t0)

    t = cfg.num_frames
    rng = np.random.default_rng(0)
    fc = jnp.asarray(rng.integers(0, 255, size=(
        b, t, cfg.clip.image_size, cfg.clip.image_size, 3), dtype=np.uint8))
    fs = jnp.asarray(rng.integers(0, 255, size=(
        b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3),
        dtype=np.uint8))
    valid = jnp.asarray(np.tile([[360 * cfg.sam_enc.img_size // 640,
                                  cfg.sam_enc.img_size]], (b, 1))
                        .astype(np.int32))
    jax.block_until_ready((fc, fs))
    stats("uint8 frames uploaded", t0)

    prompt_ids = tokenize_with_video(grounding_prompt(), tok)
    packed = pack_text(prompt_ids, None, tok,
                       num_video_tokens=cfg.num_video_tokens,
                       max_spliced_len=len(prompt_ids) - 1
                       + cfg.num_video_tokens,
                       det_token_id=cfg.tokens.det,
                       max_phrases=cfg.max_phrases,
                       pad_id=tok.pad_token_id, with_labels=False)
    ids = jnp.asarray(np.tile(packed.input_ids[None], (b, 1)))
    vs = jnp.full((b,), int(packed.video_start), jnp.int32)
    print(f"spliced prompt len: {ids.shape[1]}", flush=True)

    ve, _ = apply_jit(model, variables, fc, method="encode_video")
    jax.block_until_ready(ve)
    stats("encode_video (CLIP)", t0)

    ie = encode_grounding_auto(model, variables, fs, valid)
    jax.block_until_ready(ie)
    stats(f"encode_grounding (SAM, {b * t} frames)", t0)

    gen_ids, hidden = greedy_decode(
        model, variables, ids, ve, vs, max_new_tokens=args.max_new,
        eos_id=cfg.tokens.eos, pad_id=cfg.tokens.pad,
        cache_dtype=jnp.int8, early_exit=True)
    jax.block_until_ready((gen_ids, hidden))
    stats(f"prefill+decode ({args.max_new} steps, int8 KV)", t0)

    det = jnp.zeros((b, cfg.max_phrases), jnp.int32)
    boxes, obj = apply_jit(model, variables, hidden, det, ie,
                           method="ground")
    jax.block_until_ready(boxes)
    stats("ground", t0)
    print("ALL PHASES OK", flush=True)


if __name__ == "__main__":
    main()
