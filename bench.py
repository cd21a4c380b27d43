"""Benchmark: grounded-caption clips/sec on one chip, end-to-end.

Primary path (TPU): run the REFERENCE-SCALE model (8.42B: LLaMA-7B-class
+ CLIP-L/336 + SAM-H/512) in the best serving mode (int4 LLM weights,
int8 KV cache, W8A8 vision towers with static calibrated activation
scales) via `benchmarks/full_scale.py` in a budgeted subprocess and
report its end-to-end clips/s. `vs_baseline` compares against this
repo's FIRST full-scale measurement (BENCH_FULL.json, 2.093 clips/s at
batch 8 — the reference itself publishes no numbers, see BASELINE.md).
The persistent XLA compilation cache (warmed during development on this
machine) makes the at-scale run take minutes, not the ~28 min a cold
compile costs; on any failure or timeout the bench falls back to the
scaled-down `GroveConfig.small()` regression metric below.

Fallback path (CPU, or full-scale failure): the structurally-complete
small config with synthetic frames, everything inside jitted calls so
the axon relay's per-launch overhead doesn't pollute the numbers
(see .claude/skills/verify/SKILL.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BENCH_BASELINE.json")
# first recorded full-scale e2e (BENCH_FULL.json, batch 8, int8 W):
# the anchor every later at-scale number is compared against
FULL_BASELINE_CLIPS = 2.093


def a100_estimate_clips() -> float | None:
    """Reference-pipeline clips/s on an A100-80GB, analytic estimate.

    Derivation + stated assumptions: benchmarks/a100_estimate.py (writes
    A100_ESTIMATE.json; see BASELINE.md "A100 anchor"). None if the file
    is absent and the generator fails.
    """
    path = os.path.join(REPO, "A100_ESTIMATE.json")
    if not os.path.exists(path):
        try:
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "benchmarks", "a100_estimate.py"),
                 "--out", path],
                check=True, timeout=60, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
        except Exception:
            return None
    try:
        with open(path) as f:
            return float(json.load(f)["clips_per_sec_per_a100"])
    except Exception:
        return None
FULL_BUDGET_S = int(os.environ.get("GRAFT_BENCH_FULL_BUDGET_S", "2100"))


def try_full_scale() -> float | None:
    """Run the at-scale bench in a budgeted subprocess; None on failure.

    Flagship config: batch 24 (round-4 sweep winner — decode amortizes
    to 40 ms/clip while SAM/CLIP/prefill stay flat per-clip,
    BENCH_FULL_B24_R4.json; b32 in-program chunking faults the worker,
    b32 split launches lose the win to per-launch marshaling). Falls
    back to the long-stable b16 config, then to the small config."""
    out = "/tmp/bench_full_scale.json"
    base = [sys.executable,
            os.path.join(REPO, "benchmarks", "full_scale.py"),
            "--int4", "--vision_quant", "--llm_act_quant", "--kv_int8",
            "--static_act", "--iters", "2", "--output", out]
    configs = [["--batch", "24", "--sam_chunk", "6"],
               ["--batch", "16", "--sam_chunk", "4"]]
    deadline = time.time() + FULL_BUDGET_S
    for extra in configs:
        try:
            os.remove(out)
        except OSError:
            pass
        left = deadline - time.time()
        if left < 300:
            break
        # cap the first config's timeout so a hung b24 (the relay HAS
        # wedged on b24-adjacent shapes, NOTES_ROUND4) still leaves the
        # b16 fallback a real budget instead of silently degrading to
        # the small config (ADVICE r4)
        if extra is not configs[-1]:
            left = min(left, 0.6 * FULL_BUDGET_S)
        try:
            subprocess.run(base + extra, check=True, timeout=left,
                           stdout=sys.stderr, stderr=sys.stderr)
            with open(out) as f:
                return float(json.load(f)["clips_per_sec"])
        except Exception as e:  # timeout, OOM, relay wedge, parse error
            print(f"bench: full-scale attempt {extra} failed "
                  f"({type(e).__name__}: {e})",
                  file=sys.stderr, flush=True)
    print("bench: all full-scale attempts failed; falling back to "
          "small config", file=sys.stderr, flush=True)
    return None


def wait_for_tpu(attempts: int = 12, probe_timeout: int = 120,
                 sleep_s: int = 60) -> None:
    """Gate the measured run on relay health.

    The axon relay occasionally wedges (a device op hangs indefinitely
    rather than erroring); a bench started against a wedged relay hangs
    at the first launch and the round records a failure. Probe with a
    tiny matmul in a SUBPROCESS (so a hang is killable) and wait for
    recovery — observed wedges clear on a relay restart within minutes.
    All logging goes to stderr; stdout stays reserved for the one JSON
    result line. No-op off-TPU (CPU runs don't relay)."""
    if jax.default_backend() != "tpu":
        return
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "x = jnp.ones((256, 256), jnp.bfloat16);"
             "print(float(np.asarray((x @ x).sum())))")
    for i in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           timeout=probe_timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            print(f"bench: TPU relay probe {i + 1}/{attempts} failed "
                  f"({type(e).__name__}); retrying in {sleep_s}s",
                  file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    print("bench: relay never recovered; proceeding anyway",
          file=sys.stderr, flush=True)
MAX_NEW_TOKENS = 64
N_WARMUP = 1
N_ITERS = 4
BATCH_CLIPS = 32  # clips per launch: throughput saturates here (batch sweep
                  # on the real chip: 4→55, 8→73, 16→98, 32→107, 64→105 c/s)


def main():
    wait_for_tpu()
    if jax.default_backend() == "tpu":
        full = try_full_scale()
        if full is not None:
            a100 = a100_estimate_clips()
            out = {
                "metric": "grove_full_scale_clips_per_sec_per_chip",
                "value": round(full, 4),
                "unit": "clips/s (8.42B model, b16, int4 W / int8 KV / "
                        "W8A8-static vision, 64 new tokens)",
                "vs_baseline": round(full / FULL_BASELINE_CLIPS, 4),
                "weights": "synthetic",
            }
            if a100:
                # analytic A100-80GB anchor for the >=2x speed gate
                # (BASELINE.md); derivation in benchmarks/a100_estimate.py
                out["vs_a100_estimate"] = round(full / a100, 4)
            print(json.dumps(out))
            return
    from grove_tpu.config import GroveConfig
    from grove_tpu.infer.generate import greedy_decode
    from grove_tpu.models.grove import GroveModel, init_grove_params

    cfg = GroveConfig.small()
    b = BATCH_CLIPS
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.bfloat16, batch=b)
    rng = np.random.default_rng(0)

    t = cfg.num_frames
    nv = cfg.num_video_tokens
    prompt_len = nv + 48
    ids = rng.integers(3, 32000, size=(b, prompt_len)).astype(np.int32)
    ids[:, 0] = cfg.tokens.bos
    ids[:, 2:2 + nv] = 0
    frames_clip = jnp.asarray(rng.normal(size=(
        b, t, cfg.clip.image_size, cfg.clip.image_size, 3)), jnp.bfloat16)
    frames_sam = jnp.asarray(rng.normal(size=(
        b, t, cfg.sam_enc.img_size, cfg.sam_enc.img_size, 3)), jnp.bfloat16)
    ids_j = jnp.asarray(ids)
    vs = jnp.asarray(np.full((b,), 2, np.int32))
    det_pos = jnp.asarray(np.full((b, cfg.max_phrases), prompt_len - 3,
                                  np.int32))

    @jax.jit
    def clip_once(params, frames_clip, frames_sam, ids, vs, det_pos):
        ve, _ = model.apply({"params": params}, frames_clip,
                            method=GroveModel.encode_video)
        ie = model.apply({"params": params}, frames_sam,
                         method=GroveModel.encode_grounding)
        gen_ids, hidden = greedy_decode(
            model, {"params": params}, ids, ve, vs,
            max_new_tokens=MAX_NEW_TOKENS, eos_id=cfg.tokens.eos,
            early_exit=False)  # always decode all 64 steps: honest number
        boxes, obj = model.apply({"params": params}, hidden, det_pos, ie,
                                 method=GroveModel.ground)
        return gen_ids, boxes, obj

    params = variables["params"]
    for _ in range(N_WARMUP):
        out = clip_once(params, frames_clip, frames_sam, ids_j, vs, det_pos)
        _ = np.asarray(out[1])

    t0 = time.time()
    prev = None
    for _ in range(N_ITERS):
        out = clip_once(params, frames_clip, frames_sam, ids_j, vs, det_pos)
        # double-buffered consumption: dispatch launch i+1 before fetching
        # launch i's results, so the relay's per-launch overhead overlaps
        # device compute (classic producer-consumer inference pipeline);
        # every result is still fetched inside the timed region
        if prev is not None:
            _ = np.asarray(prev[1])
        prev = out
    _ = np.asarray(prev[1])
    dt = (time.time() - t0) / N_ITERS
    clips_per_sec = BATCH_CLIPS / dt

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = clips_per_sec / base["value"]
    else:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "grove_small_clips_per_sec",
                       "value": clips_per_sec}, f)

    print(json.dumps({
        "metric": "grove_small_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
