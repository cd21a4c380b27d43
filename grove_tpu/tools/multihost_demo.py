"""Multi-host streaming-training demonstration (2+ CPU processes).

Proves the pod-scale training path end-to-end without a pod: N separate
python processes form a jax.distributed cluster (CPU backend, 2 virtual
devices each), each host reads ITS OWN strided shard of a prebuilt manifest
(`data/index.py` — the DistributedSampler analogue of `train.py:452-463`),
decodes real (synthetic) videos through the production `GroundingLoader`,
and the hosts jointly execute ONE SPMD train step per iteration over the
global (process_count x local_devices) "data" mesh: per-host local batches
become shards of the global batch via `globalize_batch`, and the loss/grad
all-reduce crosses hosts exactly as it would cross ICI on a pod.

Run (parent spawns the workers):
    python -m grove_tpu.tools.multihost_demo --num_processes 2 --steps 3

Each worker prints machine-checkable lines:
    DEMO rank=<r> world=<w> shard=<k1,k2,...>
    DEMO rank=<r> step=<s> loss=<f> global_batch=<n>
Cross-host all-reduce is verified by the parent: every rank must report an
IDENTICAL loss for every step (the metric is the global mean, replicated),
and the shards must be disjoint.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------

def run_worker(args) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    rank, world = jax.process_index(), jax.process_count()

    import numpy as np
    import jax.numpy as jnp

    from ..config import GroveConfig
    from ..data.index import build_manifest
    from ..models.grove import GroveModel, init_grove_params
    from ..parallel.mesh import globalize_batch, make_mesh
    from ..parallel.sharding import params_shardings, shard_pytree
    from ..text.mock_tokenizer import MockTokenizer
    from ..text.tokenizer import special_token_ids_from
    from ..train.step import (OptimizerConfig, combine_params,
                              make_optimizer, make_train_step,
                              partition_params, trainable_mask)

    # -- data: rank 0 builds, everyone else waits for the marker ----------
    root = args.workdir
    marker = os.path.join(root, "DATA_READY")
    manifest = os.path.join(root, "manifest.txt")
    if rank == 0:
        from ..data.synthetic import make_synthetic_howto_dataset
        ann_dir, video_dir, _ = make_synthetic_howto_dataset(
            root, num_videos=args.num_videos)
        build_manifest(ann_dir, manifest)
        # atomic publish: pollers must never observe a partial marker
        with open(marker + ".tmp", "w") as f:
            f.write(f"{ann_dir}\n{video_dir}\n")
        os.replace(marker + ".tmp", marker)
    deadline = time.time() + 120
    while not os.path.exists(marker):
        if time.time() > deadline:
            raise TimeoutError("rank 0 never published the dataset")
        time.sleep(0.2)
    with open(marker) as f:
        ann_dir, video_dir = f.read().splitlines()[:2]

    cfg = GroveConfig.tiny()
    tok = MockTokenizer()
    import dataclasses
    cfg = dataclasses.replace(cfg, tokens=special_token_ids_from(tok))

    # -- per-host shard of the manifest -> production loader --------------
    from ..data.datasets.howto100m import HowTo100MDataset
    from ..data.loader import GroundingLoader
    from ..data.video import VideoDecoder
    ds = HowTo100MDataset(ann_dir=ann_dir, video_dir=video_dir,
                          validation=False, manifest=manifest,
                          shard_rank=rank, shard_world=world,
                          decoder_factory=VideoDecoder,
                          num_frames=cfg.num_frames,
                          clip_size=cfg.clip.image_size,
                          sam_size=cfg.sam_enc.img_size,
                          max_phrases=cfg.max_phrases)
    print(f"DEMO rank={rank} world={world} devices={jax.device_count()} "
          f"shard={','.join(ds.keys)}", flush=True)
    loader = GroundingLoader(ds, tok, cfg, batch_size=args.local_batch,
                             num_workers=1, seed=7,
                             process_index=0, process_count=1)

    # -- global mesh + replicated params ----------------------------------
    mesh = make_mesh()          # all devices across all processes
    model, variables = init_grove_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32,
                                         batch=args.local_batch)
    params = shard_pytree(variables["params"],
                          params_shardings(variables["params"], mesh))
    opt_cfg = OptimizerConfig(total_steps=max(args.steps, 2),
                              warmup_steps=1)
    optimizer = make_optimizer(params, opt_cfg)
    mask = trainable_mask(params, opt_cfg)
    trainable, frozen = partition_params(params, mask)
    opt_state = optimizer.init(trainable)
    train_step = jax.jit(make_train_step(model, optimizer))

    it = iter(loader)
    for step in range(args.steps):
        try:
            batch, _ = next(it)
        except StopIteration:
            loader.set_epoch(step)
            it = iter(loader)
            batch, _ = next(it)
        jb = globalize_batch(batch, mesh)
        gb = jb["input_ids"].shape[0]
        trainable, opt_state, metrics = train_step(trainable, frozen,
                                                   opt_state, jb)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss
        print(f"DEMO rank={rank} step={step} loss={loss:.6f} "
              f"global_batch={gb}", flush=True)

    combine_params(trainable, frozen)    # shapes stay intact end-to-end
    print(f"DEMO rank={rank} done", flush=True)


# ---------------------------------------------------------------------------
# parent: spawn workers, verify cross-host agreement
# ---------------------------------------------------------------------------

def run_parent(args) -> dict:
    import tempfile

    workdir = args.workdir or tempfile.mkdtemp(prefix="grove_multihost_")
    os.makedirs(workdir, exist_ok=True)
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count="
                              f"{args.local_devices}").strip()
        cmd = [sys.executable, "-m", "grove_tpu.tools.multihost_demo",
               "--worker", "--coordinator", coordinator,
               "--num_processes", str(args.num_processes),
               "--process_id", str(pid), "--workdir", workdir,
               "--steps", str(args.steps),
               "--local_batch", str(args.local_batch),
               "--num_videos", str(args.num_videos)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {pid} rc={p.returncode}\n{out[-3000:]}")

    # parse + cross-check
    shards = {}
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if not line.startswith("DEMO rank="):
                continue
            kv = dict(tok.split("=", 1) for tok in line.split()[1:]
                      if "=" in tok)
            r = int(kv["rank"])
            if "shard" in kv:
                shards[r] = set(kv["shard"].split(","))
                expect = args.num_processes * args.local_devices
                assert int(kv["devices"]) == expect, (
                    "global device count mismatch", kv["devices"], expect)
            elif "loss" in kv:
                losses.setdefault(int(kv["step"]), {})[r] = float(kv["loss"])

    assert len(shards) == args.num_processes, shards
    for a in shards:
        for b_ in shards:
            if a < b_:
                assert not (shards[a] & shards[b_]), (
                    "shards overlap", shards)
    assert len(losses) == args.steps, losses
    for step, by_rank in losses.items():
        vals = list(by_rank.values())
        assert len(by_rank) == args.num_processes, (step, by_rank)
        assert max(vals) - min(vals) < 1e-6, (
            "all-reduced loss differs across hosts", step, by_rank)
    print(f"multihost demo OK: {args.num_processes} processes x "
          f"{args.local_devices} devices, {args.steps} steps, "
          f"identical global loss on every host "
          f"(step0 loss={losses[0][0]:.4f})")
    return {"shards": {k: sorted(v) for k, v in shards.items()},
            "losses": losses}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", default=2, type=int)
    p.add_argument("--process_id", default=0, type=int)
    p.add_argument("--local_devices", default=2, type=int)
    p.add_argument("--workdir", default=None)
    p.add_argument("--steps", default=3, type=int)
    p.add_argument("--local_batch", default=2, type=int)
    p.add_argument("--num_videos", default=4, type=int)
    p.add_argument("--timeout", default=900, type=float)
    args = p.parse_args(argv)
    if args.worker:
        run_worker(args)
        return None
    return run_parent(args)


if __name__ == "__main__":
    main()
