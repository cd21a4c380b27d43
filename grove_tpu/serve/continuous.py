"""Continuous batching: requests join/leave a persistent decode loop.

The batching engine in `server.py` groups whole requests per launch; a
request arriving mid-decode waits for the batch to finish. This engine
keeps ONE resident decode loop over `n_slots` cache slots and admits new
requests between ticks — the standard production-serving discipline
(vLLM-style), built TPU-native: static shapes everywhere, one compiled
tick program, no paged indirection.

Mechanics (all reusing the model's lockstep-decode machinery):
  * the engine tracks a single global cache column `col`; every tick
    writes all slots' K/V at `col` and advances it;
  * an admitted request's prompt (bucketed + left-padded,
    `left_pad_prompts`) is prefilled in its own (1, Lb)-capacity cache and
    the K/V slab inserted at columns [col-Lb, col); the slot's `pad_lens`
    becomes `col - real_len`, so per-slot RoPE positions and attention
    masks are exactly the offline left-padded-decode semantics — a slot's
    tokens are bit-identical to an offline `greedy_decode` of the same
    prompt (asserted in tests);
  * EOS or the per-request token budget frees a slot; its per-step hidden
    states (captured in a device ring) + host-kept prompt hidden feed the
    [DET] grounding head exactly like `generate_grounded`;
  * when `col` nears capacity the engine stops admitting and drains, then
    resets (bounded-session rotation; capacity >> prompt keeps rotations
    rare).

Reference has no serving story at all (`infer_eval_scripts/*` are batch
SLURM jobs); this is a grove_tpu extension.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GroveConfig
from ..models.grove import GroveModel
from ..models.llama import init_kv_caches
from ..text import tagging
from ..text.packing import det_gather_positions


@dataclasses.dataclass
class _Slot:
    request_id: int = -1
    real_len: int = 0                 # unpadded prompt length
    bucket_len: int = 0
    max_new: int = 0
    steps: int = 0
    prompt_ids: Optional[np.ndarray] = None
    prompt_hidden: Optional[np.ndarray] = None   # (real_len, D)
    active: bool = False


class ContinuousEngine:
    """Slot-based continuous decode over a shared KV cache.

    `image_embeds_for(slot)` are stored in a device buffer at admit time
    so the grounding head can run the moment a slot finishes.
    """

    def __init__(self, model: GroveModel, variables, cfg: GroveConfig,
                 *, n_slots: int = 4, capacity: int = 0,
                 max_new_tokens: int = 64, prompt_bucket: int = 64,
                 cache_dtype=jnp.bfloat16):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_new = max_new_tokens
        self.bucket = prompt_bucket
        self.cache_dtype = cache_dtype
        # capacity: room for the longest prompt plus a decode horizon of
        # several request generations before a rotation
        self.capacity = capacity or (cfg.spliced_seq_len
                                     + 4 * max_new_tokens)
        self._slots = [_Slot() for _ in range(n_slots)]
        self._results: Dict[int, Dict] = {}
        self._reset_device_state()

    # ------------------------------------------------------------------
    # device state
    # ------------------------------------------------------------------

    def _reset_device_state(self):
        cfg = self.cfg
        b, c, d = self.n_slots, self.capacity, cfg.llama.hidden_size
        t = cfg.num_frames
        hw = cfg.sam_enc.grid ** 2

        @jax.jit
        def init_state():
            return {
                "caches": init_kv_caches(cfg.llama, b, c, self.cache_dtype),
                "cur_tok": jnp.zeros((b,), jnp.int32),
                "done": jnp.ones((b,), bool),
                "pad_lens": jnp.zeros((b,), jnp.int32),
                "steps": jnp.zeros((b,), jnp.int32),
                "budget": jnp.zeros((b,), jnp.int32),
                "gen": jnp.zeros((b, self.max_new), jnp.int32),
                "hid": jnp.zeros((b, self.max_new, d), self.model.dtype),
                "img": jnp.zeros((b, t, hw, cfg.sam_dec.embed_dim),
                                 self.model.dtype),
            }

        self.state = init_state()
        # column where the NEXT decode tick writes; prompts are inserted
        # to its left, so it starts at the max prompt span the capacity
        # leaves room for (== spliced_seq_len at the default capacity)
        self.col = self.capacity - 4 * self.max_new
        for s in self._slots:
            s.active = False

    # ------------------------------------------------------------------
    # compiled pieces
    # ------------------------------------------------------------------

    @functools.cached_property
    def _tick_fn(self):
        model, cfg = self.model, self.cfg
        eos, pad = int(cfg.tokens.eos), int(cfg.tokens.pad)

        # state donated: without it every 1-token tick copies the whole
        # multi-layer (n_slots x capacity) KV cache to preserve the input
        @functools.partial(jax.jit, donate_argnums=(1,))
        def tick(variables, state, col):
            tok = state["cur_tok"]
            hidden, logits, caches = model.apply(
                variables, tok[:, None], col, state["caches"],
                state["pad_lens"], method=GroveModel.decode_step)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            done = state["done"]
            emitted = jnp.where(done, pad, tok)
            idx = jnp.arange(self.n_slots)
            # `steps` counts emitted tokens (reaches max_new); the write
            # index is clamped separately so a finished slot's count is
            # not truncated by the buffer bound
            widx = jnp.minimum(state["steps"], self.max_new - 1)
            gen = state["gen"].at[idx, widx].set(
                jnp.where(done, state["gen"][idx, widx], emitted))
            hid = state["hid"].at[idx, widx].set(
                jnp.where(done[:, None],
                          state["hid"][idx, widx],
                          hidden[:, 0].astype(state["hid"].dtype)))
            steps = jnp.where(done, state["steps"], state["steps"] + 1)
            done = done | (tok == eos) | (steps >= state["budget"])
            nxt = jnp.where(done, pad, nxt)
            out = dict(state, caches=caches, cur_tok=nxt, done=done,
                       gen=gen, hid=hid, steps=steps)
            return out

        return tick

    @functools.cached_property
    def _prefill_fn(self):
        model = self.model

        @functools.lru_cache(maxsize=16)
        def for_len(lb: int):
            @jax.jit
            def prefill(variables, ids, video_embeds, video_start,
                        pad_lens):
                caches = init_kv_caches(model.cfg.llama, ids.shape[0], lb,
                                        self.cache_dtype)
                hidden, logits, caches = model.apply(
                    variables, ids, video_embeds, video_start, caches,
                    pad_lens, method=GroveModel.prefill)
                first = jnp.argmax(logits[:, -1, :],
                                   axis=-1).astype(jnp.int32)
                return hidden, first, caches
            return prefill
        return for_len

    @functools.cached_property
    def _insert_fn(self):
        @functools.partial(jax.jit, static_argnames=("slot", "lb"),
                           donate_argnums=(0,))
        def insert(state, slab, first_tok, pad_len, img, budget, *,
                   slot: int, lb: int, col):
            """Place a prefilled (1, lb)-cache slab at columns
            [col-lb, col) of `slot`'s row; arm the slot."""
            caches = []
            for layer_slab, layer_cache in zip(slab, state["caches"]):
                new = {}
                int8_layout = "k_s" in layer_cache
                for key, buf in layer_cache.items():
                    sl = layer_slab[key]
                    if int8_layout and key in ("k", "v"):
                        # int8 row-major layout (B, H, C, D): C is dim 2
                        start = (slot, 0, col - lb, 0)
                    elif key in ("k_s", "v_s"):
                        start = (slot, 0, col - lb)        # (B, H, C)
                    else:
                        start = (slot, col - lb, 0, 0)     # (B, C, H, D)
                    new[key] = jax.lax.dynamic_update_slice(
                        buf, sl.astype(buf.dtype), start)
                caches.append(new)
            idx = slot
            return dict(
                state,
                caches=caches,
                cur_tok=state["cur_tok"].at[idx].set(first_tok),
                done=state["done"].at[idx].set(False),
                pad_lens=state["pad_lens"].at[idx].set(
                    col - lb + pad_len),
                steps=state["steps"].at[idx].set(0),
                budget=state["budget"].at[idx].set(budget),
                gen=state["gen"].at[idx].set(0),
                hid=state["hid"].at[idx].set(0),
                img=state["img"].at[idx].set(
                    img.astype(state["img"].dtype)),
            )
        return insert

    @functools.cached_property
    def _ground_fn(self):
        model = self.model

        @jax.jit
        def ground(variables, hidden, det_positions, image_embeddings):
            return model.apply(variables, hidden, det_positions,
                               image_embeddings, method=GroveModel.ground)
        return ground

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self._slots) if not s.active]

    def can_admit(self, bucket_len: int) -> bool:
        return (bool(self.free_slots())
                and self.col - bucket_len >= 0
                and self.col + self.max_new <= self.capacity)

    def admit(self, request_id: int, spliced_ids: np.ndarray,
              video_embeds, video_start, image_embeddings,
              max_new: Optional[int] = None) -> int:
        """Prefill one request and arm a free slot. `spliced_ids` (Lp,)
        unpadded; `image_embeddings` (T, HW, C) for the grounding head."""
        ids = np.asarray(spliced_ids, np.int32)
        lp = len(ids)
        lb = -(-lp // self.bucket) * self.bucket
        if not self.can_admit(lb):
            raise RuntimeError("no capacity (drain in progress?)")
        slot = self.free_slots()[0]
        pad = lb - lp
        ids_b = np.full((1, lb), int(self.cfg.tokens.pad), np.int32)
        ids_b[0, pad:] = ids
        vstart = np.asarray([video_start + pad], np.int32)
        hidden, first, slab = self._prefill_fn(int(lb))(
            self.variables, jnp.asarray(ids_b), video_embeds,
            jnp.asarray(vstart), jnp.asarray([pad], np.int32))
        slab0 = [jax.tree.map(lambda x: x[0:1] if x.ndim else x, layer)
                 for layer in slab]
        budget = min(max_new or self.max_new, self.max_new)
        self.state = self._insert_fn(
            self.state, slab0, first[0], jnp.int32(pad),
            image_embeddings, jnp.int32(budget), slot=slot, lb=int(lb),
            col=jnp.int32(self.col))
        s = self._slots[slot]
        s.request_id = request_id
        s.real_len = lp
        s.bucket_len = lb
        s.max_new = max_new or self.max_new
        s.prompt_ids = ids
        s.prompt_hidden = np.asarray(hidden[0, pad:], np.float32)
        s.active = True
        return slot

    def tick(self) -> List[int]:
        """One decode step for every slot; returns request_ids finished."""
        if not any(s.active for s in self._slots):
            return []
        self.state = self._tick_fn(self.variables, self.state,
                                   jnp.int32(self.col))
        self.col += 1
        done = np.asarray(self.state["done"])
        finished = []
        for i, s in enumerate(self._slots):
            if s.active and done[i]:
                finished.append(s.request_id)
                self._finish(i)
        return finished

    def _finish(self, slot: int):
        s = self._slots[slot]
        steps = int(np.asarray(self.state["steps"])[slot])
        gen = np.asarray(self.state["gen"])[slot][:steps]
        gen_hid = np.asarray(self.state["hid"],
                             np.float32)[slot][:steps]
        full_ids = np.concatenate([s.prompt_ids, gen])
        hidden = np.concatenate([s.prompt_hidden, gen_hid], axis=0)

        det_pos, mask = det_gather_positions(full_ids,
                                             self.cfg.tokens.det,
                                             self.cfg.max_phrases)
        boxes, obj = self._ground_fn(
            self.variables,
            jnp.asarray(hidden[None], self.model.dtype),
            jnp.asarray(det_pos[None]),
            self.state["img"][slot])
        self._results[s.request_id] = {
            "generated_ids": gen,
            "full_ids": full_ids,
            "pred_boxes": np.asarray(boxes[0], np.float32),
            "objectness_logits": (np.asarray(obj[0], np.float32)
                                  if obj is not None else None),
            "phrase_mask": np.asarray(mask),
            "steps": steps,
        }
        s.active = False
        if not any(sl.active for sl in self._slots):
            # idle: rotate the column window so capacity never runs out
            self._soft_reset()

    def _soft_reset(self):
        b = self.n_slots

        @functools.partial(jax.jit, donate_argnums=(0,))
        def clear(state):
            return dict(state,
                        done=jnp.ones((b,), bool),
                        cur_tok=jnp.zeros((b,), jnp.int32),
                        steps=jnp.zeros((b,), jnp.int32))
        self.state = clear(self.state)
        self.col = self.capacity - 4 * self.max_new

    def pop_result(self, request_id: int) -> Optional[Dict]:
        return self._results.pop(request_id, None)

    def run_until_idle(self, max_ticks: Optional[int] = None) -> List[int]:
        out = []
        ticks = 0
        while any(s.active for s in self._slots):
            out.extend(self.tick())
            ticks += 1
            if max_ticks is not None and ticks >= max_ticks:
                break
        return out


# ---------------------------------------------------------------------------
# threaded serving facade (BatchingEngine-compatible surface)
# ---------------------------------------------------------------------------

class ContinuousService:
    """Drop-in alternative to `server.BatchingEngine`: same `submit`
    surface, but requests stream through one resident decode loop instead
    of whole-batch launches. Greedy-only (per-slot sampling state is not
    lockstep-able); non-default decode knobs are rejected so callers fall
    back to the batch engine.

    Threading: request threads do the CPU/encoder work (video decode,
    preprocess, CLIP/SAM launches) in parallel; a single loop thread owns
    the engine (admissions between ticks, results fan out via events).
    """

    def __init__(self, processor, model, variables, *, n_slots: int = 4,
                 max_new_tokens: int = 64, prompt_bucket: int = 64,
                 capacity: int = 0, cache_dtype=jnp.bfloat16):
        import threading

        self.processor = processor
        self.model = model
        self.variables = variables
        self.max_new = max_new_tokens
        # capacity sizing matters at full scale: the default
        # (spliced_seq_len + 4*max_new = 2239 rows) covers the LONGEST
        # caption config and costs 1.17 GB/slot in bf16 — 4 slots next
        # to the 5.77 GB weights exceeds one chip's HBM with the
        # encoder transients (measured OOM, NOTES_ROUND5). Serving a
        # known prompt surface should pass the actual need (prompt
        # bucket + decode horizon).
        self.engine = ContinuousEngine(model, variables, processor.cfg,
                                       n_slots=n_slots,
                                       max_new_tokens=max_new_tokens,
                                       prompt_bucket=prompt_bucket,
                                       capacity=capacity,
                                       cache_dtype=cache_dtype)
        self._pending: "list" = []
        self._events: Dict[int, object] = {}
        self._gen_results: Dict[int, Dict] = {}
        self._abandoned: set = set()
        self.max_queue = 256
        self._next_id = 0
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self.requests_served = 0
        self.batches_run = 0          # ticks executed (surface parity)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- BatchingEngine-compatible entry -------------------------------

    def submit(self, payload: Dict, timeout: float = 300.0) -> Dict:
        from .server import _jsonable

        # exact semantic-default checks: anything that would CHANGE the
        # greedy program is rejected (temperature=1.0 activates sampling!);
        # inert knobs (seed without sampling, the default cache dtype)
        # pass through
        unsupported = []
        if (payload.get("temperature") or 0.0) > 0.0:
            unsupported.append("temperature")
        if (payload.get("top_k") or 0) > 0:
            unsupported.append("top_k")
        if payload.get("top_p") is not None and payload["top_p"] < 1.0:
            unsupported.append("top_p")
        if (payload.get("num_beams") or 1) > 1:
            unsupported.append("num_beams")
        if payload.get("kv_cache_dtype") not in (None, "bf16", "bfloat16"):
            unsupported.append("kv_cache_dtype")
        if unsupported:
            raise ValueError(
                f"continuous batching serves greedy decode only; "
                f"unsupported knobs: {unsupported} (use the batch engine)")
        mn = min(int(payload.get("max_new_tokens") or self.max_new),
                 self.max_new)
        out = self.processor.generate_with_backend(
            self.model, self.variables, payload["video_path"],
            self._decode_backend(timeout, mn),
            instruction=payload.get("instruction"),
            temp_objectness_threshold=payload.get(
                "temp_objectness_threshold"))
        self.requests_served += 1
        return _jsonable(out)

    def close(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=5)

    # -- decode backend handed to infer_clip ---------------------------

    def _decode_backend(self, timeout: float, max_new: int):
        import threading

        def backend(spliced_ids, video_start, fc, fs):
            # jitted encoders: a bare model.apply here runs EAGERLY —
            # pathological through the relay AND every SAM intermediate
            # materializes to HBM, which OOMs at full scale next to the
            # weights + slot caches (measured, NOTES_ROUND5)
            from ..infer.jit_utils import apply_jit, encode_grounding_auto
            ve, _ = apply_jit(self.model, self.variables, fc,
                              method="encode_video")
            img = encode_grounding_auto(self.model, self.variables, fs)
            # a prompt whose bucket exceeds what the capacity leaves for
            # admission would wait forever — reject it up front
            lb = -(-len(spliced_ids) // self.engine.bucket) \
                * self.engine.bucket
            max_admit = self.engine.capacity - 4 * self.engine.max_new
            if lb > max_admit:
                raise ValueError(
                    f"prompt bucket {lb} exceeds the engine's admission "
                    f"window {max_admit} (capacity "
                    f"{self.engine.capacity}); raise `capacity`")
            ev = threading.Event()
            with self._lock:
                if len(self._pending) >= self.max_queue:
                    from .server import OverloadedError
                    raise OverloadedError("server overloaded, retry later")
                rid = self._next_id
                self._next_id += 1
                self._events[rid] = ev
                self._pending.append(
                    (rid, np.asarray(spliced_ids), ve, int(video_start),
                     img, max_new))
            self._wake.set()
            if not ev.wait(timeout):
                with self._lock:
                    # full abandonment: never admit, never keep a result
                    self._events.pop(rid, None)
                    was_pending = any(p[0] == rid for p in self._pending)
                    self._pending = [p for p in self._pending
                                     if p[0] != rid]
                    if not was_pending:
                        # already admitted: the loop drops its result at
                        # finish (and clears this marker)
                        self._abandoned.add(rid)
                    self._gen_results.pop(rid, None)
                raise TimeoutError("continuous decode timed out")
            with self._lock:
                res = self._gen_results.pop(rid)
            if isinstance(res, Exception):
                raise res
            # adapt to the generate_grounded dict surface
            return {
                "generated_ids": res["generated_ids"][None],
                "pred_boxes": res["pred_boxes"][None],
                "objectness_logits": (
                    res["objectness_logits"][None]
                    if res["objectness_logits"] is not None else None),
                "phrase_mask": res["phrase_mask"][None],
            }
        return backend

    # -- loop thread ----------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            admitted = False
            while self.engine.free_slots():
                # pop under the lock, PREFILL OUTSIDE it: admit() can
                # compile for seconds on a fresh bucket length and must
                # not block submitters/timeout cleanup
                with self._lock:
                    job = None
                    if self._pending:
                        rid, ids, ve, vstart, img, mn = self._pending[0]
                        lb = -(-len(ids) // self.engine.bucket) \
                            * self.engine.bucket
                        if self.engine.can_admit(lb):
                            job = self._pending.pop(0)
                if job is None:
                    break
                rid, ids, ve, vstart, img, mn = job
                try:
                    self.engine.admit(rid, ids, ve, vstart, img,
                                      max_new=mn)
                    admitted = True
                except Exception as e:                # noqa: BLE001
                    with self._lock:
                        ev = self._events.pop(rid, None)
                        if ev:
                            self._gen_results[rid] = e
                            ev.set()
            active = any(s.active for s in self.engine._slots)
            if not active and not admitted:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            finished = self.engine.tick()
            self.batches_run += 1
            if finished:
                with self._lock:
                    for rid in finished:
                        res = self.engine.pop_result(rid)
                        ev = self._events.pop(rid, None)
                        if ev:
                            self._gen_results[rid] = res
                            ev.set()
                        else:
                            self._abandoned.discard(rid)  # dropped result
