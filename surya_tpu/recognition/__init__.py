"""Text recognition predictor with TPU-native continuous batching.

Re-design of the reference RecognitionPredictor
(surya/recognition/__init__.py:77-942). The scheduling semantics match —
width-sorted queue, prefill when enough slots free (min_prefill_ratio),
per-slot EOS/repeat/max-token stopping — but the execution model is built
for XLA:

  - ONE fused prefill program: vision encode + <IMAGE> scatter + decoder
    prefill + KV scatter into free cache slots + first-token sampling.
    Static shapes via patch-capacity and sequence-length buckets.
  - decode runs K tokens per host visit inside jax.lax.while_loop; the
    reference pulls logits to CPU EVERY token (its :545-595). Per chunk the
    host receives only [slots, K] token/score ints and [slots, K, 6] bbox
    ints (~100KB), so decode throughput is host-independent.
  - the KV cache is a donated slot array that is never re-packed; freed
    slots are simply overwritten by the next prefill (no cache merge/trim —
    reference surya/recognition/cache.py is unnecessary by construction).
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import tqdm

from surya_tpu.common.polygon import PolygonBox
from surya_tpu.common.predictor import BasePredictor
from surya_tpu.common.profiling import stage
from surya_tpu.input.processing import (
    convert_if_not_rgb,
    slice_bboxes_from_image,
    slice_polys_from_image,
)
from surya_tpu.logging import get_logger
from surya_tpu.models import foundation, qwen_decoder
from surya_tpu.recognition.loader import load_recognition_model
from surya_tpu.recognition.postprocessing import fix_unbalanced_tags
from surya_tpu.recognition.schema import OCRResult, TextChar, TextLine
from surya_tpu.recognition.tokenizer import NOMATH_TOKEN, TaskNames
from surya_tpu.recognition.util import (
    chunk_stop_scan,
    clean_close_polygons,
    clean_math_tags,
    REPEAT_WINDOW,
    detect_repeat_token,
    interleave_shard_slots,
    prediction_to_polygon_batch,
    sort_text_lines,
    unwrap_math,
    words_from_chars,
)
from surya_tpu.settings import settings

import re

logger = get_logger()

# sentinel a prediction_loop feeder returns when its prompt stream is over
FEED_DONE = object()


@dataclass
class RecognitionPrompt:
    id: int
    task_name: str
    image: np.ndarray
    text: Optional[str]
    math_mode: bool


class RecognitionPredictor(BasePredictor):
    batch_size = settings.RECOGNITION_BATCH_SIZE
    default_batch_sizes = {"cpu": 8, "tpu": 128}
    min_prefill_ratio: float = 0.2
    # fuse the first decode chunk into a prefill dispatch when no further
    # prefill can follow (saves one dispatch per refill round). Off gives an
    # honest prefill-vs-decode wall split for profiling/bench audit.
    fuse_decode: bool = True
    tasks = {
        TaskNames.ocr_with_boxes: {"needs_bboxes": True, "img_size": (1024, 256), "max_tokens": 224},
        TaskNames.ocr_without_boxes: {"needs_bboxes": False, "img_size": (1024, 256), "max_tokens": 224},
        TaskNames.block_without_boxes: {"needs_bboxes": False, "img_size": (1024, 512), "max_tokens": 768},
    }

    def __init__(self, checkpoint: Optional[str] = None, tiny: bool = False):
        self._tiny = tiny
        super().__init__(checkpoint)

    def _load(self, checkpoint: Optional[str]):
        self.params, self.config, self.processor = load_recognition_model(checkpoint, tiny=self._tiny)
        cfg = self.config

        # multi-chip: shard slots/prefill rows over the mesh's data axis and
        # (optionally) the decoder tensor-parallel over the model axis; the
        # scheduler keeps its global view and XLA runs the programs SPMD
        self.mesh = None
        if len(jax.devices()) > 1 and settings.USE_MESH:
            from surya_tpu.parallel import mesh as meshlib

            self.mesh = meshlib.make_mesh()
            self.n_data = self.mesh.shape[meshlib.DATA_AXIS]
            self.params = meshlib.shard_foundation_params(self.params, self.mesh)
        else:
            self.n_data = 1

        batch = self.get_batch_size()
        # slot count (incl. trash slot) and prefill rows divisible by the
        # data axis so batch shardings are even
        self.n_slots = -(-(batch + 1) // self.n_data) * self.n_data - 1
        # floor at n_data (not 1): a tiny caller batch must still produce
        # shard-divisible prefill rows on a data-sharded mesh
        self.prefill_rows = max(self.n_data, -(-(batch // 4) // self.n_data) * self.n_data)
        # row buckets: big refill waves (e.g. the initial fill) go through one
        # large prefill dispatch instead of several small ones — dispatch
        # overhead is significant on remote-attached TPUs
        self.prefill_row_buckets = (self.prefill_rows, min(self.n_slots + 1, self.prefill_rows * 4))
        self.decode_chunk = settings.RECOGNITION_DECODE_CHUNK
        self.seq_buckets = tuple(settings.RECOGNITION_SEQ_BUCKETS)
        # patch-capacity buckets per prefill round: the smallest that fits is
        # used. The packed layout has no window padding, so a typical OCR
        # line is ~1500 patches; floor 4096 covers the largest single
        # block-task image (1024x512 px budget).
        max_cap = max(8192, -(-self.prefill_rows * 1536 // 512) * 512)
        caps = [4096]
        while caps[-1] < max_cap:
            caps.append(min(caps[-1] * 2, max_cap))
        self.patch_caps = tuple(caps)
        self.patch_cap = max_cap
        processor = self.processor

        def _pack(toks, scores, bboxes):
            return jnp.concatenate(
                [toks.astype(jnp.float32)[..., None], scores[..., None], bboxes.astype(jnp.float32)],
                axis=-1,
            )

        # under a mesh every Pallas kernel runs inside shard_map (slots/rows
        # shard over data, decoder heads over model when TP is on) — the jnp
        # fallback is no longer forced when scaling out (VERDICT r2 #3);
        # use_pallas stays auto (settings + device)
        use_pallas = None
        mesh = self.mesh

        nop_id = self.processor.no_output_token

        def _seed_slots(last_token, active, run, tok, slot_idx, row_valid, pin=False):
            """Device-side mirror of the host's prefill bookkeeping: seed the
            newly filled slots' scheduler state from prefill token 0."""
            done0 = jnp.zeros_like(tok, bool) if pin else (tok == cfg.eos_token_id) | (tok == nop_id)
            lt_new = jnp.where((tok == cfg.eos_token_id) | (tok == cfg.pad_token_id), cfg.pad_token_id, tok)
            last_token = last_token.at[slot_idx].set(jnp.where(row_valid, lt_new, last_token[slot_idx]))
            active = active.at[slot_idx].set(jnp.where(row_valid, ~done0, active[slot_idx]))
            # prefill token 0 starts each slot's consecutive-equal run at 1
            run = run.at[slot_idx].set(jnp.where(row_valid, 1, run[slot_idx]))
            return last_token, active, run

        def _apply_kill(last_token, active, kill):
            """Host stop-scan corrections land one dispatch late (budget/
            repeat stops the device can't see): deactivate killed slots before
            running this dispatch."""
            return jnp.where(kill, cfg.pad_token_id, last_token), active & ~kill

        # scheduler state (last_token/active) lives ON DEVICE and is threaded
        # through every dispatch, so chunk N+1 can launch before chunk N's
        # packed outputs are fetched — the fetch (a full tunnel round trip)
        # overlaps device compute instead of serializing the decode loop
        @partial(jax.jit, donate_argnums=(1, 11, 12, 13), static_argnames=("kv_range", "win_range", "pin"))
        def prefill_fn(params, cache, patches, enc_args, llm_h_idx, llm_w_idx,
                       input_ids, img_gather, seq_lens, slot_idx, row_valid,
                       last_token, active, run, kill, kv_range, win_range, pin=False):
            last_token, active = _apply_kill(last_token, active, kill)
            patches = processor.normalize_patch_rows(patches, settings.MODEL_DTYPE)
            cache, tok, score, bbox = foundation.prefill(
                params, cfg, cache, patches, enc_args, llm_h_idx, llm_w_idx,
                input_ids, img_gather, seq_lens, slot_idx,
                kv_range=kv_range, win_range=win_range, use_pallas=use_pallas, mesh=mesh,
            )
            # pack outputs into ONE array: each device_get leaf costs a full
            # tunnel round trip
            packed = jnp.concatenate(
                [tok.astype(jnp.float32)[:, None], score[:, None], bbox.astype(jnp.float32)], axis=-1
            )
            last_token, active, run = _seed_slots(last_token, active, run, tok, slot_idx, row_valid, pin=pin)
            return cache, packed, last_token, active, run

        @partial(jax.jit, static_argnames=("num_steps", "pin"), donate_argnums=(1, 2, 3, 4))
        def decode_fn(params, cache, last_token, active, run, kill, num_steps, pin=False):
            last_token, active = _apply_kill(last_token, active, kill)
            cache, toks, scores, bboxes, last_token, active, run = foundation.decode_chunk(
                params, cfg, cache, last_token, active, num_steps, use_pallas=use_pallas, mesh=mesh,
                run=run, repeat_window=0 if pin else REPEAT_WINDOW, pin_decode=pin,
            )
            return cache, _pack(toks, scores, bboxes), last_token, active, run

        @partial(jax.jit, donate_argnums=(1, 11, 12, 13), static_argnames=("kv_range", "win_range", "num_steps", "pin"))
        def prefill_decode_fn(params, cache, patches, enc_args, llm_h_idx, llm_w_idx,
                              input_ids, img_gather, seq_lens, slot_idx, row_valid,
                              last_token, active, run, kill, kv_range, win_range, num_steps, pin=False):
            """Fused prefill + decode chunk: saves one dispatch per refill
            round when the scheduler knows decode comes next."""
            last_token, active = _apply_kill(last_token, active, kill)
            patches = processor.normalize_patch_rows(patches, settings.MODEL_DTYPE)
            cache, tok, score, bbox = foundation.prefill(
                params, cfg, cache, patches, enc_args, llm_h_idx, llm_w_idx,
                input_ids, img_gather, seq_lens, slot_idx,
                kv_range=kv_range, win_range=win_range, use_pallas=use_pallas, mesh=mesh,
            )
            prefill_packed = jnp.concatenate(
                [tok.astype(jnp.float32)[:, None], score[:, None], bbox.astype(jnp.float32)], axis=-1
            )
            last_token, active, run = _seed_slots(last_token, active, run, tok, slot_idx, row_valid, pin=pin)
            cache, toks, scores, bboxes, last_token, active, run = foundation.decode_chunk(
                params, cfg, cache, last_token, active, num_steps, use_pallas=use_pallas, mesh=mesh,
                run=run, repeat_window=0 if pin else REPEAT_WINDOW, pin_decode=pin,
            )
            return cache, prefill_packed, _pack(toks, scores, bboxes), last_token, active, run

        self._prefill_fn = prefill_fn
        self._decode_fn = decode_fn
        self._prefill_decode_fn = prefill_decode_fn

    # -- slicing (host) ------------------------------------------------------

    def detect_and_slice_bboxes(self, images, task_names, det_predictor,
                                detection_batch_size=None, highres_images=None):
        with stage("recognition.detect"):
            det_predictions = det_predictor(images, batch_size=detection_batch_size)

        all_slices, slice_map, all_polygons, all_task_names, all_res_scales = [], [], [], [], []
        for det_pred, image, highres, task_name in zip(det_predictions, images, highres_images, task_names):
            polygons = [p.polygon for p in det_pred.bboxes]
            with stage("recognition.slice"):
                if highres:
                    sx = highres.size[0] / image.size[0]
                    sy = highres.size[1] / image.size[1]
                    scaled = [[[int(p[0] * sx), int(p[1] * sy)] for p in poly] for poly in polygons]
                    arr = self.processor.image_processor(highres)
                    slices = slice_polys_from_image(arr, scaled)
                    res_scales = [(sx, sy)] * len(slices)
                else:
                    arr = self.processor.image_processor(image)
                    slices = slice_polys_from_image(arr, polygons)
                    res_scales = [(1, 1)] * len(slices)
            slice_map.append(len(slices))
            all_slices.extend(slices)
            all_polygons.extend(polygons)
            all_task_names.extend([task_name] * len(slices))
            all_res_scales.extend(res_scales)

        return {
            "slices": all_slices,
            "slice_map": slice_map,
            "polygons": all_polygons,
            "task_names": all_task_names,
            "input_text": [None] * len(all_slices),
            "res_scales": all_res_scales,
        }

    def slice_bboxes(self, images, task_names, bboxes=None, polygons=None, input_text=None):
        assert bboxes is not None or polygons is not None
        slice_map, all_slices, all_polygons, all_text, all_task_names = [], [], [], [], []
        for idx, image in enumerate(images):
            arr = self.processor.image_processor(image)
            if polygons is not None:
                polys = polygons[idx]
                slices = slice_polys_from_image(arr, polys)
            else:
                slices = slice_bboxes_from_image(arr, bboxes[idx])
                polys = [
                    [[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]]
                    for b in bboxes[idx]
                ]
            slice_map.append(len(slices))
            all_slices.extend(slices)
            all_polygons.extend(polys)
            all_task_names.extend([task_names[idx]] * len(slices))
            all_text.extend([None] * len(slices) if input_text is None else input_text[idx])

        return {
            "slices": all_slices,
            "slice_map": slice_map,
            "polygons": all_polygons,
            "input_text": all_text,
            "task_names": all_task_names,
            "res_scales": [(1, 1)] * len(all_slices),
        }

    def _prepare_image(self, image: np.ndarray, task_name: str) -> np.ndarray:
        img_size = self.tasks[task_name]["img_size"]
        try:
            if image.shape[0] == 0 or image.shape[1] == 0:
                # degenerate crop (zero-area polygon): scale_to_fit returns
                # empty input unchanged and tile_image's resize would raise —
                # substitute a blank like the reference (its :272-278)
                raise cv2.error("empty crop")
            return self.processor.scale_to_fit(image, img_size)
        except cv2.error:
            # blank at scale_to_fit's MIN budget (not the task's max): a
            # degenerate crop produces no text either way, and the cache/seq
            # buckets are sized from prompt_len_bound of the original shape
            from surya_tpu.recognition.processor import MIN_IMAGE_SIZE

            return np.zeros((MIN_IMAGE_SIZE, MIN_IMAGE_SIZE, 3), np.uint8)

    def _estimate_window_slots(self, image: np.ndarray) -> int:
        f = self.processor.factor
        enc = self.config.encoder
        grid = (
            max(f, -(-int(image.shape[0]) // f) * f) // enc.patch_size,
            max(f, -(-int(image.shape[1]) // f) * f) // enc.patch_size,
        )
        return self.processor.window_slots_needed(grid, enc)

    # -- the scheduler -------------------------------------------------------

    def prediction_loop(self, flat: dict, recognition_batch_size=None, math_mode=True,
                        feeder=None, leftover_sink=None, on_done=None,
                        prompt_bound_override=None):
        """Continuous-batching scheduler. With `feeder`, the prompt set is a
        STREAM: feeder(block) returns the next group's flat dict when ready,
        None when not ready yet (block=False only), or FEED_DONE when
        exhausted — new prompts join the live run (one cache, no group-
        boundary drain). Prompt ids are assigned in arrival order, so outputs
        align with the caller's concatenated flat lists; the enqueue order is
        width-sorted per group to keep prefill rounds shape-homogeneous.

        `on_done(pid, tokens, scores, bbox_arr)` fires the moment a prompt
        completes (serving hook — see `stream()`); `prompt_bound_override`
        forces the cache prompt area to at least that many tokens so a
        stream's later prompts always fit (no leftovers)."""
        if feeder is not None and leftover_sink is None:
            leftover_sink = []

        predicted_tokens: List[List[int]] = []
        scores: List[List[float]] = []
        bboxes: List[List[np.ndarray]] = []

        B = recognition_batch_size or self.get_batch_size()
        cfg = self.config
        eos, pad, nop = cfg.eos_token_id, cfg.pad_token_id, self.processor.no_output_token
        # pinned-workload mode: stops come ONLY from the per-prompt token
        # budget — EOS/no-output/repeat are ignored on device and host, so
        # every prompt decodes exactly max_tokens tokens (bench comparability)
        pin = bool(settings.RECOGNITION_PIN_DECODE)

        queue = deque()
        max_tokens = {}

        def add_prompts(f, fit_check=False):
            """Append a group's prompts: accounting in natural (arrival)
            order, enqueue width-sorted. With fit_check, prompts whose
            prompt-bound + budget exceed the first-group-sized cache go to
            leftover_sink for a follow-up run instead."""
            base = len(predicted_tokens)
            group = list(zip(f["slices"], f["input_text"], f["task_names"]))
            for img, txt, task in group:
                predicted_tokens.append([])
                scores.append([])
                bboxes.append([])
                max_tokens[len(predicted_tokens) - 1] = (
                    settings.RECOGNITION_MAX_TOKENS or self.tasks[task]["max_tokens"]
                )
            order = sorted(range(len(group)), key=lambda j: -group[j][0].shape[1])
            for j in order:
                img, txt, task = group[j]
                idx = base + j
                prompt = RecognitionPrompt(id=idx, task_name=task, image=img, text=txt, math_mode=math_mode)
                if fit_check:
                    est = self.processor.prompt_len_bound(
                        img.shape, self.tasks[task]["img_size"], task, txt, math_mode
                    )
                    if est + max_tokens[idx] > cache_len:
                        leftover_sink.append(prompt)
                        continue
                queue.append(prompt)

        add_prompts(flat)
        feed_exhausted = feeder is None
        # an empty first group must not size the cache: pull until a prompt
        # exists (or the stream ends) before computing buckets
        while not queue and not feed_exhausted:
            nxt = feeder(True)
            if nxt is FEED_DONE:
                feed_exhausted = True
            else:
                add_prompts(nxt)

        n_slots = min(B, self.n_slots)
        if self.n_data > 1:
            # keep slots+trash divisible by the data axis (batch shardings
            # require even blocks; self.n_slots is aligned, a caller's B
            # may not be)
            n_slots = min(-(-(n_slots + 1) // self.n_data) * self.n_data, self.n_slots + 1) - 1
        # right-size the cache: decode attention reads the whole [slots, S]
        # cache every step, so S is pure bandwidth — size it to the longest
        # possible prompt bucket + generation budget for THIS workload
        # instead of the model's absolute max
        max_prompt = int(prompt_bound_override or 0)
        for p in queue:
            img_size = self.tasks[p.task_name]["img_size"]
            # exact scale_to_fit + tiling arithmetic on the actual crop — the
            # task's full pixel budget would put every line wave in a 512
            # bucket when a typical line prompt is ~60 tokens
            est_tokens = self.processor.prompt_len_bound(
                p.image.shape, img_size, p.task_name, p.text, p.math_mode
            )
            max_prompt = max(max_prompt, est_tokens)
        prompt_bucket = next((b for b in self.seq_buckets if b >= max_prompt), self.seq_buckets[-1])
        cache_len = min(
            cfg.max_sequence_length,
            -(-(prompt_bucket + max(max_tokens.values(), default=0)) // 256) * 256,
        )
        cache = qwen_decoder.init_cache(
            cfg.decoder, n_slots + 1, cache_len, settings.MODEL_DTYPE,
            quantize=settings.RECOGNITION_MODEL_QUANTIZE,
        )
        if self.mesh is not None:
            from surya_tpu.parallel import mesh as meshlib

            shardings = meshlib.cache_sharding(self.mesh)
            cache = {k: jax.device_put(v, shardings[k]) for k, v in cache.items()}
        slot_prompt: List[Optional[int]] = [None] * n_slots
        # scheduler state: authoritative copy ON DEVICE (threaded through
        # every dispatch), shadow on host for scheduling decisions, and a
        # pending-kill mask for host-detected stops (budget/repeat) that the
        # device learns about one dispatch late
        if self.mesh is not None:
            from surya_tpu.parallel import mesh as meshlib

            row_shard = meshlib.batch_sharding(self.mesh)
        else:
            row_shard = None

        def _to_dev(arr):
            return jax.device_put(arr, row_shard) if row_shard is not None else jax.device_put(arr)

        lt_dev = _to_dev(np.full(n_slots + 1, pad, np.int32))
        act_dev = _to_dev(np.zeros(n_slots + 1, bool))
        run_dev = _to_dev(np.zeros(n_slots + 1, np.int32))  # device repeat-stop run lengths
        host_active = np.zeros(n_slots + 1, bool)
        pending_kill = np.zeros(n_slots + 1, bool)

        pbar = tqdm(total=len(predicted_tokens), desc="Recognizing Text", disable=self.disable_tqdm)

        # dp: spread slot allocation round-robin over the shard blocks so
        # prefill KV writes balance across every shard's HBM (util.py)
        shard_block = (n_slots + 1) // self.n_data if self.n_data > 1 else 0

        def free_slots():
            frees = [i for i, p in enumerate(slot_prompt) if p is None]
            return interleave_shard_slots(frees, shard_block) if shard_block else frees

        def finish(slot, device_knows: bool):
            """Free a slot. device_knows: the device's own active tracking
            already stopped this slot (it emitted EOS/pad); otherwise the stop
            is host-only (budget/repeat) and must be sent down as a kill mask
            with the next dispatch."""
            pid = slot_prompt[slot]
            slot_prompt[slot] = None
            host_active[slot] = False
            if not device_knows:
                pending_kill[slot] = True
            pbar.update(1)
            if on_done is not None:
                bb = bboxes[pid]
                on_done(
                    pid, predicted_tokens[pid], scores[pid],
                    np.concatenate(bb, axis=0) if bb else np.zeros((0, 6), np.float32),
                )

        def process_decode(packed):
            # vectorized stop-scan over the [slots, K] chunk: Python runs only
            # per-slot (extend + finish events), never per-token
            toks = packed[..., 0].astype(np.int32)
            chunk_scores = packed[..., 1]
            chunk_bboxes = packed[..., 2:]
            act = [s for s in range(n_slots) if slot_prompt[s] is not None and host_active[s]]
            if not act:
                return
            K = self.decode_chunk
            W = REPEAT_WINDOW  # detect_repeat_token window (max_repeats)
            A = len(act)
            ctoks = toks[act, :K]
            prior = np.array([len(predicted_tokens[slot_prompt[s]]) for s in act])
            budget = np.array([max_tokens[slot_prompt[s]] for s in act])
            if pin:
                # budget is the only stop; the device never deactivates, so
                # every stop is host-only (kill mask on the next dispatch)
                steps = prior[:, None] + np.arange(1, K + 1)[None, :]
                hit = steps >= budget[:, None]
                any_stop = hit.any(axis=1)
                cut = np.where(any_stop, hit.argmax(axis=1), K - 1)
            else:
                tails = np.full((A, W - 1), -1, np.int32)
                for i, s in enumerate(act):
                    h = predicted_tokens[slot_prompt[s]][-(W - 1):]
                    if h:
                        tails[i, -len(h):] = h
                any_stop, cut = chunk_stop_scan(ctoks, prior, budget, tails, eos, pad, W)
            for i, s in enumerate(act):
                pid = slot_prompt[s]
                k = int(cut[i]) + 1
                predicted_tokens[pid].extend(ctoks[i, :k].tolist())
                scores[pid].extend(chunk_scores[s, :k].tolist())
                bboxes[pid].append(chunk_bboxes[s, :k])
                if any_stop[i]:
                    # EOS/pad at the cut -> the device's own tracking stopped
                    # the slot; budget/repeat stops need an explicit kill
                    finish(s, device_knows=(not pin) and int(ctoks[i, int(cut[i])]) in (eos, pad))

        def build_wave(slot_budget: int):
            """Pop prompts from the queue under slot + patch budgets and pack
            the prefill batch — pure host work. Runs either inline or in the
            builder thread, overlapping the in-flight device dispatch (only
            one build at a time ever touches the queue)."""
            round_prompts: List[RecognitionPrompt] = []
            imgs: List[np.ndarray] = []
            patch_budget = self.patch_cap
            while queue and len(round_prompts) < slot_budget:
                prompt = queue[0]
                img = self._prepare_image(prompt.image, prompt.task_name)
                need = self._estimate_window_slots(img)
                if round_prompts and need > patch_budget:
                    break
                queue.popleft()
                round_prompts.append(prompt)
                imgs.append(img)
                patch_budget -= need
            if not round_prompts:
                return None
            batch_rows = next(b for b in self.prefill_row_buckets if b >= len(round_prompts))
            with stage("recognition.prefill_build"):
                batch = self.processor.build_prefill_batch(
                    imgs,
                    [p.task_name for p in round_prompts],
                    [p.text for p in round_prompts],
                    [p.math_mode for p in round_prompts],
                    cfg.encoder,
                    batch_rows=batch_rows,
                    seq_buckets=self.seq_buckets,
                    patch_caps=self.patch_caps,
                    # data-sharded encoder: one packed plan per data shard
                    n_shards=self.n_data,
                )
            return round_prompts, batch, batch_rows

        def seed_from_prefill(packed, target_slots, round_prompts, valid_rows):
            """Host bookkeeping for prefill token 0 (reference prefill
            done-check :571-576). slot_prompt/host_active were already set
            optimistically at dispatch time. Prompt i's outputs sit at row
            valid_rows[i] (group-contiguous under the data-sharded encoder)."""
            tok0 = packed[:, 0].astype(np.int32)
            score0 = packed[:, 1]
            bbox0 = packed[:, 2:]
            for (slot, prompt, row) in zip(target_slots, round_prompts, valid_rows):
                pid = prompt.id
                t = int(tok0[row])
                predicted_tokens[pid].append(t)
                scores[pid].append(0.0 if t in (eos, pad) else float(score0[row]))
                bboxes[pid].append(bbox0[row : row + 1])
                if not pin and t in (eos, nop):
                    finish(slot, device_knows=True)

        # ONE dispatch stays in flight: its packed outputs are fetched only
        # after the NEXT dispatch has been queued, so the D2H round trip
        # (the dominant per-chunk cost on a remote-attached TPU) overlaps
        # device compute instead of serializing the loop
        inflight = None

        def drain_inflight():
            nonlocal inflight
            if inflight is None:
                return
            kind = inflight[0]
            if kind == "decode":
                # the dispatch stage only times the async enqueue; the wait
                # for device compute + D2H lands here — time it separately so
                # throughput accounting (bench) can reconstruct real walls
                with stage("recognition.drain_decode"):
                    packed = np.asarray(inflight[1])
                inflight = None
                process_decode(packed)
            else:
                _, ppacked, dpacked, target_slots, round_prompts, valid_rows = inflight
                inflight = None
                with stage("recognition.drain_prefill"):
                    if dpacked is not None:
                        ppacked, dpacked = jax.device_get((ppacked, dpacked))
                    else:
                        ppacked = np.asarray(ppacked)
                seed_from_prefill(np.asarray(ppacked), target_slots, round_prompts, valid_rows)
                if dpacked is not None:
                    process_decode(np.asarray(dpacked))

        def take_kill():
            kill = _to_dev(pending_kill.copy())
            pending_kill[:] = False
            return kill

        builder = ThreadPoolExecutor(max_workers=1)
        pending = None  # speculative build future for the next wave
        held = None  # built wave waiting for enough free slots

        while (
            queue or held is not None or pending is not None or inflight is not None
            or any(p is not None for p in slot_prompt) or not feed_exhausted
        ):
            # streaming: top up whenever the queue can no longer fill the
            # largest prefill wave. Non-blocking while any work is in flight
            # (the poll is a future.done() check); blocking only when the
            # loop would otherwise spin idle waiting for the next group.
            if not feed_exhausted and len(queue) < self.prefill_row_buckets[-1]:
                idle = not (
                    queue or held is not None or pending is not None
                    or inflight is not None or any(p is not None for p in slot_prompt)
                )
                nxt = feeder(idle)
                if nxt is FEED_DONE:
                    feed_exhausted = True
                elif nxt is not None:
                    add_prompts(nxt, fit_check=True)
                    # leftovers run in a follow-up loop with its own pbar
                    pbar.total = len(predicted_tokens) - len(leftover_sink or ())
                    pbar.refresh()
            frees = free_slots()
            if held is None and pending is not None:
                # don't block on an unfinished build while active slots could
                # be decoding — only wait when there's nothing else to do
                if pending.done() or not any(
                    slot_prompt[s] is not None and host_active[s] for s in range(n_slots)
                ):
                    held = pending.result()
                    pending = None
                    if held is None:
                        continue
            if held is not None and len(held[0]) <= len(frees):
                # the previous dispatch's outputs must land before new slots
                # are assigned (its stop events free slots and must not be
                # attributed to the wave's new occupants)
                drain_inflight()
                frees = free_slots()
                round_prompts, batch, batch_rows = held
                held = None
                slot_idx = np.full(batch_rows, n_slots, np.int32)  # trash slot
                target_slots = frees[: len(round_prompts)]
                # prompt i sits at row valid_rows[i] (group-contiguous rows
                # when the encoder is data-sharded; identity otherwise)
                valid_rows = batch.valid_rows
                slot_idx[valid_rows] = target_slots

                # fuse the following decode chunk into this dispatch when no
                # further prefill can come next (dispatch overhead is large
                # on remote-attached TPUs)
                fuse = self.fuse_decode and self._prefill_decode_fn is not None and (
                    not queue or (len(frees) - len(round_prompts)) / n_slots <= self.min_prefill_ratio
                )

                layout = batch.layout
                with stage("recognition.prefill"):
                    # ONE host->device transfer for the whole bundle (each
                    # separate jnp.asarray costs a full tunnel round trip);
                    # on a mesh, prefill rows shard over the data axis and
                    # the packed image arrays replicate
                    row_valid = np.zeros(batch_rows, bool)
                    row_valid[valid_rows] = True
                    bundle = (
                        batch.patches, layout.device_args, layout.llm_h_idx,
                        layout.llm_w_idx, batch.input_ids, batch.img_gather,
                        batch.seq_lens, slot_idx, row_valid, pending_kill.copy(),
                    )
                    pending_kill[:] = False
                    if self.mesh is not None:
                        from surya_tpu.parallel import mesh as meshlib

                        rep = meshlib.replicated(self.mesh)
                        row = meshlib.batch_sharding(self.mesh)
                        # data-sharded encoder: the stacked patch/layout
                        # arrays shard their leading [n_shards] axis over
                        # data; pure-TP meshes keep them replicated
                        img = row if batch.patches.ndim == 3 else rep
                        shard = (img, tuple(img for _ in layout.device_args), img, img, row, row, row, row, row, row)
                        args = jax.device_put(bundle, shard)
                    else:
                        args = jax.device_put(bundle)
                    *args, kill = args

                    decode_packed = None
                    if fuse:
                        cache, packed, decode_packed, lt_dev, act_dev, run_dev = self._prefill_decode_fn(
                            self.params, cache, *args, lt_dev, act_dev, run_dev, kill,
                            kv_range=layout.kv_range, win_range=layout.win_range,
                            num_steps=self.decode_chunk, pin=pin,
                        )
                    else:
                        cache, packed, lt_dev, act_dev, run_dev = self._prefill_fn(
                            self.params, cache, *args, lt_dev, act_dev, run_dev, kill,
                            kv_range=layout.kv_range, win_range=layout.win_range, pin=pin,
                        )
                    # dispatch is in flight: build the NEXT wave on the host
                    # while the device chews this one (sized to this wave —
                    # at steady state the freed slots match it)
                    if queue and pending is None:
                        pending = builder.submit(
                            build_wave, min(max(len(round_prompts), 1), self.prefill_row_buckets[-1])
                        )
                    # occupy the slots now (scheduling view); token-0 host
                    # bookkeeping happens when this dispatch is drained
                    for slot, prompt in zip(target_slots, round_prompts):
                        slot_prompt[slot] = prompt.id
                        host_active[slot] = True
                    inflight = ("prefill", packed, decode_packed, target_slots, round_prompts, valid_rows)
            elif held is None and pending is None and queue and len(frees) / n_slots > self.min_prefill_ratio:
                # no wave in flight or building: kick a build off in the
                # builder thread — while any slot is still decoding the loop
                # keeps dispatching decode chunks under it, so a build never
                # blocks a dispatch (VERDICT r4 #2); with nothing decoding the
                # pending.result() wait above degrades to the old inline build
                pending = builder.submit(
                    build_wave, min(len(frees), self.prefill_row_buckets[-1])
                )
            elif any(slot_prompt[s] is not None and host_active[s] for s in range(n_slots)):
                # if the IN-FLIGHT dispatch's outputs are guaranteed to
                # exhaust every active slot's token budget, drain first: the
                # speculative next chunk would decode K tokens the budget
                # scan discards wholesale — one wasted dispatch per final
                # wave (and ~20% of single-page latency)
                if inflight is not None:
                    if inflight[0] == "decode":
                        pending_for = lambda s: self.decode_chunk  # noqa: E731
                    else:
                        # a prefill wave delivers token 0 (+ a decode chunk
                        # when fused) to its NEW slots only; pre-existing
                        # slots get the fused chunk's tokens or nothing
                        new_slots = set(inflight[3])
                        fused_k = self.decode_chunk if inflight[2] is not None else 0
                        pending_for = (  # noqa: E731
                            lambda s: (1 + fused_k) if s in new_slots else fused_k
                        )
                    if all(
                        len(predicted_tokens[slot_prompt[s]]) + pending_for(s)
                        >= max_tokens[slot_prompt[s]]
                        for s in range(n_slots)
                        if slot_prompt[s] is not None and host_active[s]
                    ):
                        drain_inflight()
                        continue
                # -- decode chunk: K tokens fully on device; dispatch chunk
                # N+1 BEFORE fetching chunk N's outputs --
                with stage("recognition.decode"):
                    cache, packed, lt_dev, act_dev, run_dev = self._decode_fn(
                        self.params, cache, lt_dev, act_dev, run_dev, take_kill(),
                        num_steps=self.decode_chunk, pin=pin,
                    )
                drain_inflight()
                inflight = ("decode", packed)
            else:
                drain_inflight()

        builder.shutdown(wait=True)
        pbar.close()

        # observability: decoded-token volume for throughput accounting
        # (bench reads this; stage timers cover the wall-clock split).
        # Accumulates across loops within one __call__ (which resets it).
        self.last_decoded_tokens = (
            getattr(self, "last_decoded_tokens", 0) + sum(len(t) for t in predicted_tokens)
        )

        n = len(predicted_tokens)
        max_len = max((sum(b.shape[0] for b in bs) for bs in bboxes if bs), default=1)
        bbox_arr = np.zeros((n, max(max_len, 1), 6), np.float32)
        for i, bs in enumerate(bboxes):
            if bs:
                cat = np.concatenate(bs, axis=0)
                bbox_arr[i, : len(cat)] = cat
        return predicted_tokens, bbox_arr, scores

    # -- detokenization / assembly (host; reference :609-771) ---------------

    def get_bboxes_text(self, flat, predicted_tokens, scores, predicted_polygons, drop_repeated_text=False):
        char_predictions = []
        needs_boxes = [self.tasks[t]["needs_bboxes"] for t in flat["task_names"]]
        tok = self.processor.tokenizer
        eos, pad = self.config.eos_token_id, self.config.pad_token_id
        blank_bbox = [[0, 0], [0, 1], [1, 1], [1, 0]]

        for image_tokens, image_polygons, image_scores, needs_box in zip(
            predicted_tokens, predicted_polygons, scores, needs_boxes
        ):
            if self.processor.no_output_token in image_tokens:
                char_predictions.append(None)
                continue
            if drop_repeated_text and detect_repeat_token(image_tokens):
                char_predictions.append(
                    [TextChar(text="", polygon=blank_bbox, confidence=0, bbox_valid=False)]
                )
                continue

            image_polygons = image_polygons[: len(image_tokens)].tolist()

            # split the stream into qwen/special/utf-16 runs
            sequences = []
            current: List[tuple] = []
            current_kind = None

            def flush():
                nonlocal current, current_kind
                if current:
                    sequences.append((current, current_kind))
                current, current_kind = [], None

            for bbox, char_id, score in zip(image_polygons, image_tokens, image_scores):
                if char_id in (eos, pad):
                    break
                if char_id < tok.qwen_offset:
                    kind = "qwen"
                elif char_id < tok.special_token_offset:
                    kind = "special"
                else:
                    kind = "ocr"
                if kind != current_kind or kind == "special":
                    flush()
                    current_kind = kind
                current.append((char_id, score, bbox))
            flush()

            img_chars: List[TextChar] = []
            for seq, kind in sequences:
                token_ids = [s[0] for s in seq]
                seq_scores = [s[1] for s in seq]
                seq_bboxes = [s[2] for s in seq]
                if kind == "ocr":
                    text = tok.decode(token_ids, task=TaskNames.ocr_with_boxes)
                    polys = clean_close_polygons(seq_bboxes)
                    bbox_idx = 0
                    for ch in text:
                        img_chars.append(
                            TextChar(text=ch, polygon=polys[bbox_idx], confidence=seq_scores[bbox_idx], bbox_valid=True)
                        )
                        if bbox_idx < len(polys) - 1:
                            bbox_idx += 1
                elif kind == "special":
                    text = tok.decode(token_ids, task=TaskNames.ocr_without_boxes)
                    if text == NOMATH_TOKEN or re.match(r"<SCRIPT-\w+>", text):
                        continue
                    img_chars.append(
                        TextChar(text=text, polygon=blank_bbox, confidence=seq_scores[0], bbox_valid=False)
                    )
                else:
                    text = tok.decode(token_ids, task=TaskNames.block_without_boxes)
                    img_chars.append(
                        TextChar(text=text, polygon=blank_bbox, confidence=seq_scores[0], bbox_valid=False)
                    )
            char_predictions.append(img_chars)
        return char_predictions

    # -- public API ----------------------------------------------------------

    def __call__(
        self,
        images: List[Image.Image],
        task_names: Optional[List[str]] = None,
        det_predictor=None,
        detection_batch_size: Optional[int] = None,
        recognition_batch_size: Optional[int] = None,
        highres_images: Optional[List[Image.Image]] = None,
        bboxes=None,
        polygons=None,
        input_text=None,
        sort_lines: bool = False,
        math_mode: bool = True,
        return_words: bool = False,
        drop_repeated_text: bool = False,
    ) -> List[OCRResult]:
        if task_names is None:
            task_names = [TaskNames.ocr_with_boxes] * len(images)
        assert all(t in self.tasks for t in task_names)
        assert len(images) == len(task_names)

        # per-call decoded-token counter; every prediction_loop accumulates
        self.last_decoded_tokens = 0

        images = convert_if_not_rgb(images)
        highres_images = (
            convert_if_not_rgb(highres_images) if highres_images is not None else [None] * len(images)
        )

        if bboxes is None and polygons is None:
            assert det_predictor is not None, "need a detection predictor or explicit boxes"
            G = settings.RECOGNITION_DET_PIPELINE_PAGES
            if G and len(images) > G:
                # streaming pipeline: detection runs group by group in a
                # worker thread and each finished group FEEDS THE LIVE
                # continuous-batching run — one cache, no group-boundary
                # drain (a per-group run pays a low-occupancy decode tail at
                # every boundary), detection's host postprocess overlapping
                # recognition's device time throughout.
                spans = [(s, min(s + G, len(images))) for s in range(0, len(images), G)]

                def detect_span(span):
                    s, e = span
                    return self.detect_and_slice_bboxes(
                        images[s:e], task_names[s:e], det_predictor,
                        detection_batch_size=detection_batch_size,
                        highres_images=highres_images[s:e],
                    )

                with ThreadPoolExecutor(max_workers=1) as det_worker:
                    first = det_worker.submit(detect_span, spans[0]).result()
                    merged = {k: list(v) for k, v in first.items()}
                    state = {"i": 1, "fut": det_worker.submit(detect_span, spans[1]) if len(spans) > 1 else None}

                    def feeder(block):
                        fut = state["fut"]
                        if fut is None:
                            return FEED_DONE
                        if not block and not fut.done():
                            return None
                        f = fut.result()
                        state["i"] += 1
                        state["fut"] = (
                            det_worker.submit(detect_span, spans[state["i"]])
                            if state["i"] < len(spans) else None
                        )
                        for k in merged:
                            merged[k].extend(f[k])
                        return f

                    leftovers: List[RecognitionPrompt] = []
                    predicted_tokens, bbox_arr, scores = self.prediction_loop(
                        first, recognition_batch_size=recognition_batch_size,
                        math_mode=math_mode, feeder=feeder, leftover_sink=leftovers,
                    )

                if len(merged["slices"]) == 0:
                    return [
                        OCRResult(text_lines=[], image_bbox=[0, 0, img.size[0], img.size[1]])
                        for img in images
                    ]
                if leftovers:
                    # prompts that didn't fit the first-group-sized cache ran
                    # nowhere yet: a follow-up loop, spliced back by id
                    sub = {
                        "slices": [p.image for p in leftovers],
                        "input_text": [p.text for p in leftovers],
                        "task_names": [p.task_name for p in leftovers],
                    }
                    lt_toks, lt_bbox, lt_scores = self.prediction_loop(
                        sub, recognition_batch_size=recognition_batch_size, math_mode=math_mode
                    )
                    if lt_bbox.shape[1] > bbox_arr.shape[1]:
                        bbox_arr = np.pad(
                            bbox_arr, ((0, 0), (0, lt_bbox.shape[1] - bbox_arr.shape[1]), (0, 0))
                        )
                    for j, p in enumerate(leftovers):
                        predicted_tokens[p.id] = lt_toks[j]
                        scores[p.id] = lt_scores[j]
                        bbox_arr[p.id, : lt_bbox.shape[1]] = lt_bbox[j]

                return self._assemble_results(
                    images, merged, predicted_tokens, scores, bbox_arr,
                    sort_lines=sort_lines, return_words=return_words,
                    drop_repeated_text=drop_repeated_text,
                )
            flat = self.detect_and_slice_bboxes(
                images, task_names, det_predictor,
                detection_batch_size=detection_batch_size, highres_images=highres_images,
            )
        else:
            flat = self.slice_bboxes(images, task_names, bboxes=bboxes, polygons=polygons, input_text=input_text)

        # no early [] return here: zero detected lines still yields one empty
        # OCRResult per page (inside _recognize_flat), matching the pipelined
        # det->rec path and the reference's per-image output contract
        return self._recognize_flat(
            images, flat,
            recognition_batch_size=recognition_batch_size, math_mode=math_mode,
            sort_lines=sort_lines, return_words=return_words,
            drop_repeated_text=drop_repeated_text,
        )

    def stream(
        self,
        images,
        det_predictor,
        task_names=None,
        detection_batch_size: Optional[int] = None,
        recognition_batch_size: Optional[int] = None,
        group_pages: Optional[int] = None,
        math_mode: bool = True,
        sort_lines: bool = False,
        return_words: bool = False,
        drop_repeated_text: bool = False,
    ):
        """Serve a page STREAM: yields (index, OCRResult) in input order, each
        as soon as its page's lines finish decoding. `images` may be any
        iterable, including an unbounded generator — detection of later groups
        and recognition of earlier ones overlap throughout one live
        continuous-batching run, and a page's host memory is released once its
        result is yielded. Each yielded OCRResult matches what a batch
        `__call__` on that page returns (the reference has no streaming
        surface; its closest flow is surya/recognition/__init__.py:773-942).

        `task_names` may be an iterable parallel to `images`; default
        ocr_with_boxes.

        Failure semantics: if the run fails mid-stream (a feeder/detection
        error, a device error), every page that COMPLETED before the failure
        is still yielded in order, then the original exception is raised to
        the consumer. Abandoning the generator (close/GC) stops the feeder at
        the next wave boundary; prompts already dispatched finish in the
        background and are discarded.

        Memory: with an unbounded input and a slow consumer the stream holds
        at most RECOGNITION_STREAM_BUFFER_PAGES finished-but-unconsumed pages
        (default 4x the detection group size); past that, the feeder stops
        accepting new pages until the consumer catches up, so host memory is
        bounded by the buffer — not by the input length."""
        import queue as queue_mod

        # stream's default group stays at 4 pages: time-to-first-result
        # scales with the group, and the batch path's throughput-tuned
        # RECOGNITION_DET_PIPELINE_PAGES (8) must not double serving latency
        G = group_pages or 4
        max_buffer = settings.RECOGNITION_STREAM_BUFFER_PAGES or 4 * G
        self.last_decoded_tokens = 0

        img_iter = iter(images)
        task_iter = iter(task_names) if task_names is not None else None

        def next_group():
            pages, tasks = [], []
            for img in img_iter:
                pages.append(img)
                tasks.append(next(task_iter) if task_iter else TaskNames.ocr_with_boxes)
                if len(pages) >= G:
                    break
            return pages, tasks

        # cache prompt area sized once for the whole stream: the largest
        # prompt each task allows (a crop never exceeds its task's img_size
        # budget), so later prompts always fit the live cache. With caller-
        # provided task_names the bound covers EVERY registered task — later
        # groups may introduce any of them, and a leftover-routed page could
        # not yield until the (possibly unbounded) stream ends.
        def task_bound(tasks):
            if task_iter is not None:
                tasks = list(self.tasks)
            bound = 0
            for t in set(tasks):
                w, h = self.tasks[t]["img_size"]
                bound = max(bound, self.processor.prompt_len_bound((h, w, 3), (w, h), t, None, math_mode))
            return bound

        def detect_group(pages, tasks):
            pages = convert_if_not_rgb(pages)
            return self.detect_and_slice_bboxes(
                pages, tasks, det_predictor,
                detection_batch_size=detection_batch_size,
                highres_images=[None] * len(pages),
            ), pages

        evq: "queue_mod.Queue" = queue_mod.Queue()
        # backpressure + abandonment state shared between the consumer (this
        # generator) and the loop thread's feeder
        pushed = {"n": 0}  # pages handed to the scheduler
        consumed = {"n": 0}  # pages yielded to the caller
        closed = {"flag": False}  # consumer abandoned the generator
        drained = threading.Event()  # consumer made progress

        def push_pages(flat, pages, tasks):
            """Split a group flat into per-page records (consumed by the main
            thread BEFORE any of their prompts can complete)."""
            recs, start = [], 0
            for i, img in enumerate(pages):
                n = flat["slice_map"][i]
                recs.append({
                    "image": img,
                    "slices": flat["slices"][start : start + n],
                    "polygons": flat["polygons"][start : start + n],
                    "task_names": flat["task_names"][start : start + n],
                    "input_text": flat["input_text"][start : start + n],
                    "res_scales": flat["res_scales"][start : start + n],
                    "n": n,
                })
                start += n
            pushed["n"] += len(recs)
            evq.put(("pages", recs))

        first_pages, first_tasks = next_group()
        if not first_pages:
            return
        bound = task_bound(first_tasks)
        first_flat, first_pages = detect_group(first_pages, first_tasks)
        push_pages(first_flat, first_pages, first_tasks)

        leftovers: List[RecognitionPrompt] = []
        det_worker = ThreadPoolExecutor(max_workers=1)
        state = {"fut": None}
        nxt_pages, nxt_tasks = next_group()
        if nxt_pages:
            state["fut"] = det_worker.submit(detect_group, nxt_pages, nxt_tasks)
            state["tasks"] = nxt_tasks

        def feeder(block):
            if closed["flag"]:
                # consumer abandoned the generator: stop pulling the input
                # iterator at this wave boundary (in-flight prompts finish
                # and are discarded by the dying consumer)
                return FEED_DONE
            fut = state["fut"]
            if fut is None:
                return FEED_DONE
            if pushed["n"] - consumed["n"] >= max_buffer:
                # backpressure: the consumer is behind by a full buffer.
                # Non-blocking calls just decline; a BLOCKING call means the
                # scheduler is idle (every dispatched prompt already
                # finished), so waiting on the consumer here cannot deadlock.
                if not block:
                    return None
                # never wait while leftover-routed prompts exist: their pages
                # can only complete after this loop ENDS, so the consumer may
                # be stuck behind one — waiting on it would deadlock. The
                # buffer bound is abandoned for such (mixed-task, should be
                # impossible given task_bound above) streams.
                while (
                    pushed["n"] - consumed["n"] >= max_buffer
                    and not closed["flag"] and not leftovers
                ):
                    drained.wait(0.1)
                    drained.clear()
                if closed["flag"]:
                    return FEED_DONE
            if not block and not fut.done():
                return None
            flat, pages = fut.result()
            tasks = state["tasks"]
            p2, t2 = next_group()
            if p2:
                state["fut"] = det_worker.submit(detect_group, p2, t2)
                state["tasks"] = t2
            else:
                state["fut"] = None
            push_pages(flat, pages, tasks)
            return flat

        def on_done(pid, tokens, pscores, bbox2d):
            evq.put(("done", pid, list(tokens), list(pscores), bbox2d))

        def run_loop():
            try:
                self.prediction_loop(
                    first_flat, recognition_batch_size=recognition_batch_size,
                    math_mode=math_mode, feeder=feeder, leftover_sink=leftovers,
                    on_done=on_done, prompt_bound_override=bound,
                )
                evq.put(("end", None))
            except BaseException as e:  # surfaced in the consumer thread
                evq.put(("end", e))

        loop_thread = ThreadPoolExecutor(max_workers=1)
        loop_fut = loop_thread.submit(run_loop)

        # -- consumer: assemble + yield pages in order as they complete ------
        page_recs: List[dict] = []
        pid_map: List[tuple] = []  # pid -> (page_idx, local_idx)
        outputs: dict = {}  # pid -> (tokens, scores, bbox2d)
        next_yield = 0
        ended = False

        def page_ready(p):
            rec = page_recs[p]
            return rec is not None and all(
                (pid in outputs) for pid in rec["pids"]
            )

        def assemble(p):
            rec = page_recs[p]
            n = rec["n"]
            flat_page = {k: rec[k] for k in ("slices", "polygons", "task_names", "input_text", "res_scales")}
            flat_page["slice_map"] = [n]
            toks = [outputs[pid][0] for pid in rec["pids"]]
            scs = [outputs[pid][1] for pid in rec["pids"]]
            L = max([b.shape[0] for _, _, b in (outputs[pid] for pid in rec["pids"])] + [1])
            bbox_arr = np.zeros((n, L, 6), np.float32)
            for i, pid in enumerate(rec["pids"]):
                b = outputs[pid][2]
                bbox_arr[i, : b.shape[0]] = b
            [result] = self._assemble_results(
                [rec["image"]], flat_page, toks, scs, bbox_arr,
                sort_lines=sort_lines, return_words=return_words,
                drop_repeated_text=drop_repeated_text,
            )
            for pid in rec["pids"]:
                outputs.pop(pid, None)
            page_recs[p] = None  # release page memory
            return result

        error: Optional[BaseException] = None
        try:
            while True:
                while not ended:
                    try:
                        ev = evq.get(timeout=0.05)
                    except queue_mod.Empty:
                        if next_yield < len(page_recs) and page_ready(next_yield):
                            break
                        continue
                    if ev[0] == "pages":
                        for rec in ev[1]:
                            base = len(pid_map)
                            rec["pids"] = list(range(base, base + rec["n"]))
                            for j in range(rec["n"]):
                                pid_map.append((len(page_recs), j))
                            page_recs.append(rec)
                    elif ev[0] == "done":
                        outputs[ev[1]] = (ev[2], ev[3], ev[4])
                    else:  # end
                        if ev[1] is not None:
                            # deferred: pages that completed BEFORE the
                            # failure still yield in order below, then the
                            # original exception surfaces to the consumer
                            error = ev[1]
                            ended = True
                        else:
                            ended = True
                        if error is None and leftovers:
                            # mixed-task stream whose later prompts outgrew
                            # the cache bound: finish them in a follow-up run
                            sub = {
                                "slices": [p.image for p in leftovers],
                                "input_text": [p.text for p in leftovers],
                                "task_names": [p.task_name for p in leftovers],
                            }
                            lt_toks, lt_bbox, lt_scores = self.prediction_loop(
                                sub, recognition_batch_size=recognition_batch_size,
                                math_mode=math_mode,
                            )
                            for j, p in enumerate(leftovers):
                                outputs[p.id] = (lt_toks[j], lt_scores[j], lt_bbox[j])
                    if next_yield < len(page_recs) and page_ready(next_yield):
                        break
                if next_yield >= len(page_recs):
                    if ended:
                        if error is not None:
                            raise error
                        return
                    continue
                if not page_ready(next_yield):
                    if ended:
                        if error is not None:
                            # the failure left this page incomplete: every
                            # completed page has been yielded — surface it
                            raise error
                        raise RuntimeError(
                            f"stream ended with page {next_yield} incomplete (bug)"
                        )
                    continue
                yield next_yield, assemble(next_yield)
                next_yield += 1
                consumed["n"] += 1
                drained.set()
        finally:
            closed["flag"] = True
            drained.set()
            loop_fut.cancel()
            loop_thread.shutdown(wait=True)
            det_worker.shutdown(wait=True)

    def _recognize_flat(
        self, images, flat, recognition_batch_size=None, math_mode=True,
        sort_lines=False, return_words=False, drop_repeated_text=False,
    ) -> List[OCRResult]:
        """Recognize an already-sliced batch and assemble per-page OCRResults."""
        if len(flat["slices"]) == 0:
            return [
                OCRResult(text_lines=[], image_bbox=[0, 0, img.size[0], img.size[1]])
                for img in images
            ]

        # prediction_loop enqueues width-sorted internally; its outputs are
        # id-aligned with flat's natural order
        predicted_tokens, bbox_arr, scores = self.prediction_loop(
            flat, recognition_batch_size=recognition_batch_size, math_mode=math_mode
        )
        return self._assemble_results(
            images, flat, predicted_tokens, scores, bbox_arr,
            sort_lines=sort_lines, return_words=return_words,
            drop_repeated_text=drop_repeated_text,
        )

    def _assemble_results(
        self, images, flat, predicted_tokens, scores, bbox_arr, *,
        sort_lines=False, return_words=False, drop_repeated_text=False,
    ) -> List[OCRResult]:
        """Detokenize + per-page assembly. All flat lists, predicted_tokens,
        scores and bbox_arr rows must be in the same (natural) order."""
        if len(flat["slices"]) == 0:
            return [
                OCRResult(text_lines=[], image_bbox=[0, 0, img.size[0], img.size[1]])
                for img in images
            ]
        bbox_size = self.config.bbox_size
        image_sizes = [img.shape for img in flat["slices"]]
        predicted_polygons = prediction_to_polygon_batch(bbox_arr, image_sizes, bbox_size, bbox_size // 2)
        char_predictions = self.get_bboxes_text(
            flat, predicted_tokens, scores, predicted_polygons, drop_repeated_text=drop_repeated_text
        )

        results = []
        slice_start = 0
        for idx, image in enumerate(images):
            slice_end = slice_start + flat["slice_map"][idx]
            image_lines = char_predictions[slice_start:slice_end]
            polys = flat["polygons"][slice_start:slice_end]
            res_scales = flat["res_scales"][slice_start:slice_end]
            slice_start = slice_end

            lines = []
            for text_line, polygon, res_scale in zip(image_lines, polys, res_scales):
                if not text_line:
                    lines.append(
                        TextLine(text="", polygon=polygon, chars=[], confidence=1, original_text_good=True)
                    )
                    continue
                confidence = float(np.mean([c.confidence for c in text_line])) if text_line else 0
                poly_box = PolygonBox(polygon=polygon)
                for char in text_line:
                    char.rescale(res_scale, (1, 1))
                    char.shift(poly_box.bbox[0], poly_box.bbox[1])
                    char.clamp(poly_box.bbox)
                text_line = fix_unbalanced_tags(text_line, self.processor.tokenizer.special_tokens)
                text = "".join(c.text for c in text_line)
                text = unwrap_math(text)
                text = clean_math_tags(text)
                lines.append(
                    TextLine(
                        text=text,
                        polygon=polygon,
                        chars=text_line,
                        confidence=confidence,
                        words=words_from_chars(text_line, poly_box) if return_words else [],
                    )
                )
            if sort_lines:
                lines = sort_text_lines(lines)
            results.append(OCRResult(text_lines=lines, image_bbox=[0, 0, image.size[0], image.size[1]]))
        return results
