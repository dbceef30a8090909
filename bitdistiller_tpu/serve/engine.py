"""Serving engine: prefill/decode with slot-based continuous batching.

Replaces the reference's TinyChat serving stack (inference/demo.py,
stream_generators/stream_gen.py:35-193, which is strictly batch-1 with a
Python token loop) with a TPU-native design:

  * static shapes everywhere: a [B_slots, T_max] KV cache, prompts padded to
    power-of-two buckets (bounded recompiles), per-slot position vector;
  * prefill runs the cache-less forward on [1, S_bucket] returning the
    prompt's per-layer KV, which an `insert` executable writes into the slot
    (JetStream-style), so prefill cost is independent of the batch;
  * one decode executable advances ALL active slots a token per step —
    continuous batching is just slot admission on the host;
  * sampling (temperature/top-k/top-p/repetition penalty) happens on-device
    inside the decode step (serve/sampling.py).

The same engine serves interactive chat, batch teacher-data generation
(data/generation parity) and generative evals (GSM8K/HumanEval).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig
from ..models.llama import KVCache
from .sampling import SamplingParams, sample_tokens, sample_tokens_batched


@dataclasses.dataclass
class Request:
    prompt_tokens: list
    max_new_tokens: int = 256
    stream: Optional[Callable[[int], None]] = None  # per-token callback
    # per-request sampling override (None = the engine's default params);
    # each slot carries its own temperature/top-k/top-p/repetition penalty
    # on device, so one decode step serves mixed settings
    sampling: Optional[SamplingParams] = None
    # extra stop token ids beyond the engine's eos (the reference's
    # stream_gen stop_token_ids, stream_gen.py:44,62,127 — prompt templates
    # add per-family stops); checked host-side at emit time
    stop_token_ids: tuple = ()
    # called once when the request finishes (online serving wakes the
    # waiting HTTP handler here)
    on_finish: Optional[Callable[["Request"], None]] = None
    # filled by the engine:
    output_tokens: list = dataclasses.field(default_factory=list)
    finished: bool = False
    finish_reason: str = ""
    prefill_time: float = 0.0
    decode_tokens: int = 0
    decode_time: float = 0.0


def _buckets(max_len: int, lo: int = 64, factor: int = 2):
    out, b = [], lo
    while b < max_len:
        out.append(b)
        b *= factor
    out.append(max_len)
    return out


class Engine:
    def __init__(
        self,
        params,
        cfg: ModelConfig,
        *,
        max_slots: int = 8,
        max_len: int = 2048,
        sampling: SamplingParams = SamplingParams(),
        eos_token_id: int | None = 2,
        cache_dtype=jnp.bfloat16,
        rep_window: int = 128,
        seed: int = 0,
        decode_horizon: int = 8,
        pipeline_rounds: bool = False,
        grow_cache: bool = True,
        cache_bucket_factor: int = 2,
    ):
        from ..ops.quant_matmul import maybe_repack_a8

        # BITDISTILLER_QMM_A8=1: one-time repack into the int8-MXU kernel's
        # extraction order (kills the per-call activation permutation gather)
        self.params = maybe_repack_a8(params)
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_len = max_len
        self.sampling = sampling
        self.eos = eos_token_id
        self.rep_window = rep_window
        # grow_cache: the KV buffer is allocated at the smallest length
        # bucket and physically re-allocated (zeros + copy) as contexts grow.
        # Decode executables are shaped by the buffer, so rounds at short
        # contexts run at native short-cache speed — decode is KV-traffic
        # bound, and neither XLA slices (materialize a copy) nor a
        # grid-bounded Pallas kernel (per-cell overhead at rep<=2) can trim
        # the streamed window of a full-size buffer (all three measured on
        # v5e; see NOTES). Growth copies are rare (one per bucket per fill)
        # and amortize to ~one extra cache pass total. Peak HBM during a
        # growth step is old+new (~1.5x the new buffer) — disable for
        # capacity-critical configs.
        self.grow_cache = grow_cache
        self.cache_buckets = _buckets(max_len, factor=cache_bucket_factor)
        first_len = self.cache_buckets[0] if grow_cache else max_len
        self.cache = KVCache.init(cfg, max_slots, first_len, cache_dtype)
        self._grow_fns: dict = {}
        self.prev_tokens = jnp.full((max_slots, rep_window), -1, jnp.int32)
        self.key = jax.random.key(seed)

        # host-side slot state. cur_tokens/lengths/active keep DEVICE mirrors:
        # admission writes first tokens on device, the per-horizon length
        # advance is a device add, and `active` uploads only when it changes —
        # per-round host->device puts are latency on remote attachments.
        self.slot_req: list[Optional[Request]] = [None] * max_slots
        self.lengths = np.zeros(max_slots, np.int32)
        self.active = np.zeros(max_slots, bool)
        self.cur_tokens = jnp.zeros(max_slots, jnp.int32)
        self._lengths_dev = jnp.zeros(max_slots, jnp.int32)
        # host mirror of _lengths_dev (admission + per-dispatch advance,
        # INCLUDING speculative in-flight horizons): upper-bounds every
        # active slot's cache position without a device sync, so dispatch
        # knows when the cache buffer must grow (see _ensure_cache)
        self._len_ub = np.zeros(max_slots, np.int64)
        self._active_dev = jnp.zeros(max_slots, bool)
        self._active_dirty = True
        # per-slot sampling vectors (engine defaults until a request
        # overrides them at admission); the uniform fast path skips them
        s = sampling
        self._temps = jnp.full(max_slots, s.temperature, jnp.float32)
        self._top_ks = jnp.full(max_slots, s.top_k, jnp.int32)
        self._top_ps = jnp.full(max_slots, s.top_p, jnp.float32)
        self._rep_pens = jnp.full(max_slots, s.repetition_penalty, jnp.float32)
        self._slot_custom = np.zeros(max_slots, bool)
        self.buckets = _buckets(max_len)
        # decode `horizon` steps per jitted call, one host sync per horizon —
        # per-step device->host syncs dominate otherwise (measured ~5x
        # engine throughput on hardware). EOS overshoot within a horizon is
        # truncated on the host.
        self.horizon = max(decode_horizon, 1)
        # pipeline_rounds: dispatch the next decode horizon speculatively
        # before fetching the previous round's tokens, hiding the per-round
        # device->host sync behind compute. Built for real TPU hosts
        # (microsecond syncs, in-process dispatch). Default OFF: on the axon
        # relay the chained donation of the KV cache measurably REGRESSES
        # E2E (0.55x -> 0.23x of raw; the relay appears to fall off the
        # in-place-donation fast path when the donated buffer is itself an
        # unfetched output) — re-measure on direct-attached hardware.
        self.pipeline_rounds = pipeline_rounds

        self._prefill = jax.jit(self._prefill_impl)
        # cache donated: in-place KV update (an undonated step would copy —
        # and at max_len 2048 double-allocate — the multi-GB cache)
        self._decode = jax.jit(
            self._decode_impl, static_argnames=("steps", "custom"),
            donate_argnums=(1,),
        )
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))

    # -- jitted pieces ------------------------------------------------------

    def _prefill_impl(self, params, tokens, last_idx):  # [nb, S], [nb]
        logits, kv = llama.forward(params, self.cfg, tokens, cache=None, return_kv=True)
        last = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
        return last, kv  # [nb, V], KV [L, nb, S, H, D]

    def _insert_impl(self, cache: KVCache, kv: KVCache, slots, n_valid):
        # kv: [L, nb, S, H, D] from prefill -> transpose to the cache's
        # head-major [L, B, H, T, D] and write rows [0, S) of the first
        # n_valid slots (nb is padded to max_slots so admission-group size
        # never recompiles); rows beyond the true prompt length hold padding
        # junk but stay masked by the per-slot position (t < cache_pos)
        def upd(buf, new):
            def one(b, i):
                return jax.lax.dynamic_update_slice(
                    b, new[:, i].astype(b.dtype)[:, None], (0, slots[i], 0, 0, 0)
                )

            return jax.lax.fori_loop(0, n_valid, lambda i, b: one(b, i), buf)

        def supd(buf, new):  # scales [L, nb, H, S] -> rows of [L, B, H, T]
            def one(b, i):
                return jax.lax.dynamic_update_slice(
                    b, new[:, i][:, None], (0, slots[i], 0, 0)
                )

            return jax.lax.fori_loop(0, n_valid, lambda i, b: one(b, i), buf)

        nk = kv.k.transpose(0, 1, 3, 2, 4)  # [L, nb, H, S, D]
        nv = kv.v.transpose(0, 1, 3, 2, 4)
        if cache.quantized:
            from ..models.llama import quantize_kv

            nk, nks = quantize_kv(nk)
            nv, nvs = quantize_kv(nv)
            return KVCache(
                k=upd(cache.k, nk), v=upd(cache.v, nv),
                k_scale=supd(cache.k_scale, nks), v_scale=supd(cache.v_scale, nvs),
            )
        return KVCache(k=upd(cache.k, nk), v=upd(cache.v, nv))

    def _decode_impl(self, params, cache, tokens, pos, active, prev_tokens, key,
                     samp, steps=1, custom=False):
        max_pos = self.max_len - 1

        def one(carry, _):
            tokens, cache, pos, prev_tokens, key = carry
            key, sub = jax.random.split(key)
            logits, cache = llama.forward(
                params, self.cfg, tokens[:, None], cache=cache, cache_pos=pos
            )
            if custom:  # per-slot sampling vectors (mixed request settings)
                next_tok = sample_tokens_batched(
                    sub, logits[:, 0], *samp, prev_tokens
                )
            else:  # uniform engine params — skips the per-row sort entirely
                next_tok = sample_tokens(sub, logits[:, 0], self.sampling, prev_tokens)
            next_tok = jnp.where(active, next_tok, 0)
            prev_tokens = jnp.concatenate(
                [prev_tokens[:, 1:], next_tok[:, None]], axis=1
            )
            pos = jnp.minimum(pos + 1, max_pos)
            return (next_tok, cache, pos, prev_tokens, key), next_tok

        (tokens, cache, pos, prev_tokens, key), toks = jax.lax.scan(
            one, (tokens, cache, pos, prev_tokens, key), None, length=steps
        )
        # the advanced key comes back as an output: the host never needs a
        # per-round jax.random.split dispatch
        return toks, cache, prev_tokens, key  # toks: [steps, B]

    # -- host scheduling ----------------------------------------------------

    def _free_slot(self) -> Optional[int]:
        for i in range(self.max_slots):
            if not self.active[i]:
                return i
        return None

    def _admit_group(self, reqs: list, slots: list):
        """Prefill several requests in ONE batched call and insert each into
        its slot (serial per-request prefills stall the whole batch)."""
        t0 = time.time()
        # truncate from the left so the cache never overflows (positions past
        # max_len would silently clamp in dynamic_update_slice)
        plens = [min(len(r.prompt_tokens), self.max_len - 1) for r in reqs]
        bucket = next(b for b in self.buckets if b >= max(plens))
        # admission batch rounded to a power-of-two bucket: prefill compute
        # scales with the group instead of always paying max_slots rows
        # (compiles bounded: one per (len-bucket, nb-bucket) pair)
        nb = 1
        while nb < len(reqs):
            nb *= 2
        nb = min(nb, self.max_slots)
        padded = np.zeros((nb, bucket), np.int32)
        last_idx = np.zeros(nb, np.int32)
        slot_arr = np.zeros(nb, np.int32)
        for i, (r, pl) in enumerate(zip(reqs, plens)):
            padded[i, :pl] = r.prompt_tokens[-pl:]
            last_idx[i] = pl - 1
            slot_arr[i] = slots[i]
        last_logits, kv = self._prefill(
            self.params, jnp.asarray(padded), jnp.asarray(last_idx)
        )
        # the prefill KV rows must fit the buffer before insertion
        self._ensure_cache(bucket)
        self.cache = self._insert(
            self.cache, kv, jnp.asarray(slot_arr), jnp.asarray(len(reqs))
        )
        # reset the repetition-penalty window of re-used slots BEFORE sampling:
        # a recycled slot must not penalize the new request with the previous
        # request's recent tokens
        admit_idx = jnp.asarray(slot_arr[: len(reqs)])
        self.prev_tokens = self.prev_tokens.at[admit_idx].set(-1)
        # per-slot sampling vectors: request overrides land here; defaults
        # restore rows a previous custom request used
        eff = [r.sampling or self.sampling for r in reqs]
        self._temps = self._temps.at[admit_idx].set(
            jnp.asarray([s.temperature for s in eff], jnp.float32))
        self._top_ks = self._top_ks.at[admit_idx].set(
            jnp.asarray([s.top_k for s in eff], jnp.int32))
        self._top_ps = self._top_ps.at[admit_idx].set(
            jnp.asarray([s.top_p for s in eff], jnp.float32))
        self._rep_pens = self._rep_pens.at[admit_idx].set(
            jnp.asarray([s.repetition_penalty for s in eff], jnp.float32))
        for r, slot in zip(reqs, slots):
            self._slot_custom[slot] = r.sampling is not None
        # first sampled token from prompt logits — kept ON DEVICE: run() reads
        # it together with the next decode horizon in one host sync (a sync
        # here would stall the decode dispatch behind prefill)
        self.key, sub = jax.random.split(self.key)
        if any(r.sampling is not None for r in reqs):
            firsts = sample_tokens_batched(
                sub, last_logits,
                self._temps[slot_arr], self._top_ks[slot_arr],
                self._top_ps[slot_arr], self._rep_pens[slot_arr],
                self.prev_tokens[slot_arr],
            )[: len(reqs)]
        else:
            firsts = sample_tokens(
                sub, last_logits, self.sampling, self.prev_tokens[slot_arr]
            )[: len(reqs)]
        # the first token joins the window so decode's penalty sees it
        self.prev_tokens = self.prev_tokens.at[admit_idx, -1].set(firsts)
        self.cur_tokens = self.cur_tokens.at[admit_idx].set(firsts)
        # device mirrors: lengths/active for the admitted slots (one tiny
        # upload per admission, none per decode round)
        self._lengths_dev = self._lengths_dev.at[admit_idx].set(
            jnp.asarray(plens, jnp.int32)
        )
        self._active_dev = self._active_dev.at[admit_idx].set(True)
        dt = time.time() - t0
        for req, slot, plen in zip(reqs, slots, plens):
            req.prefill_time = dt
            self.slot_req[slot] = req
            self.lengths[slot] = plen
            self._len_ub[slot] = plen
            self.active[slot] = True
        return firsts

    def _emit(self, slot: int, token: int):
        req = self.slot_req[slot]
        req.output_tokens.append(token)
        if req.stream:
            req.stream(token)
        stopped = (self.eos is not None and token == self.eos) or (
            token in req.stop_token_ids
        )
        done = stopped or len(req.output_tokens) >= req.max_new_tokens
        if self.lengths[slot] + 1 >= self.max_len:
            done = True
        if done:
            req.finished = True
            req.finish_reason = "stop" if stopped else "length"
            self.active[slot] = False
            self._active_dirty = True
            self.slot_req[slot] = None
            # drop back to the uniform-sampling fast path once no active
            # slot carries custom params (inactive rows are masked anyway)
            self._slot_custom[slot] = False
            if req.on_finish is not None:
                req.on_finish(req)

    def _cache_len(self) -> int:
        return self.cache.k.shape[3]

    def _ensure_cache(self, needed: int):
        """Grow the KV buffer to the smallest bucket covering `needed`
        positions (never shrinks; no-op unless grow_cache)."""
        needed = min(needed, self.max_len)
        if not self.grow_cache or needed <= self._cache_len():
            return
        new_len = next(
            (b for b in self.cache_buckets if b >= needed), self.max_len
        )
        # memoize the jitted grow per (old, new) pair; out_shardings pin the
        # current leaf shardings so TP/DP-sharded caches stay distributed
        shards = jax.tree_util.tree_map(lambda x: x.sharding, self.cache)
        key = (self._cache_len(), new_len, tuple(jax.tree_util.tree_leaves(shards)))
        fn = self._grow_fns.get(key)
        if fn is None:
            def grow(cache):
                def one(buf):
                    shape = list(buf.shape)
                    shape[3] = new_len  # T axis of [L,B,H,T,D] / [L,B,H,T]
                    nb = jnp.zeros(shape, buf.dtype)
                    return jax.lax.dynamic_update_slice(nb, buf, (0,) * buf.ndim)

                return jax.tree_util.tree_map(one, cache)

            fn = jax.jit(grow, donate_argnums=(0,), out_shardings=shards)
            self._grow_fns[key] = fn
        self.cache = fn(self.cache)

    def _dispatch_decode(self, steps: int):
        """Dispatch one decode horizon; returns the device token block
        [steps, B]. No sync: cur_tokens/lengths advance on device."""
        if self.active.any():
            self._ensure_cache(int(self._len_ub[self.active].max()) + steps)
        toks, self.cache, self.prev_tokens, self.key = self._decode(
            self.params,
            self.cache,
            self.cur_tokens,
            self._lengths_dev,
            self._active_dev,
            self.prev_tokens,
            self.key,
            (self._temps, self._top_ks, self._top_ps, self._rep_pens),
            steps=steps,
            custom=bool(self._slot_custom.any()),
        )
        self.cur_tokens = toks[-1]  # device-side, no sync
        # device lengths advance uniformly for dispatch-active slots;
        # host lengths advance at processing time (skipping finished slots —
        # divergence on inactive slots is masked and reset at admission);
        # the _len_ub mirror advances HERE so in-flight speculative rounds
        # are already counted by the next dispatch's growth check
        self._lengths_dev = self._lengths_dev + steps * self._active_dev
        self._len_ub += steps * self.active
        return toks

    def run(
        self,
        requests: Iterable[Request],
        *,
        feeder: Optional[Callable[[bool], list]] = None,
        stop: Optional[Callable[[], bool]] = None,
    ) -> list[Request]:
        """Continuous-batching loop until all requests finish.

        `feeder(idle)` (optional) is polled at every admission round for
        requests arriving DURING the run — the online-serving entry point
        (serve/server.py). It should return immediately when idle=False
        (slots are decoding) and may block briefly when idle=True (nothing
        to do but wait). The loop exits when no work remains and `stop()`
        returns True (stop defaults to "feeder exhausted == no feeder").

        Decode rounds are PIPELINED: when no host decision is pending (empty
        admission queue, token budgets and cache headroom cover another full
        horizon), round k+1 is dispatched speculatively BEFORE round k's
        tokens are fetched — the device computes while the tokens cross the
        device->host link and the host emits. A slot that turns out to have
        finished in round k wastes at most one horizon of masked compute;
        its speculative tokens are dropped exactly like EOS-overshoot within
        a horizon.
        """
        queue = list(requests)
        done: list[Request] = []
        pending = len(queue)
        # a dispatched-but-unsynced decode round:
        # (toks, steps, dispatch_active, firsts_dev, admit_reqs, admit_slots,
        #  t0, chain_rem) — chain_rem = how many MORE horizons fit within
        # every budget/headroom margin measured at real-dispatch time
        inflight = None
        while (
            pending
            or inflight is not None
            or (feeder is not None and not (stop() if stop else False))
        ):
            if inflight is None:
                if feeder is not None:
                    new = feeder(not self.active.any() and not queue)
                    queue.extend(new)
                    pending += len(new)
                    if not queue and not self.active.any():
                        continue  # idle poll (feeder blocks, no spin)
                # admit as many as fit, one batched prefill per admission round
                admit_reqs, admit_slots = [], []
                while queue:
                    slot = self._free_slot()
                    if slot is None or slot in admit_slots:
                        break
                    admit_reqs.append(queue.pop(0))
                    admit_slots.append(slot)
                    self.active[slot] = True  # reserve while gathering
                firsts_dev = None
                if admit_reqs:
                    for s in admit_slots:
                        self.active[s] = False  # _admit_group re-activates
                    # prefill/insert/sample are DISPATCHED but not synced: the
                    # decode horizon below queues right behind them and a single
                    # host read at the end collects first + horizon tokens
                    firsts_dev = self._admit_group(admit_reqs, admit_slots)
                if not self.active.any():
                    continue
                # cache-overflow guard: a slot without room for even ONE more
                # token ends (slots near the end instead shrink the horizon
                # below). Newly admitted slots are skipped — their first token
                # is still pending; the next round's guard catches them.
                pending_first = set(admit_slots) if admit_reqs else set()
                for i in range(self.max_slots):
                    if (
                        self.active[i]
                        and i not in pending_first
                        and self.lengths[i] + 1 >= self.max_len
                    ):
                        req = self.slot_req[i]
                        req.finished = True
                        req.finish_reason = "length"
                        self.active[i] = False
                        self._active_dirty = True
                        self.slot_req[i] = None
                        self._slot_custom[i] = False
                        if req.on_finish is not None:
                            req.on_finish(req)
                        done.append(req)
                        pending -= 1
                if not self.active.any():
                    continue
                # decode up to `horizon` steps for everyone, one host sync.
                # Adaptive: if some active slot's token budget runs out sooner,
                # shrink to the largest power-of-two horizon that fits — a slot
                # finishing mid-horizon wastes every remaining step (EOS is
                # unpredictable, the max_new budget is not). Power-of-two only,
                # so compiles stay bounded.
                min_rem = min(
                    self.slot_req[i].max_new_tokens
                    - len(self.slot_req[i].output_tokens)
                    - (1 if i in pending_first else 0)
                    for i in range(self.max_slots)
                    if self.active[i]
                )
                headroom = self.max_len - 1 - int(
                    max(self.lengths[i] for i in range(self.max_slots) if self.active[i])
                )
                steps = self.horizon
                while steps > 1 and (steps > max(min_rem, 1) or steps > headroom):
                    steps //= 2
                dispatch_active = self.active.copy()
                if self._active_dirty:  # upload only when a slot changed
                    self._active_dev = jnp.asarray(dispatch_active)
                    self._active_dirty = False
                t0 = time.time()
                toks = self._dispatch_decode(steps)
                chain_rem = min(min_rem, headroom) // steps - 1
                inflight = (toks, steps, dispatch_active, firsts_dev,
                            admit_reqs, admit_slots, t0, chain_rem)

            (toks, steps, dispatch_active, firsts_dev, admit_reqs,
             admit_slots, t0, chain_rem) = inflight
            inflight = None
            # speculate the next horizon BEFORE this round's sync: no first
            # tokens pending and every budget/headroom margin covers it.
            # Budget/length exits are host-predictable (the margins), so the
            # only way a slot frees unexpectedly is EOS — with requests
            # queued and EOS possible, cap the chain at depth 1 so admission
            # is re-checked every other round (<= 1 round of added latency).
            if self.pipeline_rounds and chain_rem >= 1 and firsts_dev is None:
                t1 = time.time()
                spec_toks = self._dispatch_decode(steps)
                next_chain = chain_rem - 1
                if queue and self.eos is not None:
                    next_chain = 0
                inflight = (spec_toks, steps, dispatch_active, None,
                            [], [], t1, next_chain)
            # THE host sync of this round: first tokens + horizon tokens,
            # fetched together (separate np.asarray calls = two relay
            # round-trips; device_get batches the transfer)
            if firsts_dev is not None:
                firsts_np, toks_np = jax.device_get((firsts_dev, toks))
            else:
                toks_np = jax.device_get(toks)  # [steps, B]
            dt = time.time() - t0
            if admit_reqs:
                for t_val, slot in zip(firsts_np, admit_slots):
                    self._emit(slot, int(t_val))
                for req in admit_reqs:
                    if req.finished:
                        done.append(req)
                        pending -= 1
            for i in range(self.max_slots):
                if not dispatch_active[i]:
                    continue
                req = self.slot_req[i]
                if req is None or req.finished:
                    # finished by its own first token: the horizon tokens for
                    # this slot are overshoot — drop them (cache junk is
                    # masked on slot reuse by the per-slot start position)
                    continue
                self.lengths[i] += steps
                emitted = 0
                for h in range(steps):
                    emitted += 1
                    self._emit(i, int(toks_np[h, i]))
                    if req.finished:
                        break
                req.decode_tokens += emitted
                req.decode_time += dt * emitted / steps
                if req.finished:
                    done.append(req)
                    pending -= 1
        return done

    def generate(
        self,
        prompts: list[list],
        max_new_tokens: int = 256,
    ) -> list[list]:
        reqs = [Request(prompt_tokens=p, max_new_tokens=max_new_tokens) for p in prompts]
        ordered = {id(r): i for i, r in enumerate(reqs)}
        out = [None] * len(reqs)
        for r in self.run(reqs):
            out[ordered[id(r)]] = r.output_tokens
        return out
