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
    # host-side stop predicate, called after each emitted token with the
    # output so far; True finishes the request with reason "stop". The HTTP
    # frontend uses this for multi-token stop STRINGS (decode the tail and
    # substring-match — token-id equality can't express them)
    stop_check: Optional[Callable[[list], bool]] = None
    # opt-in prompt caching: store this prompt's prefill KV (device memory!)
    # so later requests with the SAME prompt skip prefill entirely. Needs
    # Engine(prompt_cache_size > 0). Identical prompts inside one admission
    # group are deduplicated regardless (one prefill row, many slots) — the
    # best-of-n / majority-vote shape (test/gsm8k ensemble mode).
    cache_prompt: bool = False
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
        prompt_cache_size: int = 0,
        prompt_cache_bytes: int | None = None,
        spec_decode: bool = False,
        spec_k: int = 4,
        spec_ngram: int = 2,
        spec_history: int = 512,
        spec_adaptive_k: bool = True,
        spec_k_ladder: tuple = (4, 7, 11),
        spec_step_cost: float = 0.09,
        spec_ngram_backoff: bool = False,
        flash2_in_scan: bool | None = None,
        unroll_horizon: bool | None = None,
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
        # prompt cache: tuple(prompt) -> (kv [L,1,Pb,H,D] prefill-layout
        # bf16, last_logits [V], plen). LRU-capped at prompt_cache_size
        # entries; each 7B 512-token entry holds ~270 MB of HBM — size it.
        # Stored raw (pre-quantization): _insert requantizes for int8 caches.
        import collections

        # a byte budget alone also enables caching; the entry cap stays
        # modest (not unbounded) because admission's prefix lookup scans
        # entries — a byte budget full of tiny entries must not turn every
        # cache miss into an O(entries x prompt_len) walk
        if prompt_cache_bytes is not None and prompt_cache_size == 0:
            prompt_cache_size = 512
        self.prompt_cache_size = prompt_cache_size
        # optional HBM budget for the cache (entries are real device
        # buffers: a 512-token 7B entry is ~270 MB) — evicts LRU past it
        self.prompt_cache_bytes = prompt_cache_bytes
        self._prompt_cache: "collections.OrderedDict" = collections.OrderedDict()
        self._slice_fns: dict = {}
        self._extend_fns: dict = {}
        self.prompt_cache_hits = 0
        self.prompt_cache_prefix_hits = 0
        self.prompt_cache_misses = 0
        self.cache_buckets = _buckets(max_len, factor=cache_bucket_factor)
        first_len = self.cache_buckets[0] if grow_cache else max_len
        self.cache = KVCache.init(cfg, max_slots, first_len, cache_dtype)
        # Horizon-scan structure (round-5 finding): a NESTED while loop
        # (decode-step scan around the layer scan) trips an XLA memory-
        # space-assignment pathology — the gate_up/o combo-scale stacks get
        # re-copied HBM->VMEM on every LAYER iteration (+3.4 ms/step at 7B,
        # and a larger penalty for pallas consumers like flash2). UNROLLING
        # the horizon scan removes the outer while and with it the whole
        # penalty: measured 21.4 -> 18.0 ms/step (XLA attn) and 17.5 with
        # flash2 — which then beats XLA inside the scan as it does outside.
        # Default ON for TPU at 1B-class-and-up widths; the pathology needs
        # multi-MB per-layer weight stacks to bite, and at toy scale the
        # wide unrolled programs measured ~2x SLOWER than the loop (26M
        # spec bench, round 5). BITDISTILLER_UNROLL_HORIZON=0/1 overrides.
        import os as _os

        if unroll_horizon is None:
            env = _os.environ.get("BITDISTILLER_UNROLL_HORIZON")
            if env is not None:
                unroll_horizon = env != "0"
            else:
                unroll_horizon = (
                    jax.default_backend() == "tpu" and cfg.hidden_size >= 1024
                )
        self.unroll_horizon = bool(unroll_horizon)
        # flash2 inside the horizon scan: explicit True/False overrides;
        # None = auto, resolved PER CACHE BUCKET at dispatch-trace time by
        # _flash2_for_cache (decode executables are shaped by the bucket, so
        # the policy is static per executable). Auto policy: int8 caches
        # always take the kernel (XLA's convert-fused int8 reads stream at
        # ~0.6x wire rate); bf16 caches take it only with the UNROLLED
        # horizon (in a nested while the pallas consumer pays the MSA
        # re-copy penalty, round-4 measurement) and only at buckets >=
        # flash2_min_len. Round-5 unrolled scan-8 sweep (ms/step, bf16,
        # batch 8): cache 256 XLA 7.61 vs flash2 10.03; 512: 9.28 vs
        # 10.42; 1024: 12.15 vs 12.26; 2048: 17.98 vs 17.48 — the kernel
        # only wins at the 2048 bucket, so flash2_min_len defaults to 2048
        # (engine E2E at short buckets measured 517.7 vs 808.5 tok/s when
        # flash2 was forced on).
        self.flash2_in_scan = flash2_in_scan
        self.flash2_min_len = int(
            _os.environ.get("BITDISTILLER_FLASH2_MIN_LEN", 2048)
        )
        self._grow_fns: dict = {}
        self.prev_tokens = jnp.full((max_slots, rep_window), -1, jnp.int32)
        # speculative decoding via n-gram lookup (no draft model): each
        # verify round drafts spec_k tokens by matching the slot's current
        # 2-gram against its own history (prompt tail + generated tokens,
        # kept right-aligned on device) and verifies them in ONE forward of
        # S=spec_k+1 — decode is weight/KV-traffic-bound, so k+1 tokens
        # stream the weights once. Accepted-prefix semantics keep sampling
        # exact: position i+1's logits are valid iff the SAMPLED token at i
        # equals the draft fed at i+1. Rejected-position cache writes land
        # beyond the slot position and are overwritten before ever being
        # attended (same argument as prefix-extension junk rows).
        self.spec_decode = spec_decode
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        # 3-gram-with-2-gram-backoff drafting (opt-in): match the longer
        # (spec_ngram + 1)-gram first — more context, higher acceptance when
        # it hits — and fall back per row to the spec_ngram match
        self.spec_ngram_backoff = spec_ngram_backoff
        # adaptive fallback: drafting is free where decode is weight-bound
        # (7B) but the S=k+1 verify costs real compute on small models; when
        # the rolling acceptance (tokens per verify cell) drops under
        # spec_min_accept the engine dispatches the plain scan instead and
        # probes spec again every spec_retry_every rounds
        self.spec_min_accept = 1.3
        self.spec_retry_every = 16
        self._spec_ema: float | None = None
        self._spec_last_rate = 0.0  # last horizon's measured acceptance
        self._spec_off_rounds = 0
        # adaptive draft length (round-4 measurement: the best k is
        # workload-dependent — 4.97x raw at k=11 on periodic prompts but
        # 1.40x at k=4 / 1.08x at k=11 on held-out real Python). The rolling
        # acceptance EMA is inverted through a geometric per-position model
        # and the ladder k maximizing expected tokens per verify cost is
        # picked (see _current_spec_k); the static spec_k is both the
        # starting point and the fixed value when spec_adaptive_k=False.
        self.spec_adaptive_k = spec_adaptive_k
        self.spec_k_ladder = tuple(sorted(set(tuple(spec_k_ladder) + (spec_k,))))
        self.spec_step_cost = spec_step_cost
        self._spec_k_cur = spec_k  # current adaptive choice
        self._spec_k_last = spec_k  # k the last EMA update was measured at
        if pipeline_rounds and spec_decode:
            raise ValueError("pipeline_rounds and spec_decode are exclusive")
        self.history = jnp.full((max_slots, spec_history), -2, jnp.int32)
        self.spec_rounds = 0  # (round, active-slot) verify cells fetched
        self.spec_tokens = 0  # tokens those cells produced (<= k+1 each)
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
        # finer ladder for tail-only prefills (a chat turn is often short)
        self.tail_buckets = _buckets(max_len, lo=16)
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
        # donate the per-slot state vectors: updated in place, no copies
        self._admit_commit = jax.jit(
            self._admit_commit_impl, static_argnames=("custom",),
            donate_argnums=tuple(range(8, 16)) + (16,),
        )
        self._spec = jax.jit(
            self._spec_decode_impl, static_argnames=("steps", "k"),
            donate_argnums=(1, 5, 6),
        )

    # -- jitted pieces ------------------------------------------------------

    def _prefill_impl(self, params, tokens, last_idx):  # [nb, S], [nb]
        logits, kv = llama.forward(params, self.cfg, tokens, cache=None, return_kv=True)
        last = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
        return last, kv  # [nb, V], KV [L, nb, S, H, D]

    def _insert_impl(self, cache: KVCache, kv: KVCache, slots, rows, n_valid):
        # kv: [L, nb, S, H, D] from prefill -> transpose to the cache's
        # head-major [L, B, H, T, D] and write rows [0, S) of the first
        # n_valid slots; `rows[i]` picks the kv row for slot i (identical
        # prompts in one admission group share a prefill row). Rows beyond
        # the true prompt length hold padding junk but stay masked by the
        # per-slot position (t < cache_pos)
        def upd(buf, new):
            def one(b, i):
                return jax.lax.dynamic_update_slice(
                    b, new[:, rows[i]].astype(b.dtype)[:, None],
                    (0, slots[i], 0, 0, 0),
                )

            return jax.lax.fori_loop(0, n_valid, lambda i, b: one(b, i), buf)

        def supd(buf, new):  # scales [L, nb, H, S] -> rows of [L, B, H, T]
            def one(b, i):
                return jax.lax.dynamic_update_slice(
                    b, new[:, rows[i]][:, None], (0, slots[i], 0, 0)
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

    def _admit_commit_impl(self, last_logits, slot_idx, temps_n, topks_n,
                           topps_n, reppens_n, plens, sub, prev_tokens,
                           temps, top_ks, top_ps, rep_pens, cur_tokens,
                           lengths_dev, active_dev, history, hist_rows,
                           custom=False):
        """All per-slot device state of one admission in one executable.
        last_logits: [np, V] prompt logits in request order; slot_idx: [np];
        hist_rows: [np, HW] right-aligned prompt tails for the spec-decode
        history windows. The group is padded to a power of two; padded rows
        carry slot index == max_slots and every scatter drops them."""
        DROP = dict(mode="drop")
        prev_tokens = prev_tokens.at[slot_idx].set(-1, **DROP)
        temps = temps.at[slot_idx].set(temps_n, **DROP)
        top_ks = top_ks.at[slot_idx].set(topks_n, **DROP)
        top_ps = top_ps.at[slot_idx].set(topps_n, **DROP)
        rep_pens = rep_pens.at[slot_idx].set(reppens_n, **DROP)
        # gathers clip out-of-range padded indices — harmless, their sampled
        # rows never land anywhere
        if custom:
            firsts = sample_tokens_batched(
                sub, last_logits, temps[slot_idx], top_ks[slot_idx],
                top_ps[slot_idx], rep_pens[slot_idx], prev_tokens[slot_idx],
            )
        else:
            firsts = sample_tokens(
                sub, last_logits, self.sampling, prev_tokens[slot_idx]
            )
        # the first token joins the window so decode's penalty sees it
        prev_tokens = prev_tokens.at[slot_idx, -1].set(firsts, **DROP)
        cur_tokens = cur_tokens.at[slot_idx].set(firsts, **DROP)
        lengths_dev = lengths_dev.at[slot_idx].set(plens, **DROP)
        active_dev = active_dev.at[slot_idx].set(True, **DROP)
        # spec-decode history = prompt tail ++ first token (right-aligned)
        history = history.at[slot_idx].set(
            jnp.concatenate([hist_rows[:, 1:], firsts[:, None]], axis=1),
            **DROP,
        )
        return (self._replicated(firsts), prev_tokens, temps, top_ks, top_ps,
                rep_pens, cur_tokens, lengths_dev, active_dev, history)

    @staticmethod
    def _replicated(x):
        """Pin a to-be-host-fetched output to a fully-replicated layout.
        Multi-process serving runs the same engine loop on every host over
        one global mesh; a dp-sharded token output would span non-addressable
        devices and jax.device_get would fail. The constraint makes XLA
        insert the (tiny, [steps, B]-int32) all-gather inside the step.
        Single-process: identity."""
        if jax.process_count() == 1:
            return x
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P())

    def _flash2_for_cache(self, cache) -> bool:
        """Resolve the in-scan flash2 policy for one cache bucket (called at
        trace time: the decision is static per decode executable)."""
        if self.flash2_in_scan is not None:
            return self.flash2_in_scan
        import os as _os

        if (jax.default_backend() != "tpu"
                or _os.environ.get("BITDISTILLER_FLASH2") == "0"):
            return False
        if cache.quantized:
            return True
        return self.unroll_horizon and cache.k.shape[3] >= self.flash2_min_len

    def _decode_impl(self, params, cache, tokens, pos, active, prev_tokens, key,
                     samp, steps=1, custom=False):
        max_pos = self.max_len - 1
        use_flash2 = self._flash2_for_cache(cache)

        def one(carry, _):
            tokens, cache, pos, prev_tokens, key = carry
            key, sub = jax.random.split(key)
            logits, cache = llama.forward(
                params, self.cfg, tokens[:, None], cache=cache, cache_pos=pos,
                flash2=use_flash2,
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
            one, (tokens, cache, pos, prev_tokens, key), None, length=steps,
            unroll=steps if self.unroll_horizon else 1,
        )
        # the advanced key comes back as an output: the host never needs a
        # per-round jax.random.split dispatch
        return self._replicated(toks), cache, prev_tokens, key  # toks: [steps, B]

    @staticmethod
    def ngram_draft(hist: jnp.ndarray, k: int, ngram: int) -> jnp.ndarray:
        """Draft k tokens per row: find the LAST earlier occurrence of the
        trailing `ngram`-gram in the right-aligned history window and return
        the tokens that followed it (-1 rows where no match / filler
        context — a -1 draft can never equal a sampled token)."""
        b, hw = hist.shape
        ctx = hist[:, hw - ngram:]  # [B, ngram]
        m = jnp.ones((b, hw - ngram), bool)  # gram start o in [0, hw-ngram)
        for i in range(ngram):
            m = m & (hist[:, i : i + hw - ngram] == ctx[:, i : i + 1])
        ostar = jnp.max(
            jnp.where(m, jnp.arange(hw - ngram)[None, :], -1), axis=1
        )  # [B]
        have_ctx = jnp.min(ctx, axis=1) >= 0
        idx = jnp.clip(
            ostar[:, None] + ngram + jnp.arange(k)[None, :], 0, hw - 1
        )
        d = jnp.take_along_axis(hist, idx, axis=1)  # [B, k]
        ok = (ostar >= 0) & have_ctx
        return jnp.where(ok[:, None] & (d >= 0), d, -1)

    @staticmethod
    def ngram_draft_backoff(hist: jnp.ndarray, k: int, hi: int, lo: int):
        """Per-row n-gram backoff drafting: rows whose trailing `hi`-gram
        has an earlier match use that draft (more context, higher
        acceptance); rows without one fall back to the `lo`-gram draft."""
        dh = Engine.ngram_draft(hist, k, hi)
        dl = Engine.ngram_draft(hist, k, lo)
        return jnp.where(dh[:, :1] >= 0, dh, dl)

    @staticmethod
    def _var_append(buf: jnp.ndarray, toks: jnp.ndarray, n: jnp.ndarray):
        """Append the first n[b] of toks[b] to the right-aligned window
        buf[b] (per-row variable shift via a gathered view)."""
        b, w = buf.shape
        ext = jnp.concatenate([buf, toks], axis=1)  # [B, W + K]
        idx = n[:, None] + jnp.arange(w)[None, :]
        return jnp.take_along_axis(ext, idx, axis=1)

    def _spec_decode_impl(self, params, cache, tokens, pos, active,
                          prev_tokens, history, key, steps=1, k=None):
        """`steps` verify rounds: draft k tokens from the slot's own
        history (n-gram lookup), verify in one S=k+1 forward, accept
        the longest sampled==draft prefix plus the bonus token. Returns
        [steps, B, k+1] tokens with per-round valid counts [steps, B].
        `k` is static (jit-keyed): the adaptive draft length re-traces per
        ladder value."""
        max_pos = self.max_len - 1
        if k is None:
            k = self.spec_k

        def one(carry, _):
            cur, cache, pos, prev, hist, key = carry
            key, sub = jax.random.split(key)
            if self.spec_ngram_backoff:
                draft = self.ngram_draft_backoff(
                    hist, k, self.spec_ngram + 1, self.spec_ngram
                )
            else:
                draft = self.ngram_draft(hist, k, self.spec_ngram)
            tokens_in = jnp.concatenate([cur[:, None], draft], axis=1)
            # the forward reads cache < pos and the fresh S tokens causally;
            # draft==-1 rows still run (clamped to 0) but never get accepted
            logits, cache = llama.forward(
                params, self.cfg, jnp.maximum(tokens_in, 0),
                cache=cache, cache_pos=pos,
            )
            b, s, v = logits.shape
            prev_t = jnp.repeat(prev, s, axis=0)  # rep window approximation:
            # all k+1 positions share the round-start window (exact at
            # repetition_penalty == 1.0, greedy unaffected)
            sampled = sample_tokens(
                sub, logits.reshape(b * s, v), self.sampling, prev_t
            ).reshape(b, s)
            good = (sampled[:, :k] == draft).astype(jnp.int32)
            acc = jnp.cumprod(good, axis=1).sum(axis=1)  # [B] in [0, k]
            n_new = jnp.where(active, acc + 1, 0)
            cur = jnp.where(
                active, jnp.take_along_axis(sampled, acc[:, None], 1)[:, 0], 0
            )
            pos = jnp.minimum(pos + n_new, max_pos)
            prev = self._var_append(prev, sampled, n_new)
            hist = self._var_append(hist, sampled, n_new)
            return (cur, cache, pos, prev, hist, key), (sampled, n_new)

        (tokens, cache, pos, prev_tokens, history, key), (toks, counts) = (
            jax.lax.scan(
                one, (tokens, cache, pos, prev_tokens, history, key),
                None, length=steps,
                unroll=steps if self.unroll_horizon else 1,
            )
        )
        return (self._replicated(toks), self._replicated(counts), tokens,
                cache, pos, prev_tokens, history, key)

    # -- host scheduling ----------------------------------------------------

    def _free_slot(self) -> Optional[int]:
        for i in range(self.max_slots):
            if not self.active[i]:
                return i
        return None

    def _prompt_cache_put(self, key, entry):
        """Insert + LRU eviction by entry count and (optionally) by the
        summed device bytes of the stored prefill rows."""
        self._prompt_cache[key] = entry
        self._prompt_cache.move_to_end(key)  # re-inserts refresh LRU order
        while len(self._prompt_cache) > self.prompt_cache_size:
            self._prompt_cache.popitem(last=False)
        if self.prompt_cache_bytes is None:
            return
        nbytes = lambda e: e[0].k.nbytes + e[0].v.nbytes + e[1].nbytes
        total = sum(nbytes(e) for e in self._prompt_cache.values())
        while total > self.prompt_cache_bytes and self._prompt_cache:
            _, ev = self._prompt_cache.popitem(last=False)
            total -= nbytes(ev)

    def _slice_entry(self, kv: KVCache, last_logits, row: int, pb: int):
        """Slice one prefill row down to its own length bucket for the
        prompt cache (jitted, memoized per shape pair)."""
        key = (kv.k.shape, pb)
        fn = self._slice_fns.get(key)
        if fn is None:
            def f(k, v, ll, r):
                L, _, _, H, D = k.shape
                ek = jax.lax.dynamic_slice(k, (0, r, 0, 0, 0), (L, 1, pb, H, D))
                ev = jax.lax.dynamic_slice(v, (0, r, 0, 0, 0), (L, 1, pb, H, D))
                el = jax.lax.dynamic_slice(ll, (r, 0), (1, ll.shape[1]))[0]
                return ek, ev, el

            fn = jax.jit(f)
            self._slice_fns[key] = fn
        ek, ev, el = fn(kv.k, kv.v, last_logits, jnp.asarray(row, jnp.int32))
        return KVCache(k=ek, v=ev), el

    def _extend_prefix(self, ekv: KVCache, pfx_len: int, tail: list):
        """Tail-only prefill for a prompt whose PREFIX KV is cached (the
        system-prompt / multi-turn-chat shape): build a 1-row temp cache
        holding the prefix rows, run the model forward over just the tail
        tokens against it (forward's cache mask handles S>1 at a nonzero
        start position), and return the combined rows in prefill layout —
        the same form as a stored exact-hit entry, so the caller reuses the
        exact-hit insert/sample path. Compute scales with the TAIL, not the
        full prompt. Jitted and memoized per (entry shape, tail bucket,
        total bucket); pfx_len/last_idx ride as traced scalars."""
        tail_len = len(tail)
        tot = pfx_len + tail_len
        tb = next(b for b in self.tail_buckets if b >= tail_len)
        # the temp cache must cover pfx + the PADDED tail: the S-token cache
        # write is a dynamic_update_slice whose start CLAMPS to T - S — a
        # shorter buffer would silently shift the writes over the prefix
        tc_len = next(
            (b for b in self.buckets if b >= pfx_len + tb), self.max_len
        )
        key = (ekv.k.shape, tb, tc_len)
        fn = self._extend_fns.get(key)
        if fn is None:
            cfg = self.cfg

            def f(params, ek, ev, toks, pfx, last_idx):
                L, _, pb, H, D = ek.shape
                shape = (L, 1, H, tc_len, D)
                temp = KVCache(
                    k=jax.lax.dynamic_update_slice(
                        jnp.zeros(shape, ek.dtype),
                        ek.transpose(0, 1, 3, 2, 4), (0,) * 5),
                    v=jax.lax.dynamic_update_slice(
                        jnp.zeros(shape, ev.dtype),
                        ev.transpose(0, 1, 3, 2, 4), (0,) * 5),
                )
                logits, temp = llama.forward(
                    params, cfg, toks, cache=temp,
                    cache_pos=jnp.full((1,), pfx, jnp.int32),
                )
                last = jnp.take_along_axis(
                    logits, last_idx.reshape(1, 1, 1), axis=1
                )[0, 0]
                return KVCache(
                    k=temp.k.transpose(0, 1, 3, 2, 4),
                    v=temp.v.transpose(0, 1, 3, 2, 4),
                ), last

            fn = jax.jit(f)
            self._extend_fns[key] = fn
        padded = np.zeros((1, tb), np.int32)
        padded[0, :tail_len] = tail
        kv, last = fn(
            self.params, ekv.k, ekv.v, jnp.asarray(padded),
            jnp.asarray(pfx_len, jnp.int32), jnp.asarray(tail_len - 1, jnp.int32),
        )
        return kv, last, tot

    def _admit_group(self, reqs: list, slots: list):
        """Prefill several requests in ONE batched call and insert each into
        its slot (serial per-request prefills stall the whole batch).

        Identical prompts inside the group share one prefill row (the
        best-of-n / majority-vote shape); with prompt_cache_size > 0,
        prompts stored by an earlier Request(cache_prompt=True) skip
        prefill entirely — their KV rows copy from the cache entry and the
        first token samples from the stored prompt logits."""
        t0 = time.time()
        n = len(reqs)
        # truncate from the left so the cache never overflows (positions past
        # max_len would silently clamp in dynamic_update_slice)
        plens = [min(len(r.prompt_tokens), self.max_len - 1) for r in reqs]
        keys = [tuple(r.prompt_tokens[-pl:]) for r, pl in zip(reqs, plens)]

        hits: dict[int, tuple] = {}
        if self.prompt_cache_size:
            # longest-first candidate order, computed once per group: the
            # first prefix match IS the longest, so each miss stops early
            # instead of scanning every entry (admission hot path)
            cands = sorted(self._prompt_cache, key=len, reverse=True)
            for i, k in enumerate(keys):
                e = self._prompt_cache.get(k)
                if e is not None:
                    self._prompt_cache.move_to_end(k)  # LRU touch
                    hits[i] = e
                    continue
                # longest cached PROPER PREFIX: prefill only the tail
                best = None
                for ck in cands:
                    if len(ck) < len(k) and k[: len(ck)] == ck:
                        best = ck
                        break
                if best is not None:
                    ekv, _el, pl = self._prompt_cache[best]
                    tb = next(b for b in self.tail_buckets if b >= len(k) - pl)
                    if pl + tb > self.max_len:
                        continue  # padded tail would not fit: full prefill
                    self._prompt_cache.move_to_end(best)
                    kv2, last2, tot = self._extend_prefix(ekv, pl, list(k[pl:]))
                    hits[i] = (kv2, last2, tot)
                    self.prompt_cache_prefix_hits += 1
                    if reqs[i].cache_prompt:
                        self._prompt_cache_put(k, (kv2, last2, tot))
            self.prompt_cache_hits += len(hits)
            self.prompt_cache_misses += n - len(hits)

        # one prefill row per UNIQUE missing prompt
        uniq: dict[tuple, int] = {}
        row_of: dict[int, int] = {}
        for i, k in enumerate(keys):
            if i in hits:
                continue
            if k not in uniq:
                uniq[k] = len(uniq)
            row_of[i] = uniq[k]
        miss_idx = sorted(row_of)

        miss_last = kv = None
        if uniq:
            bucket = next(
                b for b in self.buckets if b >= max(plens[i] for i in miss_idx)
            )
            # prefill batch rounded to a power-of-two bucket: compute scales
            # with the group; compiles bounded per (len-bucket, nb-bucket)
            nb = 1
            while nb < len(uniq):
                nb *= 2
            nb = min(nb, self.max_slots)
            padded = np.zeros((nb, bucket), np.int32)
            last_idx = np.zeros(nb, np.int32)
            for k, row in uniq.items():
                padded[row, : len(k)] = k
                last_idx[row] = len(k) - 1
            miss_last, kv = self._prefill(
                self.params, jnp.asarray(padded), jnp.asarray(last_idx)
            )
            # the prefill KV rows must fit the buffer before insertion
            self._ensure_cache(bucket)
            ns = 1
            while ns < len(miss_idx):
                ns *= 2
            ns = min(ns, self.max_slots)
            slot_arr = np.zeros(ns, np.int32)
            rows_arr = np.zeros(ns, np.int32)
            for j, i in enumerate(miss_idx):
                slot_arr[j] = slots[i]
                rows_arr[j] = row_of[i]
            self.cache = self._insert(
                self.cache, kv, jnp.asarray(slot_arr), jnp.asarray(rows_arr),
                jnp.asarray(len(miss_idx)),
            )
            if self.prompt_cache_size:
                for i in miss_idx:
                    if not reqs[i].cache_prompt or keys[i] in self._prompt_cache:
                        continue
                    pb = next(b for b in self.buckets if b >= plens[i])
                    ekv, el = self._slice_entry(kv, miss_last, row_of[i], pb)
                    self._prompt_cache_put(keys[i], (ekv, el, plens[i]))

        # cache-hit inserts: stored prefill rows copy straight into the slot
        # (compiles bounded by the entry's length bucket)
        one_row = jnp.zeros(1, jnp.int32)
        for i, (ekv, el, _pl) in hits.items():
            self._ensure_cache(ekv.k.shape[2])
            self.cache = self._insert(
                self.cache, ekv,
                jnp.asarray(np.asarray([slots[i]], np.int32)),
                one_row, jnp.asarray(1),
            )

        # per-request last-prompt-logits rows, in request order
        if not hits:
            last_logits = jnp.take(
                miss_last, jnp.asarray([row_of[i] for i in range(n)]), axis=0
            )
        else:
            last_logits = jnp.stack([
                hits[i][1] if i in hits else miss_last[row_of[i]]
                for i in range(n)
            ])
        # ONE jitted commit for all per-slot device state: rep-window reset,
        # sampling vectors, first-token sampling from the prompt logits,
        # cur_tokens/lengths/active mirrors. These used to be ~9 eager ops —
        # each a full dispatch round-trip on a relay-attached chip, paid at
        # EVERY mid-flight admission (online serving admits nearly every
        # round at steady state).
        for r, slot in zip(reqs, slots):
            self._slot_custom[slot] = r.sampling is not None
        eff = [r.sampling or self.sampling for r in reqs]
        self.key, sub = jax.random.split(self.key)
        custom = any(r.sampling is not None for r in reqs)
        hw = self.history.shape[1]
        hist_rows = np.full((n, hw), -2, np.int32)
        for i, (r, pl) in enumerate(zip(reqs, plens)):
            tail = r.prompt_tokens[-min(pl, hw):]
            hist_rows[i, -len(tail):] = tail
        # pad the commit to a power-of-two group size: padded rows carry the
        # OUT-OF-RANGE slot index max_slots and every scatter inside the
        # commit uses mode="drop", so they write nothing (a duplicated real
        # slot would race the scatter order under stochastic sampling). The
        # executable count stays log2(slots) instead of one per exact group
        # size — warmup compiles ~5 commit programs at 16 slots, not 16.
        np_pad = 1
        while np_pad < n:
            np_pad *= 2
        pad = np_pad - n
        padded_slots = np.asarray(list(slots) + [self.max_slots] * pad, np.int32)
        eff_p = eff + [eff[-1]] * pad
        plens_p = list(plens) + [plens[-1]] * pad
        if pad:
            last_logits = jnp.concatenate(
                [last_logits, jnp.repeat(last_logits[-1:], pad, axis=0)]
            )
            hist_rows = np.concatenate(
                [hist_rows, np.repeat(hist_rows[-1:], pad, axis=0)]
            )
        (firsts, self.prev_tokens, self._temps, self._top_ks, self._top_ps,
         self._rep_pens, self.cur_tokens, self._lengths_dev,
         self._active_dev, self.history) = self._admit_commit(
            last_logits,
            jnp.asarray(padded_slots),
            jnp.asarray([s.temperature for s in eff_p], jnp.float32),
            jnp.asarray([s.top_k for s in eff_p], jnp.int32),
            jnp.asarray([s.top_p for s in eff_p], jnp.float32),
            jnp.asarray([s.repetition_penalty for s in eff_p], jnp.float32),
            jnp.asarray(plens_p, jnp.int32),
            sub,
            self.prev_tokens, self._temps, self._top_ks, self._top_ps,
            self._rep_pens, self.cur_tokens, self._lengths_dev,
            self._active_dev, self.history,
            jnp.asarray(hist_rows),
            custom=custom,
        )
        dt = time.time() - t0
        for req, slot, plen in zip(reqs, slots, plens):
            req.prefill_time = dt
            self.slot_req[slot] = req
            self.lengths[slot] = plen
            self._len_ub[slot] = plen
            self.active[slot] = True
        return firsts

    def _emit(self, slot: int, token: int, cache_len: int | None = None):
        """cache_len: cache rows used when THIS token was produced — the
        horizon emit loops pass the per-token value (the mirror already
        holds the whole horizon's advance; using it for every token would
        make the emission count near max_len depend on horizon batching,
        i.e. plain vs spec engines would truncate differently)."""
        req = self.slot_req[slot]
        req.output_tokens.append(token)
        if req.stream:
            req.stream(token)
        stopped = (self.eos is not None and token == self.eos) or (
            token in req.stop_token_ids
        )
        if not stopped and req.stop_check is not None:
            stopped = bool(req.stop_check(req.output_tokens))
        done = stopped or len(req.output_tokens) >= req.max_new_tokens
        if (self.lengths[slot] if cache_len is None else cache_len) + 1 >= self.max_len:
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

    def _spec_active(self) -> tuple:
        """Per-round (spec, probe) decision — call ONCE per round (run()
        passes the result into _dispatch_decode so the headroom bound and
        the dispatched executable can never disagree). A probe is a
        1-verify-round spec dispatch: a FULL spec horizon costs ~2x a plain
        one when drafts never land (measured ~20% E2E on a structureless
        workload), so regime re-checks stay cheap."""
        # custom per-slot sampling falls back to the plain scan (the spec
        # verify samples all positions with the UNIFORM engine params), as
        # does a non-unit ENGINE-default repetition penalty: the verify round
        # applies the round-start penalty window to all k+1 positions, which
        # is exact only at repetition_penalty == 1.0
        if (
            not self.spec_decode
            or bool(self._slot_custom.any())
            or self.sampling.repetition_penalty != 1.0
        ):
            return False, False
        if self._spec_ema is not None and self._spec_ema < self.spec_min_accept:
            # acceptance too low to pay for the verify forward: plain scan,
            # with a periodic probe so regime changes are picked up
            self._spec_off_rounds += 1
            return self._spec_off_rounds % self.spec_retry_every == 0, True
        return True, False

    @staticmethod
    def _invert_geometric(e: float, k: int) -> float:
        """Solve E_k(p) = p(1 - p^k)/(1 - p) = e for the per-position
        acceptance probability p (monotonic in p; bisection)."""
        if e <= 0.0:
            return 0.0
        if e >= k - 1e-6:
            return 1.0
        lo, hi = 0.0, 1.0 - 1e-9
        for _ in range(40):
            mid = (lo + hi) / 2
            if mid * (1 - mid ** k) / (1 - mid) < e:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    def _current_spec_k(self) -> int:
        """Adaptive draft length: invert the acceptance EMA (measured at
        the last dispatched k) through the geometric model, then pick the
        ladder k maximizing expected tokens per verify cost
        (E_k(p) + 1) / (1 + spec_step_cost * k), with 3% hysteresis so the
        choice doesn't thrash (each k is its own compiled executable)."""
        if not self.spec_adaptive_k or self._spec_ema is None:
            return self._spec_k_cur

        p = self._invert_geometric(
            max(self._spec_ema - 1.0, 0.0), max(self._spec_k_last, 1)
        )

        def value(k):
            e_k = k if p >= 1.0 else p * (1 - p ** k) / (1 - p)
            return (e_k + 1.0) / (1.0 + self.spec_step_cost * k)

        best = max(self.spec_k_ladder, key=value)
        if value(best) > value(self._spec_k_cur) * 1.03:
            self._spec_k_cur = best
        return self._spec_k_cur

    def _dispatch_decode(self, steps: int, spec: bool | None = None,
                         spec_k: int | None = None):
        """Dispatch one decode horizon; returns (tokens, counts): plain
        scan -> ([steps, B], None); spec-decode -> ([steps, B, k+1] with
        per-round valid counts [steps, B]). No sync: cur_tokens/lengths
        advance on device."""
        if self._spec_active()[0] if spec is None else spec:
            k = self._current_spec_k() if spec_k is None else spec_k
            self._spec_k_last = k
            tps = k + 1
            if self.active.any():
                self._ensure_cache(
                    int(self._len_ub[self.active].max()) + steps * tps
                )
            (toks, counts, self.cur_tokens, self.cache, self._lengths_dev,
             self.prev_tokens, self.history, self.key) = self._spec(
                self.params, self.cache, self.cur_tokens, self._lengths_dev,
                self._active_dev, self.prev_tokens, self.history, self.key,
                steps=steps, k=k,
            )
            self._len_ub += steps * tps * self.active
            return toks, counts
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
        return toks, None

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
                # Adaptive bound: the LARGEST remaining token budget — a slot
                # whose budget (or EOS) ends mid-horizon just has its
                # overshoot dropped at emit time (masked compute costs the
                # other slots nothing), but a horizon entirely past EVERY
                # budget would be pure waste. Bounding by the MINIMUM budget
                # instead (the old policy) collapses steps to 1-2 whenever
                # any slot nears its end — with staggered finishes (online
                # serving steady state) that multiplies rounds, and each
                # round pays a device->host sync. Cache headroom stays
                # min-bound: a slot past max_len would emit junk, not
                # droppable overshoot. Power-of-two only, compiles bounded.
                rems = [
                    self.slot_req[i].max_new_tokens
                    - len(self.slot_req[i].output_tokens)
                    - (1 if i in pending_first else 0)
                    for i in range(self.max_slots)
                    if self.active[i]
                ]
                min_rem, max_rem = min(rems), max(rems)
                headroom = self.max_len - 1 - int(
                    max(self.lengths[i] for i in range(self.max_slots) if self.active[i])
                )
                steps = self.horizon
                # spec-decode writes up to k+1 cache rows per round: the
                # headroom bound scales; the budget bound stays per-round
                # (every round yields >= 1 token). Decided ONCE here and
                # passed to the dispatch below.
                spec_now, spec_probe = self._spec_active()
                spec_k_now = self._current_spec_k() if spec_now else None
                # a spec round writes k+1 cache rows even at steps=1: with
                # headroom below that, forward's dynamic_update_slice write
                # start would clamp to T-S and overwrite attended history
                # below pos — force the plain scan for the round instead
                if spec_now and headroom < spec_k_now + 1:
                    spec_now = False
                tpr = (spec_k_now + 1) if spec_now else 1
                # at high acceptance a slot's whole budget completes in
                # max_rem/ema rounds — rounds past that are pure masked
                # waste (measured: k=7 at 90% acceptance lost ~20% E2E to
                # budget-overshoot rounds). Overshooting is still CORRECT
                # (emit drops it), so the expected-rounds bound uses the
                # acceptance EMA; the headroom bound stays worst-case k+1
                # (cache writes are physical).
                budget_rounds = max_rem
                # acceptance estimate: the EMA smooths regime changes, but a
                # 0.7-decay climbing from a cold start under-estimates for
                # many horizons and each under-estimate buys a whole horizon
                # of budget-overshoot rounds — the LAST horizon's measured
                # rate bounds it from below
                est = max(self._spec_ema or 0.0, self._spec_last_rate)
                if spec_now and est > 1.0:
                    budget_rounds = int(-(-max_rem // est))
                while steps > 1 and (
                    steps > max(budget_rounds, 1) or steps * tpr > headroom
                ):
                    steps //= 2
                if spec_now and spec_probe:
                    steps = 1  # cheap probe: one verify round, not a horizon
                dispatch_active = self.active.copy()
                if self._active_dirty:  # upload only when a slot changed
                    self._active_dev = jnp.asarray(dispatch_active)
                    self._active_dirty = False
                t0 = time.time()
                toks = self._dispatch_decode(steps, spec=spec_now,
                                             spec_k=spec_k_now)
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
                firsts_np, (toks_np, counts_np) = jax.device_get(
                    (firsts_dev, toks)
                )
            else:
                toks_np, counts_np = jax.device_get(toks)
            dt = time.time() - t0
            if counts_np is not None:
                cells = int((counts_np > 0).sum())
                self.spec_rounds += cells
                self.spec_tokens += int(counts_np.sum())
                if cells:
                    rate = counts_np.sum() / cells
                    self._spec_ema = (
                        rate if self._spec_ema is None
                        else 0.7 * self._spec_ema + 0.3 * rate
                    )
                    self._spec_last_rate = rate
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
                emitted = 0
                start_len = int(self.lengths[i])
                if counts_np is None:  # plain scan: one token per round
                    self.lengths[i] += steps
                    n_round = steps
                    for h in range(steps):
                        emitted += 1
                        self._emit(i, int(toks_np[h, i]), start_len + h + 1)
                        if req.finished:
                            break
                else:  # spec decode: counts_np[h, i] tokens per round
                    self.lengths[i] += int(counts_np[:, i].sum())
                    n_round = max(int(counts_np[:, i].sum()), 1)
                    for h in range(steps):
                        for j in range(int(counts_np[h, i])):
                            emitted += 1
                            self._emit(
                                i, int(toks_np[h, i, j]), start_len + emitted
                            )
                            if req.finished:
                                break
                        if req.finished:
                            break
                req.decode_tokens += emitted
                req.decode_time += dt * emitted / n_round
                if req.finished:
                    done.append(req)
                    pending -= 1
        return done

    def warmup(self, prompt_len: int = 64, verbose=None):
        """Pre-compile the hot executables before real traffic: every
        admission group size 1..max_slots (the commit/insert executables
        compile per exact group size; prompts are DISTINCT per slot so
        in-group dedup cannot collapse the prefill batch), the full and
        tail decode horizons, and (if grow_cache) the per-bucket decode
        executables by walking one slot through every cache bucket. Online
        serving otherwise pays each compile (~seconds on first traffic) on
        a live request's latency. EOS and the adaptive-speculation fallback
        are suspended for the duration (a model may emit EOS on synthetic
        prompts, silently skipping buckets; low warmup acceptance must not
        disable spec for real traffic), and the spec/prompt-cache counters
        are restored so /metrics reflects only live traffic."""
        t0 = time.time()
        plen = min(prompt_len, self.max_len // 2)
        saved = (self.eos, self.spec_min_accept, self._spec_ema,
                 self._spec_last_rate,
                 self._spec_off_rounds, self.spec_rounds, self.spec_tokens,
                 self._spec_k_cur, self._spec_k_last,
                 self.prompt_cache_hits, self.prompt_cache_prefix_hits,
                 self.prompt_cache_misses)
        self.eos = None
        self.spec_min_accept = -1.0  # keep spec executables compiling
        try:
            def prompts(n):  # distinct per slot: dedup keeps n prefill rows
                return [list(range(3 + j, 3 + j + plen))
                        for j in range(n)]

            # admission commits pad to powers of two, so only those sizes
            # compile distinct executables (prefill batches bucket the same
            # way) — warmup walks log2(slots) sizes, not every size
            sizes = []
            nbs = self.max_slots
            while nbs >= 1:
                sizes.append(nbs)
                nbs //= 2
            for nbs in sizes:
                self.generate(prompts(nbs), max_new_tokens=self.horizon + 1)
            self.generate(prompts(1), max_new_tokens=max(self.horizon - 1, 1))
            if self.spec_decode and self.spec_adaptive_k:
                # pre-compile the adaptive-k ladder: a k switch mid-traffic
                # otherwise pays a fresh (steps, k) executable compile on a
                # live request's latency (seconds on a relay attachment)
                for k in self.spec_k_ladder:
                    self._spec_k_cur = k
                    self.spec_adaptive_k = False
                    try:
                        self.generate(prompts(self.max_slots),
                                      max_new_tokens=self.horizon + 1)
                        self.generate(prompts(1), max_new_tokens=2)
                    finally:
                        self.spec_adaptive_k = True
            if self.grow_cache and self.max_len > self._cache_len():
                # one full-length trajectory grows through every bucket
                self.generate(prompts(1),
                              max_new_tokens=self.max_len - plen - 2)
                for nbs in sizes:
                    self.generate(prompts(nbs), max_new_tokens=1)
        finally:
            (self.eos, self.spec_min_accept, self._spec_ema,
             self._spec_last_rate,
             self._spec_off_rounds, self.spec_rounds, self.spec_tokens,
             self._spec_k_cur, self._spec_k_last,
             self.prompt_cache_hits, self.prompt_cache_prefix_hits,
             self.prompt_cache_misses) = saved
        if verbose:
            verbose(f"engine warmup done in {time.time() - t0:.1f}s")

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
