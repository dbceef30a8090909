"""Headline benchmark: int2-g128 packed 7B decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline = measured tokens/s divided by the HBM-bandwidth roofline for the
same step (packed weights + combo scale words + lm_head + KV cache read once
per step) at the chip's published ~819 GB/s (v5e) — i.e. fraction of
speed-of-light. The reference publishes no machine-readable decode numbers
(BASELINE.md), so roofline fraction is the honest yardstick.

The headline runs at cache length 2048 — the reference engine's serving
context (inference/utils/constants.py max_seq_len=2048) and the regime where
decode is genuinely HBM-bound — with the serving engine's exact dispatch
structure: 8 decode steps per dispatch, UNROLLED (round 5: a nested while
trips an XLA MSA pathology; unrolled+flash2 measures 17.48 ms/step vs 18.0
single-dispatch / 21.4 looped). The cache-256 row rides in the same JSON
(`cache256_*`): the WEIGHT-bound regime.

Modes: decode (default) | prefill (tok/s + TTFT + MFU fields) | engine
(continuous-batching E2E vs raw decode).
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bitdistiller_tpu.models import KVCache, ModelConfig, llama
from bitdistiller_tpu.models.quantized import random_packed_params

V5E_HBM_BYTES_PER_S = 819e9
V5E_BF16_FLOPS = 197e12


def model_bytes_per_step(
    cfg: ModelConfig, bits: int, batch: int, cache_len: int, kv_bytes: float = 2
) -> float:
    d, dh = cfg.hidden_size, cfg.actual_head_dim
    per_layer_weights = (
        d * cfg.num_heads * dh
        + 2 * d * cfg.num_kv_heads * dh
        + cfg.num_heads * dh * d
        + 3 * d * cfg.intermediate_size
    )
    n_weights = per_layer_weights * cfg.num_layers
    qw_bytes = n_weights * bits / 8
    scale_bytes = n_weights / 128 * 4  # one int32 combo word per group
    lm_head = d * cfg.vocab_size * 2
    # int8 cache: 1 byte/elem codes + one f32 scale per (head, token) — the
    # roofline is recomputed for the ACTUAL bytes moved, so vs_baseline stays
    # a fraction-of-speed-of-light, not a compression credit
    kv = cfg.num_layers * batch * cache_len * cfg.num_kv_heads * (dh * kv_bytes + (4 if kv_bytes == 1 else 0)) * 2
    return qw_bytes + scale_bytes + lm_head + kv


def make_cfg(layers: int) -> ModelConfig:
    return ModelConfig(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=layers,
        num_heads=32,
        num_kv_heads=32,
        max_position_embeddings=4096,
    )


def warn_stray_clients():
    """Warn loudly if another chip client is alive on this host.

    Round 3's official capture recorded 19.3 tok/s where reality was ~427
    because a leftover scripts/tpu_worker.py held the relay through the
    driver's bench window. This check cannot see other HOSTS, but it catches
    the failure mode that actually happened.
    """
    me = os.getpid()
    ancestors = {me}
    p = me
    while p > 1:  # our own shell/timeout wrappers are not contention
        try:
            with open(f"/proc/{p}/status") as f:
                p = int(next(l for l in f if l.startswith("PPid:")).split()[1])
        except (OSError, StopIteration, ValueError):
            break
        ancestors.add(p)
    stray = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) in ancestors:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace").replace("\0", " ")
        except OSError:
            continue
        if "tpu_worker" in cmd or ("bench.py" in cmd and "python" in cmd):
            stray.append((pid, cmd.strip()))
    for pid, cmd in stray:
        print(
            f"WARNING: possible concurrent chip client pid={pid}: {cmd!r} — "
            "timings may be poisoned (see BENCH_r03 anomaly)",
            file=sys.stderr,
        )
    return stray


def bench_decode(params, cfg, args, cache_len: int, steps: int, passes: int = 3):
    """Median-of-`passes` decode timing.

    Returns (ms_per_step, tokens_per_s, roofline_frac, pass_info). Each pass
    is independently synced (checksum fetch), so a relay stall poisons at most
    one pass; a pass >2x the best is discarded and re-run once. pass_info
    carries the per-pass ms list + a `stalled` flag (median >5x the HBM
    roofline step time = something other than the chip dominated the timing).
    """
    kv_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
    cache = KVCache.init(cfg, batch=args.batch, max_len=cache_len, dtype=kv_dtype)
    rng = np.random.default_rng(0)
    scan_k = max(getattr(args, "scan_steps", 1), 1)
    # --flash2 auto: single-step dispatch leaves llama.forward's own default
    # (flash2 on TPU); scanned dispatch mirrors the ENGINE's bucket-aware
    # policy (Engine._flash2_for_cache: int8 -> kernel always; bf16 ->
    # kernel only in an UNROLLED scan at cache >= 2048 — in a nested while
    # the pallas consumer pays the MSA re-copy penalty, and below the 2048
    # bucket the XLA attention measured faster, see the engine's crossover
    # sweep) so scan-steps timings measure a configuration the engine
    # actually runs.
    f2 = getattr(args, "flash2", "auto")
    if f2 != "auto":
        flash2_arg = f2 == "1"
    elif scan_k == 1:
        flash2_arg = None
    elif kv_dtype == jnp.int8:
        flash2_arg = True
    else:
        flash2_arg = bool(getattr(args, "scan_unroll", False)) and cache_len >= 2048

    # The cache is DONATED: at cache 2048 an undonated step must allocate a
    # second 8.6 GB cache for the write-back (OOM) and copy the whole buffer
    # (wrecking bandwidth). Donation is safe here because the loop rebinds
    # `cache` every step — the round-1 relay hazard was REUSING a donated
    # buffer, which the running checksum would expose anyway.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, tokens):
        logits, cache = llama.forward(params, cfg, tokens, cache=cache, cache_pos=0)
        return logits[:, -1].argmax(-1).astype(jnp.int32), cache

    def _one_step(params, cache, tokens, pos, acc):
        logits, cache = llama.forward(
            params, cfg, tokens[:, None], cache=cache, cache_pos=pos,
            flash2=flash2_arg,
        )
        tok = logits[:, -1].argmax(-1).astype(jnp.int32)
        # running checksum ties every step's logits into the final fetched
        # value — a correct fetch proves all timed dispatches really executed
        # (async dispatch errors otherwise time as impossibly fast)
        acc = acc * 1.000001 + logits[0, -1, pos % cfg.vocab_size].astype(jnp.float32)
        return tok, cache, acc

    if scan_k > 1:
        # K true decode steps per dispatch (each feeds the next token, same
        # semantics as the engine's decode-horizon scan, serve/engine.py:
        # _decode_impl): isolates the chip from the relay's fixed ~2.8 ms
        # per-dispatch overhead, which single-step dispatch pays per TOKEN
        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_step(params, cache, tokens, pos, acc):
            def body(carry, _):
                tokens, cache, pos, acc = carry
                tok, cache, acc = _one_step(params, cache, tokens, pos, acc)
                return (tok, cache, pos + 1, acc), None

            (tokens, cache, pos, acc), _ = jax.lax.scan(
                body, (tokens, cache, pos, acc), None, length=scan_k,
                unroll=scan_k if args.scan_unroll else 1,
            )
            return tokens, cache, acc
    else:
        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_step(params, cache, tokens, pos, acc):
            return _one_step(params, cache, tokens, pos, acc)

    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, 64)), jnp.int32)
    tok, cache = prefill(params, cache, prompt)
    tok.block_until_ready()

    n_disp = max(steps // scan_k, 1)
    steps = n_disp * scan_k
    start_pos = cache_len - steps - 8  # decode near full context
    pos = jnp.asarray(start_pos, jnp.int32)
    acc = jnp.zeros((), jnp.float32)
    tok, cache, acc = decode_step(params, cache, tok, pos, acc)
    for _ in range(3):  # warm + pay the relay first-transfer outside timing
        tok, cache, acc = decode_step(params, cache, tok, pos, acc)
        pos = pos + scan_k
    float(acc)

    def one_pass(tok, cache, acc):
        # reset pos each pass so repeated passes never overrun the cache;
        # pos is a traced arg so this does not recompile
        pos = jnp.asarray(start_pos, jnp.int32)
        t0 = time.time()
        for _ in range(n_disp):
            tok, cache, acc = decode_step(params, cache, tok, pos, acc)
            pos = pos + scan_k
        checksum = float(acc)  # forces completion of the whole step chain
        dt = (time.time() - t0) / steps
        print(f"  checksum {checksum:.4f}  pass {dt*1e3:.2f} ms/step", file=sys.stderr)
        return dt, tok, cache, acc

    dts = []
    for _ in range(passes):
        dt, tok, cache, acc = one_pass(tok, cache, acc)
        dts.append(dt)
    if getattr(args, "profile", None):
        # one extra (untimed) pass under a profiler trace; a few dispatches
        # are plenty and keep the trace file small over the relay
        import pathlib

        pdir = pathlib.Path(args.profile) / f"decode_c{cache_len}"
        with jax.profiler.trace(str(pdir)):
            pos = jnp.asarray(start_pos, jnp.int32)
            for _ in range(min(n_disp, max(8 // scan_k, 2))):
                tok, cache, acc = decode_step(params, cache, tok, pos, acc)
                pos = pos + scan_k
            float(acc)
        print(f"  profile trace -> {pdir}", file=sys.stderr)
    # a pass >2x the best is a stall (relay hiccup, contention) — re-run it
    # once rather than letting it drag the median
    retries = passes
    while retries and max(dts) > 2 * min(dts):
        print(
            f"  WARNING: pass spread {min(dts)*1e3:.2f}..{max(dts)*1e3:.2f} "
            "ms/step — retrying the outlier pass", file=sys.stderr,
        )
        dts.remove(max(dts))
        dt, tok, cache, acc = one_pass(tok, cache, acc)
        dts.append(dt)
        retries -= 1
    dt = float(np.median(dts))
    tokens_per_s = args.batch / dt
    bytes_per_step = model_bytes_per_step(
        cfg, args.bits, args.batch, cache_len,
        kv_bytes=1 if args.kv_dtype == "int8" else 2,
    )
    roofline_steps = V5E_HBM_BYTES_PER_S / bytes_per_step
    frac = tokens_per_s / (roofline_steps * args.batch)
    stalled = dt > 5 * (bytes_per_step / V5E_HBM_BYTES_PER_S)
    if stalled:
        print(
            f"  ERROR: median {dt*1e3:.2f} ms/step is >5x the roofline step "
            f"({bytes_per_step/V5E_HBM_BYTES_PER_S*1e3:.2f} ms) — the run was "
            "stalled (relay/contention), the number is NOT a chip measurement",
            file=sys.stderr,
        )
    pass_info = {
        "pass_ms": [round(d * 1e3, 2) for d in sorted(dts)],
        "spread": round((max(dts) - min(dts)) / dt, 3),
        "stalled": stalled,
    }
    print(
        f"  decode cache={cache_len}: {dt*1e3:.2f} ms/step (median of "
        f"{len(dts)}), {tokens_per_s:.1f} tok/s (batch {args.batch}), "
        f"roofline {roofline_steps*args.batch:.1f} tok/s -> {frac:.3f}x",
        file=sys.stderr,
    )
    return dt, tokens_per_s, frac, pass_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--mode",
                    choices=["decode", "prefill", "engine", "train", "serve"],
                    default="decode")
    ap.add_argument("--kv-dtype", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--scan-steps", type=int, default=8,
                    help="decode mode: true decode steps per dispatch "
                    "(engine-horizon style; with --scan-unroll this is the "
                    "exact structure the serving engine dispatches). >1 also "
                    "removes the relay's fixed per-dispatch overhead from "
                    "the timing; 1 = the old single-step-dispatch probe")
    ap.add_argument("--scan-unroll", dest="scan_unroll", action="store_true",
                    default=True,
                    help="decode mode with --scan-steps>1: fully unroll the "
                    "step scan (no outer while loop). Round-5 finding: the "
                    "nested while triggers an XLA memory-space-assignment "
                    "pathology that re-copies the gate_up/o combo-scale "
                    "stacks HBM->VMEM every LAYER (+3.4 ms/step). Default "
                    "on — the engine dispatches unrolled horizons")
    ap.add_argument("--no-scan-unroll", dest="scan_unroll",
                    action="store_false")
    ap.add_argument("--flash2", choices=["auto", "0", "1"], default="auto",
                    help="decode mode: flash_decode_stacked override. auto = "
                    "llama.forward's default for single-step dispatch, the "
                    "engine's flash2_in_scan policy (bf16->XLA, int8->flash2) "
                    "for --scan-steps>1")
    ap.add_argument("--horizon", type=int, default=16,
                    help="engine mode: decode steps per host sync")
    ap.add_argument("--pipeline", action="store_true",
                    help="engine mode: speculative round pipelining (for "
                    "direct-attached hosts; regresses on the relay)")
    ap.add_argument("--prefill-len", type=int, default=512)
    ap.add_argument("--no-attn-mask", action="store_true",
                    help="train mode: drop the all-ones attention_mask "
                    "(packed-batch semantics; enables the causal-only flash "
                    "path under BITDISTILLER_TRAIN_FLASH=1)")
    ap.add_argument("--train-bs", type=int, default=2,
                    help="train mode: micro-batch size (reference recipe: 2)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="train mode: gradient-accumulation steps (the "
                    "reference recipe trains at micro-bs 2 x accum 8, "
                    "train.sh:29-37; amortizes the AdamW state sweep)")
    ap.add_argument("--fused-accum", action="store_true",
                    help="train mode: quantize-once-per-accum-cycle — one "
                    "jitted call per optimizer cycle over stacked "
                    "micro-batches (trainer.make_fused_train_step); the "
                    "weight fake-quant fwd/bwd runs once per cycle instead "
                    "of once per micro-step")
    ap.add_argument("--remat", default="full",
                    choices=["full", "save_quantized", "save_dots", "save_qkvo",
                             "none"],
                    help="train mode: gradient-checkpoint policy ('none' = "
                    "no remat; fits at the 0.5B bs-2 recipe, saves the "
                    "backward's recompute forward)")
    ap.add_argument("--teacher-flash", action="store_true",
                    help="train mode: route the (no-grad) TEACHER forward "
                    "through the flash-attention kernel (fwd-only: no bwd "
                    "recompute cost)")
    ap.add_argument("--skip-short-row", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="wrap the timed loop in a jax.profiler trace "
                    "written to DIR (parse the vm.trace.json.gz device-pid "
                    "events; works over the relay)")
    ap.add_argument("--spec-k", type=int, default=4,
                    help="engine --spec: draft length per verify round")
    ap.add_argument("--spec", action="store_true",
                    help="engine mode: n-gram speculative decoding over a "
                    "periodic-prompt workload")
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="serve mode: all prompts share an N-token system "
                    "prefix, cached once via the prompt cache; requests "
                    "prefill only their 32-token tails")
    args = ap.parse_args()
    warn_stray_clients()

    if args.mode == "train":
        # KD-QAT step throughput: CAKLD (teacher fwd + student fwd/bwd with
        # fake-quant-on-forward + AdamW) at a ~0.5B config — the largest KD
        # footprint (teacher bf16 + bf16 student latents + f32 master/Adam
        # moments) that fits one 16 GB chip. Reference recipe: micro-bs 2 x seqlen 1024
        # (scripts/train/train.sh:29-37, per-device).
        from bitdistiller_tpu.models import ModelConfig, init_params
        from bitdistiller_tpu.train import TrainConfig, init_train_state, make_train_step

        full = args.layers >= 16  # --layers < 16 = smoke-test scale
        # 12 heads x head_dim 128 (not 16 x 96): identical param count and
        # FLOPs, but head_dim 128 is lane-aligned and satisfies the training
        # flash-attention gate (BITDISTILLER_TRAIN_FLASH=1 engages here)
        cfg = ModelConfig(
            vocab_size=32000 if full else 256,
            hidden_size=1536 if full else 64,
            intermediate_size=4096 if full else 128,
            num_layers=16 if full else args.layers,
            num_heads=12 if full else 4,
            num_kv_heads=12 if full else 4,
            max_position_embeddings=2048,
        )
        seq, bsz = (1024, args.train_bs) if full else (32, args.train_bs)
        tc = TrainConfig(quant_type=f"int{args.bits}-asym" if args.bits != 3 else "ste-n2f3",
                         q_group_size=128 if full else 32, kd_loss_type="cakld",
                         gradient_checkpointing=args.remat != "none",
                         remat_policy=args.remat,
                         grad_accum=args.grad_accum,
                         fused_accum=args.fused_accum and args.grad_accum > 1,
                         teacher_flash=True if args.teacher_flash else None)
        n_label = "0.5B" if full else "toy"
        print(f"building {n_label} teacher+student...", file=sys.stderr)
        # one jitted build: eager init is a remote compile per op on the relay
        teacher = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(
            jax.random.key(0)
        )
        # init_train_state copies into bf16 latents + f32 master/moments
        state = init_train_state(teacher, tc)
        # teacher rides as an ARGUMENT: closed-over params are baked into the
        # HLO as constants (minutes of serialization + relay re-upload)
        if tc.fused_accum:
            from bitdistiller_tpu.train import make_fused_train_step

            # quantize-once-per-accum-cycle: one jitted call per optimizer
            # cycle over stacked micro-batches (trainer.make_fused_train_step)
            step = jax.jit(make_fused_train_step(cfg, tc), donate_argnums=(0,))
        else:
            step = jax.jit(make_train_step(cfg, tc), donate_argnums=(0,))
        rng = np.random.default_rng(0)
        batch = {
            "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (bsz, seq)), jnp.int32),
            "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (bsz, seq)), jnp.int32),
            "attention_mask": jnp.ones((bsz, seq), jnp.int32),
        }
        if args.no_attn_mask:
            # packed/unpadded batches have no mask; lets TRAIN_FLASH take the
            # pure-causal kernel path instead of segment-ids
            del batch["attention_mask"]
        if tc.fused_accum:
            # the cycle step consumes all micro-batches at once: [k, B, S]
            batch = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (args.grad_accum,) + x.shape),
                batch,
            )
        beta = jnp.asarray(0.5)
        state, metrics = step(state, batch, beta, teacher)
        float(metrics["loss"])  # warm + first-transfer
        n_iter = max(args.steps // 10, 5)
        if tc.fused_accum:
            # each call is a whole cycle; report per-MICRO-step time below
            n_iter = max(n_iter // args.grad_accum, 2)
        elif args.grad_accum > 1:
            # time a whole number of optimizer cycles: accumulation
            # micro-steps skip the AdamW update (reference recipe:
            # train.sh --gradient_accumulation_steps 8), so only every
            # k-th step pays the ~f32-state HBM sweep
            n_iter = max(n_iter // args.grad_accum, 1) * args.grad_accum
        import contextlib

        if args.profile:
            prof_ctx = jax.profiler.trace(args.profile)
            n_iter = min(n_iter, 3)  # a few steps are plenty for a trace
        else:
            prof_ctx = contextlib.nullcontext()
        t0 = time.time()
        loss = None
        with prof_ctx:
            for _ in range(n_iter):
                state, metrics = step(state, batch, beta, teacher)
                loss = metrics["loss"]
            final_loss = float(loss)  # syncs the whole chain
        dt = (time.time() - t0) / n_iter
        if tc.fused_accum:
            dt /= args.grad_accum  # per-micro-batch time, comparable across modes
        print(f"  loss {final_loss:.4f}", file=sys.stderr)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(teacher))
        toks = bsz * seq
        # MFU counts USEFUL model flops only (PaLM-style): teacher fwd 2N +
        # student fwd 2N + bwd 4N per token — remat recompute is overhead,
        # not progress, so saving it shows up as an MFU gain. HFU adds the
        # recompute the chip actually executed (full/save_quantized remat
        # re-run the layer matmuls: +2N; save_dots/none do not).
        mfu = toks * n_params * 8 / dt / V5E_BF16_FLOPS
        hfu = toks * n_params * (
            10 if args.remat in ("full", "save_quantized") else 8
        ) / dt / V5E_BF16_FLOPS
        print(json.dumps({
            "metric": (
                f"CAKLD KD-QAT step, {n_label}, bs {bsz} x {seq}"
                + (f" x accum {args.grad_accum}" if args.grad_accum > 1 else "")
                + (" (fused cycle)" if tc.fused_accum else "")
                + ", 1 chip"
            ),
            "value": round(toks / dt, 1),
            "unit": "tokens/s",
            "vs_baseline": round(mfu, 4),  # = MFU (compute-bound target)
            "ms_per_step": round(dt * 1e3, 1),
            "mfu": round(mfu, 4),
            "hfu": round(hfu, 4),
        }))
        return

    cfg = make_cfg(args.layers)
    print(f"building int{args.bits}-g128 packed model ({args.layers} layers)...", file=sys.stderr)
    params = random_packed_params(cfg, jax.random.key(0), bits=args.bits, group_size=128)
    from bitdistiller_tpu.ops.quant_matmul import maybe_repack_a8

    params = maybe_repack_a8(params)  # BITDISTILLER_QMM_A8=1: W{2,4}A8 serving mode
    rng = np.random.default_rng(0)

    if args.mode == "prefill":
        s = args.prefill_len
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (args.batch, s)), jnp.int32)

        @jax.jit
        def prefill_only(params, tokens, acc):
            logits, _ = llama.forward(params, cfg, tokens)
            return acc * 1.000001 + logits[0, -1, 0].astype(jnp.float32)

        acc = jnp.zeros((), jnp.float32)
        acc = prefill_only(params, toks, acc)
        float(acc)
        n_iter = max(args.steps // 10, 3)
        t0 = time.time()
        for _ in range(n_iter):
            acc = prefill_only(params, toks, acc)
        float(acc)
        dt = (time.time() - t0) / n_iter
        tput = args.batch * s / dt
        d = cfg.hidden_size
        flops = 2 * args.batch * s * (
            cfg.num_layers
            * (4 * d * d + 3 * d * cfg.intermediate_size)
            + d * cfg.vocab_size
        )
        mfu = flops / dt / V5E_BF16_FLOPS
        print(json.dumps({
            "metric": f"int{args.bits}-g128 packed 7B prefill, batch {args.batch} x {s}, 1 chip",
            "value": round(tput, 1),
            "unit": "tokens/s",
            "vs_baseline": round(mfu, 4),  # = MFU for prefill (compute-bound)
            "ttft_ms": round(dt * 1e3 / args.batch, 2),
            "mfu": round(mfu, 4),
        }))
        return

    if args.mode == "engine":
        from bitdistiller_tpu.serve import Engine, Request, SamplingParams

        # raw-vs-E2E at max_len 1024: the raw baseline and the engine each
        # hold a full cache; two 2048 caches + weights exceed one chip's HBM
        raw_dt, raw_tps, _, _ = bench_decode(
            params, cfg, args, 1024, max(args.steps // 2, 20), passes=2
        )
        eng = Engine(
            params, cfg, max_slots=args.batch, max_len=1024,
            sampling=SamplingParams(temperature=0.0), eos_token_id=None,
            decode_horizon=args.horizon,
            cache_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
            pipeline_rounds=args.pipeline,
            spec_decode=args.spec, spec_k=args.spec_k,
        )
        if args.spec:
            # periodic prompts: the favorable (and honest-about-it) workload
            # for n-gram drafting — real chat/code repeats; random does not
            prompts = [
                list(rng.integers(0, cfg.vocab_size, (8,))) * 8
                for _ in range(args.batch * 2)
            ]
        else:
            prompts = [
                list(rng.integers(0, cfg.vocab_size, (64,)))
                for _ in range(args.batch * 2)
            ]
        # warm EVERY executable the run will hit: admission-batch buckets
        # {1,2,4,...,batch} and adaptive decode horizons {8,4,2,1} — a remote
        # compile inside the timed region costs seconds on the relay
        nb = args.batch
        warm_sizes = []
        while nb >= 1:
            warm_sizes.append(nb)
            nb //= 2
        for nbs in warm_sizes:
            # max_new > horizon so the FULL-horizon executable compiles too
            eng.generate(prompts[:nbs], max_new_tokens=eng.horizon + 1)
        eng.generate(prompts[:1], max_new_tokens=eng.horizon - 1)  # tail horizons
        new_tokens = 128
        # full-length single-slot warm: decode executables are shaped by
        # (cache bucket, steps) only — one full trajectory grows the cache
        # through every bucket the timed batch run will hit and compiles the
        # per-bucket decode executables
        eng.generate(prompts[:1], max_new_tokens=new_tokens)
        # re-warm admission at the GROWN cache size (insert executables are
        # shaped by the cache buffer too)
        for nbs in warm_sizes:
            eng.generate(prompts[:nbs], max_new_tokens=1)
        if args.spec and eng.spec_adaptive_k:
            # pre-compile every adaptive-k ladder executable at the grown
            # cache: a mid-timed-run k switch otherwise pays a remote compile
            for k in eng.spec_k_ladder:
                eng._spec_k_cur = k
                eng.spec_adaptive_k = False
                try:
                    eng.generate(prompts[: args.batch],
                                 max_new_tokens=eng.horizon + 1)
                    eng.generate(prompts[:1], max_new_tokens=new_tokens)
                finally:
                    eng.spec_adaptive_k = True
        if os.environ.get("BENCH_SPY"):
            # per-dispatch trace (steps + wall gap since the previous
            # dispatch = the previous horizon's sync+emit cost)
            _real = eng._dispatch_decode
            _last = [time.time()]

            def _spy(steps, spec=None, spec_k=None):
                now = time.time()
                print(f"    +{(now - _last[0])*1e3:7.1f} ms -> dispatch "
                      f"steps={steps} spec={spec} k={spec_k} "
                      f"ema={eng._spec_ema}",
                      file=sys.stderr)
                _last[0] = now
                return _real(steps, spec=spec, spec_k=spec_k)

            eng._dispatch_decode = _spy
        # one full UNTIMED pass of the exact workload: adaptive horizons and
        # the spec acceptance EMA make the step counts (and therefore the
        # compiled executable set) trajectory-dependent — fixed-size warmups
        # cannot cover them all, and a single remote compile inside the
        # timed region costs ~seconds on the relay
        eng.run([
            Request(prompt_tokens=p, max_new_tokens=new_tokens) for p in prompts
        ])
        t0 = time.time()
        done = eng.run([
            Request(prompt_tokens=p, max_new_tokens=new_tokens) for p in prompts
        ])
        dt = time.time() - t0
        total = sum(len(r.output_tokens) for r in done)
        e2e = total / dt
        print(
            f"  engine E2E {e2e:.1f} tok/s vs raw decode {raw_tps:.1f} "
            f"({e2e/raw_tps:.2f}x)", file=sys.stderr,
        )
        row = {
            "metric": f"int{args.bits}-g128 packed 7B engine E2E, {args.batch} slots, 1 chip",
            "value": round(e2e, 1),
            "unit": "tokens/s",
            "vs_baseline": round(e2e / raw_tps, 4),  # fraction of raw decode
        }
        if args.spec:
            row["metric"] += ", spec-decode (periodic prompts)"
            row["spec_tokens_per_round"] = round(
                eng.spec_tokens / max(eng.spec_rounds, 1), 2
            )
        print(json.dumps(row))
        return

    if args.mode == "serve":
        # ONLINE serving on the chip: the HTTP frontend + loadtest client
        # (scripts/loadtest.py) — concurrent requests admitted mid-flight,
        # TTFT/latency percentiles, sustained tok/s through the full stack
        import importlib.util
        import threading

        from bitdistiller_tpu.serve import Engine, SamplingParams
        from bitdistiller_tpu.serve.server import ServingFrontend

        spec = importlib.util.spec_from_file_location(
            "loadtest",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "loadtest.py"),
        )
        lt = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(lt)

        class IdTok:  # token-id passthrough (no text tokenizer needed)
            def encode(self, s):
                return [3 + (ord(c) % 251) for c in s]

            def decode(self, ids, **kw):
                return " ".join(str(i) for i in ids)

        eng = Engine(
            params, cfg, max_slots=args.batch, max_len=1024,
            # spec serve runs greedy: at temperature 0.7 a RANDOM-weight
            # model samples near-uniformly and no draft ever matches (a real
            # model at 0.7 is far lower-entropy); greedy isolates the stack
            sampling=SamplingParams(temperature=0.0 if args.spec else 0.7),
            eos_token_id=None,
            decode_horizon=args.horizon,
            cache_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
            prompt_cache_size=4 if args.shared_prefix else 0,
            spec_decode=args.spec, spec_k=args.spec_k,
        )
        front = ServingFrontend(eng, IdTok(), port=0)
        t = threading.Thread(target=front.serve_forever)
        t.start()
        host, port = front.address
        url = f"http://{host}:{port}/generate"

        prefix = list(map(int, rng.integers(0, cfg.vocab_size,
                                            (args.shared_prefix,))))

        def bodies(n, max_new):
            out = []
            for _ in range(n):
                if args.shared_prefix:
                    # system-prompt workload: shared prefix + unique tail;
                    # the prefix itself is cached once (see below) and every
                    # request here prefills only its 32-token tail
                    toks = prefix + list(map(int, rng.integers(
                        0, cfg.vocab_size, (32,))))
                    out.append({"prompt_tokens": toks,
                                "max_new_tokens": max_new,
                                "temperature": 0.7})
                elif args.spec:
                    # periodic prompts (the favorable spec workload) through
                    # the FULL online stack; temperature 0.7 = engine default
                    # so requests stay on the uniform spec-capable path
                    out.append({"prompt_tokens": list(map(int, rng.integers(
                        0, cfg.vocab_size, (16,)))) * 8,
                                "max_new_tokens": max_new,
                                "temperature": 0.0})
                else:
                    out.append({"prompt_tokens": list(map(int, rng.integers(
                        0, cfg.vocab_size, (128,)))),
                                "max_new_tokens": max_new,
                                "temperature": 0.7})
            return out

        print("warming serving executables...", file=sys.stderr)
        lt.run_load(url, bodies(args.batch * 2, 130), concurrency=args.batch)
        uncached = None
        if args.shared_prefix:
            # SAME workload measured twice: before the prefix is cached
            # (full 544-token prefills) and after (32-token tail prefills)
            print("measuring uncached prefix...", file=sys.stderr)
            uncached = lt.run_load(
                url, bodies(args.batch * 4, 128), concurrency=args.batch
            )
            lt.run_load(url, [{"prompt_tokens": prefix, "max_new_tokens": 1,
                               "temperature": 0.7, "cache_prompt": True}], 1)
            lt.run_load(url, bodies(2, 130), concurrency=2)  # warm extend path
        print("measuring...", file=sys.stderr)
        summary = lt.run_load(
            url, bodies(args.batch * 4, 128), concurrency=args.batch
        )
        sse = lt.run_load(url, bodies(4, 32), concurrency=2, stream=True)
        front.shutdown()
        t.join(timeout=120)
        # vs_baseline = fraction of the same-config decode roofline (batch =
        # slots, the engine's 1024 cache), matching every other mode's
        # fraction-of-speed-of-light semantics; errors stay their own field
        serve_roofline = args.batch * V5E_HBM_BYTES_PER_S / model_bytes_per_step(
            cfg, args.bits, args.batch, 1024,
            kv_bytes=1 if args.kv_dtype == "int8" else 2,
        )
        out = {
            "metric": f"int{args.bits}-g128 packed 7B ONLINE serving (HTTP), "
                      f"{args.batch} slots, 1 chip",
            "value": summary["throughput_tok_s"],
            "unit": "tokens/s",
            "vs_baseline": round(summary["throughput_tok_s"] / serve_roofline, 4),
            "latency_p50_s": summary["latency_p50_s"],
            "latency_p99_s": summary["latency_p99_s"],
            "ttft_p50_s": sse.get("ttft_p50_s"),
            "requests": summary["requests"],
            "errors": summary["errors"] + sse["errors"],
        }
        if args.spec:
            out["metric"] += ", spec-decode (periodic prompts)"
            out["spec_tokens_per_round"] = round(
                eng.spec_tokens / max(eng.spec_rounds, 1), 2)
        if uncached is not None:
            out["metric"] += f", shared {args.shared_prefix}-tok prefix"
            out["uncached_tok_s"] = uncached["throughput_tok_s"]
            out["uncached_prefill_p50_s"] = uncached.get("prefill_p50_s")
            out["cached_prefill_p50_s"] = summary.get("prefill_p50_s")
            out["prefix_hits"] = eng.prompt_cache_prefix_hits
        print(json.dumps(out))
        return

    # decode mode — headline at the 2048-token serving context
    short = None
    if not args.skip_short_row:
        s_dt, s_tps, s_frac, s_info = bench_decode(
            params, cfg, args, 256, max(args.steps // 2, 20), passes=2
        )
        # the weight-bound regime row rides in the official JSON (round-4
        # verdict ask). NB at cache 256 a step is ~7.6 ms, so single-step
        # dispatch would be dominated by the relay's fixed ~2.8 ms dispatch
        # latency — the scanned dispatch (default) removes that confound.
        short = {
            "cache256_tok_s": round(s_tps, 1),
            "cache256_vs_baseline": round(s_frac, 4),
            "cache256_ms_per_step": round(s_dt * 1e3, 2),
        }
    dt, tps, frac, info = bench_decode(params, cfg, args, args.cache_len, args.steps)
    if info["stalled"]:
        # one full re-measurement before declaring the capture poisoned
        print("  stalled run — re-measuring once...", file=sys.stderr)
        dt, tps, frac, info = bench_decode(
            params, cfg, args, args.cache_len, args.steps
        )
    print(json.dumps({
        "metric": (
            f"int{args.bits}-g128 packed 7B decode, batch {args.batch}, "
            f"cache {args.cache_len}"
            + (", int8 KV" if args.kv_dtype == "int8" else "")
            + (f", {args.scan_steps}-step{'-unrolled' if args.scan_unroll else ''} "
               "dispatch" if args.scan_steps > 1 else "")
            + ", 1 chip"
        ),
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(frac, 4),
        "pass_ms": info["pass_ms"],
        "spread": info["spread"],
        **(short or {}),
        **({"stalled": True} if info["stalled"] else {}),
    }))
    if info["stalled"]:
        sys.exit(1)  # the recorded number is not a chip measurement


if __name__ == "__main__":
    main()
