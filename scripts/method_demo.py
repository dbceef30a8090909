"""On-device BitDistiller method demonstration on a genuinely-TRAINED model.

No public checkpoints are reachable in this environment (zero egress), so the
real-model quality proof (WikiText-2 PPL on LLaMA-2-7B, BASELINE.md) cannot
run. This script is the strongest available substitute: it trains a small
decoder to real quality on a structured synthetic language, then runs the
COMPLETE reference pipeline (readme.md:1-12 stages) on-device:

    RTN PTQ -> AutoClip -> teacher self-generation -> CAKLD KD-QAT -> pack

and records held-out PPL after each stage in RESULTS.md. The claims being
demonstrated are the method's, in miniature: sub-4-bit RTN destroys quality,
clipping helps, KD-QAT recovers most of the gap, and the packed serving model
reproduces the fake-quant numbers.

Usage (TPU or CPU):  python scripts/method_demo.py --out RESULTS.md
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bitdistiller_tpu.eval.ppl import perplexity
from bitdistiller_tpu.models import ModelConfig, init_params
from bitdistiller_tpu.models.quantized import pack_model
from bitdistiller_tpu.quant.autoclip import run_autoclip
from bitdistiller_tpu.quant.core import fake_quant_int_kaxis, fake_quant_nf3_kaxis
from bitdistiller_tpu.serve import Engine, SamplingParams
from bitdistiller_tpu.train import (
    TrainConfig,
    estimate_cakld_beta,
    init_train_state,
    make_train_step,
    master_params,
)

VOCAB = 256
SEQ = 256  # overridden by --corpus source (byte-level, longer blocks)


def source_corpus(max_bytes: int, hold_every: int = 20):
    """REAL text: the Python source shipped in this image (site-packages),
    byte-level (vocab 256). Deterministic file walk; every `hold_every`-th
    file is held out for eval, so eval measures generalization to unseen
    files of the same distribution — the strongest available stand-in for
    WikiText given zero egress."""
    import glob

    roots = ["/opt/venv/lib/python3.12/site-packages"]
    files = []
    for root in roots:
        files.extend(sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                      recursive=True)))
    train_parts, eval_parts, total = [], [], 0
    for i, path in enumerate(files):
        if total >= max_bytes:
            break
        try:
            data = open(path, "rb").read()
        except OSError:
            continue
        if not (256 < len(data) < 1 << 20):
            continue
        (eval_parts if i % hold_every == 0 else train_parts).append(data)
        total += len(data)
    train = np.frombuffer(b"\n".join(train_parts), np.uint8).astype(np.int32)
    evl = np.frombuffer(b"\n".join(eval_parts), np.uint8).astype(np.int32)
    return train, evl


def make_corpus(n_tokens: int, seed: int, table_seed: int = 7) -> np.ndarray:
    """Order-2 Markov language: each (prev2, prev1) pair has a dominant next
    symbol (p=0.85) plus 4 alternatives — learnable structure with entropy.
    The transition TABLES come from table_seed (one fixed language); `seed`
    only drives the sampled trajectory, so train/eval are held-out samples
    of the SAME language."""
    table_rng = np.random.default_rng(table_seed)
    main = table_rng.integers(0, VOCAB, (VOCAB, VOCAB)).astype(np.int32)
    alts = table_rng.integers(0, VOCAB, (VOCAB, VOCAB, 4)).astype(np.int32)
    rng = np.random.default_rng(seed)
    out = np.empty(n_tokens, np.int32)
    out[0], out[1] = rng.integers(0, VOCAB, 2)
    r = rng.random(n_tokens)
    pick = rng.integers(0, 4, n_tokens)
    for t in range(2, n_tokens):
        a, b = out[t - 2], out[t - 1]
        out[t] = main[a, b] if r[t] < 0.85 else alts[a, b, pick[t]]
    return out


def blocks_of(stream: np.ndarray) -> np.ndarray:
    n = len(stream) // SEQ
    return stream[: n * SEQ].reshape(n, SEQ)


def batches_from_blocks(blocks: np.ndarray, bs: int, rng: np.random.Generator):
    while True:
        idx = rng.integers(0, len(blocks), bs)
        toks = blocks[idx]
        yield {
            "input_ids": toks,
            "labels": toks.copy(),
            "attention_mask": np.ones_like(toks),
        }


def train_teacher(cfg, blocks, steps, bs, log, lr=3e-3):
    tc = TrainConfig(quant_type=None, train_kd=False, learning_rate=lr,
                     lr_scheduler="cosine", total_steps=steps,
                     gradient_checkpointing=False, max_grad_norm=1.0)
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc), donate_argnums=(0,))
    it = batches_from_blocks(blocks, bs, np.random.default_rng(1))
    t0 = time.time()
    loss = None
    for i in range(steps):
        state, m = step(state, next(it), jnp.asarray(0.0), None)
        if (i + 1) % max(steps // 5, 1) == 0:
            loss = float(m["loss"])
            log(f"  teacher step {i+1}/{steps} ce={loss:.3f} "
                f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
    return master_params(state)


def teacher_generate(params, cfg, prompts, max_new, log):
    eng = Engine(params, cfg, max_slots=32, max_len=SEQ,
                 sampling=SamplingParams(temperature=0.7, top_p=1.0),
                 eos_token_id=None, decode_horizon=16)
    t0 = time.time()
    outs = eng.generate([list(map(int, p)) for p in prompts], max_new_tokens=max_new)
    log(f"  teacher-gen: {len(prompts)} samples x {max_new} tokens "
        f"in {time.time()-t0:.1f}s")
    return outs


def kd_qat(cfg, student_init, teacher, gen_pairs, quant_type, gsize, steps, bs, log):
    tc = TrainConfig(quant_type=quant_type, q_group_size=gsize, train_kd=True,
                     kd_loss_type="cakld", learning_rate=3e-4,
                     lr_scheduler="constant", total_steps=steps,
                     gradient_checkpointing=False)
    prompts, gens = gen_pairs
    plen, glen = len(prompts[0]), len(gens[0])
    toks = np.concatenate([np.asarray(prompts, np.int32),
                           np.asarray(gens, np.int32)], axis=1)
    labels = toks.copy()
    labels[:, :plen] = -100  # IGNORE prompt positions (collator semantics)
    rng = np.random.default_rng(2)

    def kd_batches():
        while True:
            idx = rng.integers(0, len(toks), bs)
            yield {"input_ids": toks[idx], "labels": labels[idx],
                   "attention_mask": np.ones((bs, plen + glen), np.int32)}

    it = kd_batches()
    beta = estimate_cakld_beta(teacher, cfg, [next(it) for _ in range(4)])
    log(f"  CAKLD beta = {float(beta):.4f}")
    state = init_train_state(student_init, tc)
    step = jax.jit(make_train_step(cfg, tc), donate_argnums=(0,))
    t0 = time.time()
    for i in range(steps):
        state, m = step(state, next(it), beta, teacher)
        if (i + 1) % max(steps // 4, 1) == 0:
            log(f"  qat[{quant_type}] step {i+1}/{steps} loss={float(m['loss']):.3f} "
                f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
    return master_params(state)


def spec_bench(teacher, cfg, eval_blocks, log):
    """Greedy generation on held-out REAL-text prompts: plain engine vs
    n-gram speculative decoding (acceptance on natural text, not the
    periodic synthetic workload bench.py uses)."""
    prompts = [list(map(int, b[:64])) for b in eval_blocks[:16]]
    max_new = min(256, SEQ - 64 - 2)  # fit the engine's max_len
    res = {}
    # fixed spec_k sweep {4, 7, 11} matches the bench.py periodic-prompt
    # configs (spec_adaptive_k pinned OFF so the curve stays a k curve);
    # 'adaptive' lets the engine pick k from the acceptance EMA, and
    # '+backoff' adds 3-gram-with-2-gram-backoff drafting — the round-5
    # policy candidates, measured against the best fixed point.
    fixed = dict(spec_decode=True, spec_adaptive_k=False)
    variants = [
        ("plain", None),
        ("ng2k4", dict(fixed, spec_ngram=2, spec_k=4)),
        ("ng3k4", dict(fixed, spec_ngram=3, spec_k=4)),
        ("ng3k7", dict(fixed, spec_ngram=3, spec_k=7)),
        ("ng3k11", dict(fixed, spec_ngram=3, spec_k=11)),
        ("adaptive", dict(spec_decode=True, spec_ngram=2, spec_k=4)),
        ("adapt+bko", dict(spec_decode=True, spec_ngram=2, spec_k=4,
                           spec_ngram_backoff=True)),
    ]
    for mode, kw in variants:
        # round-4 protocol: LOOPED horizon 16. The unrolled horizon (the
        # round-5 7B default) measured ~2x SLOWER at this 26M scale (109 vs
        # 238 tok/s plain — the MSA re-copy it fixes doesn't bite a model
        # this small, and the wide unrolled programs cost more than they
        # save), and longer horizons inflate the acceptance column with
        # budget-overshoot rounds of self-repetitive text. The relay's
        # ~2.8 ms dispatch latency still dominates the wall-clock at this
        # scale, so accepted/round is the portable signal; tok/s ratios
        # are relay-attachment-specific.
        eng = Engine(teacher, cfg, max_slots=16, max_len=SEQ,
                     sampling=SamplingParams(temperature=0.0),
                     eos_token_id=None, decode_horizon=16,
                     unroll_horizon=False, **(kw or {}))
        # warm with the EXACT timed workload: the adaptive-horizon ladder
        # (full dispatches + the budget tail) and the 16-slot prefill all
        # compile per (steps, k) — any left to the timed region costs a
        # ~5-15 s remote compile each
        eng.generate(prompts, max_new_tokens=max_new)
        if kw and eng.spec_adaptive_k:
            # pre-compile the adaptive ladder ks over the same trajectory
            for k in eng.spec_k_ladder:
                eng._spec_k_cur, eng.spec_adaptive_k = k, False
                try:
                    eng.generate(prompts[:2], max_new_tokens=max_new)
                finally:
                    eng.spec_adaptive_k = True
        # one more untimed pass along the variant's OWN trajectory: the
        # adaptive variant's (steps, k) sequence depends on its EMA state,
        # so the pinned warms above cannot cover it exactly — a leftover
        # executable compiles mid-timed-pass otherwise (~5-15 s each on
        # the relay)
        eng.generate(prompts, max_new_tokens=max_new)
        # acceptance column reflects the TIMED pass only (the warms above
        # ran pinned-k trajectories that would pollute it)
        eng.spec_tokens = eng.spec_rounds = 0
        t0 = time.time()
        outs = eng.generate(prompts, max_new_tokens=max_new)
        dt = time.time() - t0
        toks = sum(len(o) for o in outs)
        acc = eng.spec_tokens / max(eng.spec_rounds, 1)
        k = None if kw is None else eng._spec_k_last
        res[mode] = {"tok_s": toks / dt, "outs": outs, "accept": acc, "k": k}
        log(f"  {mode}: {toks/dt:.0f} tok/s"
            + (f", {acc:.2f}/{k+1} tokens per verify round (k ends at {k})"
               if kw else ""))
    # bf16 forward at S=k+1 vs S=1 can flip greedy argmax TIES (batch-shape
    # numerics, same noise class as the sharded tests note) — report the
    # agreement instead of asserting exactness (the f32 CPU tests assert it)
    for mode, kw in variants[1:]:
        same = sum(a == b for a, b in zip(res[mode]["outs"],
                                          res["plain"]["outs"]))
        log(f"  {mode} greedy agreement: {same}/{len(prompts)} sequences "
            "(divergences are bf16 argmax ties)")
    return res


def replace_section(path: str, header: str, section: str):
    """Idempotently (re)write one `## ...` section of a markdown file,
    preserving everything else (missing file/section -> append)."""
    try:
        with open(path) as f:
            text = f.read()
    except FileNotFoundError:
        text = ""
    if header in text:
        pre = text[: text.index(header)]
        rest = text[text.index(header):]
        nxt = rest.find("\n## ", 1)
        text = pre + section + (rest[nxt + 1:] if nxt != -1 else "")
    else:
        text = text.rstrip() + ("\n\n" if text.strip() else "") + section
    with open(path, "w") as f:
        f.write(text)


def write_spec_section(path: str, res: dict, model_desc: str):
    """Idempotently (re)write the real-text spec-decode section of RESULTS.md
    — the acceptance curve the periodic-prompt bench numbers need next to
    them (those are the favorable workload; this is the honest one)."""
    header = "## Speculative decoding on real text"
    plain = res["plain"]["tok_s"]
    lines = [
        header,
        "",
        f"n-gram drafting over held-out real-text prompts through {model_desc}",
        "(greedy, engine path — the same `Engine(spec_decode=True)` serving",
        "configuration as the periodic-prompt bench rows; acceptance counted",
        "by the engine's spec_tokens/spec_rounds instrumentation over the",
        "timed pass).",
        "",
        "`accepted/round` is the portable signal. The wall-clock columns are",
        "RELAY-ATTACHED: at this 26M scale a decode step is ~1-2 ms, so the",
        "attachment's fixed ~2.8 ms dispatch latency dominates and `vs",
        "plain` mostly measures dispatches-per-token, exaggerating spec",
        "gains. `est chip x` derives the chip-bound expectation from the",
        "measured acceptance with the 7B verify-cost model (a k-draft",
        "verify round costs ~(1 + 0.09k) plain steps — weight-bound",
        "forward, measured round 4): (accepted/round) / (1 + 0.09 k).",
        "The adaptive engine's final k is the policy's own choice.",
        "",
        "| engine | spec_k | accepted/round (of k+1) | est chip x | tok/s (relay) |",
        "|---|---|---|---|---|",
    ]
    for mode, r in res.items():
        if mode == "plain":
            lines.append(f"| plain | — | — | 1.00x | {r['tok_s']:.0f} |")
        else:
            est = r["accept"] / (1 + 0.09 * r["k"])
            lines.append(
                f"| {mode} | {r['k']} | {r['accept']:.2f}/{r['k'] + 1} | "
                f"{est:.2f}x | {r['tok_s']:.0f} |"
            )
    lines.append("")
    replace_section(path, header, "\n".join(lines))


def main():
    global SEQ
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", choices=["markov", "source"], default="markov",
                    help="markov: synthetic order-2 language (tiny, fast); "
                    "source: byte-level REAL Python source from this image "
                    "(~26M-param model, headline g128 configs)")
    ap.add_argument("--teacher-steps", type=int, default=None)
    ap.add_argument("--qat-steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--gen-samples", type=int, default=256)
    ap.add_argument("--qat-batch", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=None)
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--spec-bench", action="store_true",
                    help="also measure n-gram speculative decoding on "
                    "held-out prompts (real-text acceptance)")
    ap.add_argument("--spec-only", action="store_true",
                    help="train the teacher, run the spec bench, skip the "
                    "quantization pipeline")
    ap.add_argument("--teacher-ckpt", default=None,
                    help="pickle path: load the teacher from it if present, "
                    "else train and save (skips the ~12-min retrain when "
                    "iterating on the spec bench)")
    args = ap.parse_args()
    log = lambda s: print(s, file=sys.stderr, flush=True)

    if args.corpus == "source":
        SEQ = 512
        args.teacher_steps = args.teacher_steps or 4000
        args.qat_steps = args.qat_steps or 600
        G = args.group_size or 128
        cfg = ModelConfig(vocab_size=VOCAB, hidden_size=512,
                          intermediate_size=1408, num_layers=8, num_heads=8,
                          num_kv_heads=8, max_position_embeddings=SEQ)
        log("reading source corpus...")
        train_stream, eval_stream = source_corpus(48 << 20)
        train_blocks = blocks_of(train_stream)
        eval_blocks = blocks_of(eval_stream)[:192]
        log(f"  {len(train_blocks)} train / {len(eval_blocks)} eval blocks of {SEQ}")
        corpus_desc = (
            f"byte-level REAL text: {len(train_blocks) * SEQ / 1e6:.0f} MB of "
            "Python source shipped in this image (held-out files for eval)"
        )
    else:
        args.teacher_steps = args.teacher_steps or 1500
        args.qat_steps = args.qat_steps or 400
        G = args.group_size or 64
        cfg = ModelConfig(vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
                          num_layers=6, num_heads=8, num_kv_heads=8,
                          max_position_embeddings=SEQ)
        log("building corpus...")
        train_blocks = blocks_of(make_corpus(1_200_000, seed=7))
        eval_blocks = blocks_of(make_corpus(64_000, seed=99))[:192]
        corpus_desc = f"an order-2 Markov language (vocab {VOCAB})"
    calib_blocks = train_blocks[:16]

    if args.teacher_ckpt and os.path.exists(args.teacher_ckpt):
        log(f"loading teacher from {args.teacher_ckpt}...")
        import pickle

        with open(args.teacher_ckpt, "rb") as f:
            host_tree = pickle.load(f)
        teacher = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(jnp.bfloat16), host_tree
        )
    else:
        log(f"training teacher ({args.teacher_steps} steps)...")
        teacher = train_teacher(cfg, train_blocks, args.teacher_steps, args.batch,
                                log, lr=1e-3 if args.corpus == "source" else 3e-3)
        if args.teacher_ckpt:
            import pickle

            host_tree = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32), teacher
            )
            with open(args.teacher_ckpt, "wb") as f:
                pickle.dump(host_tree, f)
            log(f"teacher saved to {args.teacher_ckpt}")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(teacher))

    def ppl(params, quantizer=None):
        return perplexity(params, cfg, eval_blocks, quantizer=quantizer, batch_size=32)

    teacher_ppl = ppl(teacher)
    log(f"teacher ppl {teacher_ppl:.4f} ({n_params/1e6:.1f}M params)")

    if args.spec_bench or args.spec_only:
        # the PACKED model (int2 RTN, fused qkv/gate_up) — the serving
        # artifact the 7B periodic-prompt spec numbers run on, so this
        # real-text acceptance curve is its honest companion
        log("packing teacher for the spec bench...")
        packed_t = pack_model(teacher, cfg, bits=2, group_size=G, fuse=True)
        log("spec-decode bench on held-out prompts (packed model)...")
        spec_res = spec_bench(packed_t, cfg, eval_blocks, log)
        write_spec_section(
            args.out, spec_res,
            f"the int2-g{G} PACKED {n_params/1e6:.1f}M decoder "
            f"(trained on {corpus_desc})",
        )
        log(f"spec section written to {args.out}")
        if args.spec_only:
            return

    prompts = train_blocks[np.random.default_rng(3).integers(0, len(train_blocks),
                                                             args.gen_samples)][:, :32]
    gens = teacher_generate(teacher, cfg, prompts, max_new=128, log=log)

    rows = []
    for qt, label in [("int2-asym", f"int2-g{G}"), ("ste-n2f3", f"nf3-g{G}")]:
        # PTQ-rounding eval quantizer on the K-axis grid (the grid QAT,
        # AutoClip and packing share)
        if qt == "int2-asym":
            q_eval = lambda w: fake_quant_int_kaxis(w, 2, G, ste=False)
            ac_type, nb = "int", 2
        else:
            q_eval = lambda w: fake_quant_nf3_kaxis(w, G, ste=False)
            ac_type, nb = "nf3", 3
        rtn_ppl = ppl(teacher, q_eval)
        log(f"[{label}] RTN ppl {rtn_ppl:.4f}")
        res = run_autoclip(teacher, cfg, calib_blocks, quant_type=ac_type,
                           n_bit=nb, group_size=G, n_sample_token=512, apply=True,
                           progress=lambda s: None)
        clipped = res["params"]
        clip_ppl = ppl(clipped, q_eval)
        log(f"[{label}] AutoClip ppl {clip_ppl:.4f}")
        qat = kd_qat(cfg, clipped, teacher, (prompts, gens), qt, G,
                     args.qat_steps, args.qat_batch, log)
        qat_ppl = ppl(qat, q_eval)
        log(f"[{label}] QAT ppl {qat_ppl:.4f}")
        row = {"label": label, "rtn": rtn_ppl, "clip": clip_ppl, "qat": qat_ppl}
        if qt == "int2-asym":
            packed = pack_model(qat, cfg, bits=2, group_size=G, fuse=True)
            row["packed"] = ppl(packed)
            log(f"[{label}] packed ppl {row['packed']:.4f}")
            # W2A8 serving mode (BITDISTILLER_QMM_A8=1): per-token int8
            # activations change numerics — publish the PPL delta next to
            # the default path (round-4 verdict: the flag shipped blind)
            os.environ["BITDISTILLER_QMM_A8"] = "1"
            try:
                from bitdistiller_tpu.ops.quant_matmul import maybe_repack_a8

                row["packed_a8"] = ppl(maybe_repack_a8(packed))
            finally:
                os.environ.pop("BITDISTILLER_QMM_A8", None)
            log(f"[{label}] packed W2A8 ppl {row['packed_a8']:.4f}")
        rows.append(row)

    recover = lambda r: (r["rtn"] - r["qat"]) / max(r["rtn"] - teacher_ppl, 1e-9)
    if args.corpus == "source":
        header = "## Real text, headline g128 configs"
        intro = [
            f"A {n_params/1e6:.1f}M-param decoder trained {args.teacher_steps} "
            "steps on **byte-level real text** —",
            "48 MB of the Python source shipped in this image, with held-out "
            "files as",
            f"the eval split (192 × {SEQ}-token blocks). The quantization "
            "configs are the",
            "paper's headline ones (int2-g128 / nf3-g128). Pipeline: RTN → "
            "AutoClip →",
            "teacher self-generation (engine, T=0.7, 256×128 tokens) → CAKLD "
            "KD-QAT",
            f"({args.qat_steps} steps) → pack. `packed W2A8` = the same packed "
            "model served with",
            "per-token int8 activations (`BITDISTILLER_QMM_A8=1`). Reproduce:",
            f"`python scripts/method_demo.py --corpus {args.corpus}`.",
        ]
    else:
        header = "## Synthetic language (small, fast)"
        intro = [
            f"A {n_params/1e6:.1f}M-param decoder trained {args.teacher_steps} "
            "steps on an order-2 Markov language",
            f"(vocab {VOCAB}), int2/nf3 at g{G} (192 × {SEQ}-token held-out "
            "blocks).",
            f"Reproduce: `python scripts/method_demo.py` (runs on CPU too).",
        ]
    lines = [header, ""] + intro + [
        "",
        f"Teacher (bf16): **{teacher_ppl:.3f}** PPL",
        "",
        "| quant | RTN | +AutoClip | +CAKLD QAT | gap recovered | packed | packed W2A8 |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        packed = f"{r['packed']:.3f}" if "packed" in r else "—"
        packed_a8 = f"{r['packed_a8']:.3f}" if "packed_a8" in r else "—"
        lines.append(
            f"| {r['label']} | {r['rtn']:.3f} | {r['clip']:.3f} | {r['qat']:.3f} "
            f"| {recover(r):.0%} | {packed} | {packed_a8} |"
        )
    lines.append("")
    # section-preserving write: the spec-decode section (written above when
    # --spec-bench ran) and the other corpus's section survive
    replace_section(args.out, header, "\n".join(lines))
    log(f"wrote {args.out}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
