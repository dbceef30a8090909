"""Teacher-data self-generation: sample completions from the full-precision
model on prompt datasets, write [[prompt, completion]] JSONL.

Replaces data/generation/generate.py (torchrun DDP, batch-1 generate with
synced_gpus and variable-length NCCL all_gather, :149-237) and
generate_vllm.py — here the continuous-batching engine does the batching, so
one process saturates a chip; multi-host runs shard the prompt list per host
(jax.process_index) and write per-host files, exactly how the reference
names its shards ({name}_T{T}_N{N}_S{seed}_{n}.json, generate.py:233-236).
"""

from __future__ import annotations

import json
import os

import jax

from ..serve import Engine, Request, SamplingParams
from .datasets import PROMPT_STYLES, get_gen_prompts, style_for_dataset


def run_teacher_generation(args, *, tokenizer=None, model=None) -> str:
    # multi-host rendezvous (torchrun init_process_group parity,
    # generate.py:150); all-None args = single process / TPU auto-detect
    from ..parallel.distributed import init_distributed

    init_distributed(
        getattr(args, "coordinator_address", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )
    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.base_model, use_fast=True)
    tok = tokenizer
    if model is None:
        from ..models.hf_import import load_hf_checkpoint

        params, cfg = load_hf_checkpoint(args.base_model)
    else:
        params, cfg = model

    prompts = get_gen_prompts(
        args.dataset_name, args.max_sample, args.seed, getattr(args, "data_path", None)
    )
    style = PROMPT_STYLES[style_for_dataset(args.dataset_name)]

    # shard prompts across hosts (DDP DistributedSampler parity)
    n_proc = jax.process_count()
    rank = jax.process_index()
    prompts = prompts[rank::n_proc]

    eng = Engine(
        params,
        cfg,
        max_slots=args.max_batch,
        max_len=args.max_seq_len,
        sampling=SamplingParams(temperature=args.temperature, top_p=args.top_p),
        eos_token_id=tok.eos_token_id,
        seed=args.seed + rank,
        decode_horizon=16,  # batch generation: throughput over EOS-latency
    )

    templated = [style.format(instruction=p) for p in prompts]
    reqs = [
        Request(prompt_tokens=tok.encode(t), max_new_tokens=args.max_new_tokens)
        for t in templated
    ]
    order = {id(r): i for i, r in enumerate(reqs)}
    results = [None] * len(reqs)
    for r in eng.run(reqs):
        results[order[id(r)]] = tok.decode(r.output_tokens, skip_special_tokens=True)

    base, ext = os.path.splitext(args.out_path)
    out_path = (
        f"{base}_T{args.temperature}_N{args.max_sample}_S{args.seed}_{rank}{ext or '.json'}"
        if n_proc > 1
        else args.out_path
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        for prompt, completion in zip(templated, results):
            f.write(json.dumps([[prompt, completion]]) + "\n")
    return out_path
