"""TPU job-spec generator — cluster orchestration parity.

The reference generates Azure Singularity/amulet YAML per checkpoint/eval
mode (scripts/sing/generate_sing_yaml.py:1-282). The TPU-native analogue
emits GKE JobSet-style YAML for TPU slices: one job per (checkpoint, mode),
with the pipeline-stage command lines of this framework's CLI.

Modes (parity with the reference's test_arc/test_mmlu/... and train modes):
  train       — KD-QAT on a pod slice
  eval_tasks  — MMLU + QA suite per checkpoint (1 chip each)
  eval_gsm8k  — generative eval (1 host each)
  serve       — multi-host continuous-batching serving
"""

from __future__ import annotations

import argparse
import os
import re

JOB_TEMPLATE = """\
apiVersion: jobset.x-k8s.io/v1alpha2
kind: JobSet
metadata:
  name: {name}
spec:
  replicatedJobs:
  - name: workers
    replicas: {num_hosts}
    template:
      spec:
        parallelism: {num_hosts}
        completions: {num_hosts}
        template:
          spec:
            nodeSelector:
              cloud.google.com/gke-tpu-accelerator: {accelerator}
              cloud.google.com/gke-tpu-topology: {topology}
            containers:
            - name: main
              image: {image}
              resources:
                limits:
                  google.com/tpu: {chips_per_host}
              command: ["bash", "-c"]
              args:
              - |
                cd /workspace/bitdistiller-tpu
                {command}
"""

MODES = {
    "train": (
        "python -m bitdistiller_tpu.cli train "
        "--model_name_or_path {model} --data_path {data} "
        "--output_dir {out}/train_{tag} --bits {bits} --q_group_size {group} "
        "--quant_type {quant_type} --clip {out}/clip_{tag}.npz "
        "--kd_loss_type cakld --per_device_train_batch_size 2 "
        "--gradient_accumulation_steps 8 --learning_rate 8e-6"
    ),
    "autoclip": (
        "python -m bitdistiller_tpu.cli autoclip --model_path {model} "
        "--w_bit {bits} --q_group_size {group} --dump_clip {out}/clip_{tag}.npz"
    ),
    "eval_tasks": (
        "python -m bitdistiller_tpu.cli eval --model_path {model} "
        "--tasks mmlu,arc_challenge,winogrande,hellaswag,piqa "
        "--quant_type int --w_bit {bits} --q_group_size {group}"
    ),
    "eval_gsm8k": (
        "python -m bitdistiller_tpu.cli gsm8k --model_path {model} "
        "--data_path {data}"
    ),
    "ppl": (
        "python -m bitdistiller_tpu.cli ppl --model_path {model} "
        "--quant_type int --w_bit {bits} --q_group_size {group}"
    ),
    "serve": (
        "python -m bitdistiller_tpu.cli chat --model_path {model} "
        "--load_quant {out}/packed_{tag}"
    ),
}


def generate(args) -> list[str]:
    os.makedirs(args.out_dir, exist_ok=True)
    paths = []
    for ckpt in args.checkpoints:
        # K8s object names must be DNS-1123 labels: lowercase alnum + '-'
        tag = re.sub(r"[^a-z0-9-]+", "-", os.path.basename(ckpt.rstrip("/")).lower()).strip("-")
        for mode in args.modes:
            cmd = MODES[mode].format(
                model=ckpt, data=args.data_path, out=args.artifact_dir,
                tag=tag, bits=args.bits, group=args.group_size,
                quant_type=args.quant_type,
            )
            n_hosts = args.num_hosts if mode in ("train", "serve") else 1
            yaml_text = JOB_TEMPLATE.format(
                name=f"bdt-{mode.replace('_', '-')}-{tag}"[:52],
                num_hosts=n_hosts,
                accelerator=args.accelerator,
                topology=args.topology if n_hosts > 1 else "2x4",
                image=args.image,
                chips_per_host=args.chips_per_host,
                command=cmd,
            )
            path = os.path.join(args.out_dir, f"{mode}_{tag}.yaml")
            with open(path, "w") as f:
                f.write(yaml_text)
            paths.append(path)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", nargs="+", required=True)
    ap.add_argument("--modes", nargs="+", default=["autoclip", "train", "ppl"],
                    choices=sorted(MODES))
    ap.add_argument("--out_dir", default="jobs")
    ap.add_argument("--artifact_dir", default="/artifacts")
    ap.add_argument("--data_path", default="/data/teacher.jsonl")
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--quant_type", default="int2-asym")
    ap.add_argument("--image", default="bitdistiller-tpu:latest")
    ap.add_argument("--accelerator", default="tpu-v5-lite-podslice")
    ap.add_argument("--topology", default="4x4")
    ap.add_argument("--num_hosts", type=int, default=4)
    ap.add_argument("--chips_per_host", type=int, default=4)
    args = ap.parse_args()
    for p in generate(args):
        print(p)


if __name__ == "__main__":
    main()
