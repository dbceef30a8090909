"""Exercise the cluster job generator (L6 orchestration).

Reference: scripts/sing/generate_sing_yaml.py emits one Singularity YAML per
(checkpoint, mode). The TPU analogue (scripts/generate_tpu_jobs.py) emits GKE
JobSet YAML; these tests check the YAML is well-formed and — more importantly —
that every embedded command line actually parses against the real CLI, so the
generator can't drift from the framework's entrypoints.
"""

import os
import re
import shlex
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)

from generate_tpu_jobs import MODES, generate  # noqa: E402


class _Args:
    def __init__(self, out_dir):
        self.checkpoints = ["/ckpts/TinyLlama_1.1B", "/ckpts/llama-2-7b"]
        self.modes = sorted(MODES)
        self.out_dir = out_dir
        self.artifact_dir = "/artifacts"
        self.data_path = "/data/teacher.jsonl"
        self.bits = 2
        self.group_size = 128
        self.quant_type = "int2-asym"
        self.image = "bitdistiller-tpu:latest"
        self.accelerator = "tpu-v5-lite-podslice"
        self.topology = "4x4"
        self.num_hosts = 4
        self.chips_per_host = 4


def test_generates_one_yaml_per_checkpoint_mode(tmp_path):
    args = _Args(str(tmp_path))
    paths = generate(args)
    assert len(paths) == len(args.checkpoints) * len(args.modes)
    for p in paths:
        assert os.path.exists(p)


def test_yaml_is_well_formed_and_sized(tmp_path):
    yaml = pytest.importorskip("yaml")
    args = _Args(str(tmp_path))
    for p in generate(args):
        doc = yaml.safe_load(open(p))
        assert doc["kind"] == "JobSet"
        job = doc["spec"]["replicatedJobs"][0]
        mode = os.path.basename(p).rsplit("_", 1)[0]
        want_hosts = args.num_hosts if mode in ("train", "serve") else 1
        assert job["replicas"] == want_hosts
        pod = job["template"]["spec"]["template"]["spec"]
        assert pod["containers"][0]["resources"]["limits"]["google.com/tpu"] == 4
        assert "gke-tpu-accelerator" in str(pod["nodeSelector"])
        # metadata.name must be a DNS label
        assert re.fullmatch(r"[a-z0-9]([a-z0-9-]{0,51})", doc["metadata"]["name"])


def test_embedded_commands_parse_against_real_cli(tmp_path):
    """Every generated command line must be accepted by the actual CLI parser."""
    from bitdistiller_tpu.cli import build_parser

    parser = build_parser()
    args = _Args(str(tmp_path))
    checked = 0
    for p in generate(args):
        text = open(p).read()
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("python -m bitdistiller_tpu.cli"):
                argv = shlex.split(line)[3:]  # drop python -m module
                ns = parser.parse_args(argv)  # raises SystemExit(2) on drift
                assert ns.cmd == argv[0]
                checked += 1
    assert checked == len(args.checkpoints) * len(args.modes)


def test_cli_entrypoint_runs(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "generate_tpu_jobs.py"),
         "--checkpoints", "/ckpts/m", "--modes", "ppl",
         "--out_dir", str(tmp_path / "jobs")],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "jobs" / "ppl_m.yaml").exists()
