"""Offline-capable pieces of scripts/prepare_datasets.py: data-efficacy
prepro (first-10 eval prepend) and checkpoint score scraping."""

import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from prepare_datasets import main


def test_prepro_prepends_eval_head(tmp_path):
    src = tmp_path / "raw.jsonl"
    with open(src, "w") as f:
        for i in range(15):
            f.write(json.dumps({"input": f"q{i}", "text": f"a{i}"}) + "\n")
    out = tmp_path / "pairs.jsonl"
    main(["prepro", "--input", str(src), "--output", str(out), "--eval_samples", "10"])
    lines = [json.loads(x) for x in open(out)]
    assert len(lines) == 25  # 10 duplicated + 15
    assert lines[0] == [["q0", "a0"]] and lines[10] == [["q0", "a0"]]
    assert lines[9] == [["q9", "a9"]] and lines[24] == [["q14", "a14"]]


def test_scrape_collects_metric_curves(tmp_path):
    for step, acc in ((100, 0.41), (200, 0.44)):
        d = tmp_path / f"checkpoint-{step}"
        os.makedirs(d)
        with open(d / "MMLU.log", "w") as f:
            f.write(f"... {{'mmlu-acc': {acc}}} done\n")
        with open(d / "eval.json", "w") as f:
            json.dump({"accuracy": 0.3 + step / 1000}, f)
    out = tmp_path / "scores.csv"
    main(["scrape", "--base_dir", str(tmp_path), "--output", str(out)])
    rows = list(csv.DictReader(open(out)))
    assert [r["step"] for r in rows] == ["100", "200"]
    assert float(rows[0]["mmlu-acc"]) == 0.41
    assert float(rows[1]["accuracy"]) == 0.5
