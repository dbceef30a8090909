"""Offline-fixture smoke: the HUB-loader code paths (eval/tasks.py
load_dataset calls, eval/ppl.py wikitext, calib loaders) executed end-to-end
through the CLI with zero network, served from the checked-in fixtures/ dir
via BITDISTILLER_DATA_DIR (bitdistiller_tpu/data/offline.py).

Before this, those paths had only run against synthetic in-test docs — the
load_dataset call itself was never exercised offline (round-2 VERDICT
missing #3)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.cli import main
from bitdistiller_tpu.models import TINY_TEST, init_params
from bitdistiller_tpu.models.hf_import import save_hf_checkpoint

# Integration tier: this whole module is `-m slow` (many multi-second
# XLA CPU compiles). The default `-m 'not slow'` tier keeps the unit /
# parity / kernel tests for a minutes-scale pre-commit run; run the
# full suite (no -m filter) before shipping engine/trainer changes.
pytestmark = pytest.mark.slow


FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


@pytest.fixture(autouse=True)
def _data_dir(monkeypatch):
    monkeypatch.setenv("BITDISTILLER_DATA_DIR", FIXTURES)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("tinymodel_off")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "the answer is 42 #### 42 question choices license software "
        "copyright permission the answer is A B C D mod compute " * 5
    ] * 40
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        corpus,
        trainers.BpeTrainer(vocab_size=200, special_tokens=["<unk>", "<s>", "</s>"]),
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
    )
    fast.save_pretrained(str(path))
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    save_hf_checkpoint(
        jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params),
        cfg, str(path),
    )
    return str(path)


def test_offline_loader_reads_fixture_schema():
    """The redirect serves a real datasets.Dataset from the JSONL fixture
    (column access + iteration + shuffle all work)."""
    from bitdistiller_tpu.data.offline import load_dataset

    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
    assert len(ds) > 100 and isinstance(ds["text"][0], str)
    ds2 = load_dataset("cais/mmlu", "abstract_algebra", split="test")
    assert set(ds2.column_names) == {"question", "choices", "answer"}
    assert ds2.shuffle(seed=0)[0]["question"]
    with pytest.raises(FileNotFoundError, match="hellaswag"):
        load_dataset("hellaswag", split="validation")


def test_cli_eval_tasks_offline(model_dir, capsys):
    """cli eval: ARC-Challenge + an MMLU subject + wikitext-in-harness, all
    loaded through the hub-loader code path served by fixtures."""
    main(["eval", "--model_path", model_dir,
          "--tasks", "arc_challenge,hendrycksTest-abstract_algebra,wikitext",
          "--batch_size", "4", "--num_fewshot", "2"])
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])
    assert "arc_challenge" in out and 0.0 <= out["arc_challenge"]["acc"] <= 1.0
    assert out["hendrycksTest-abstract_algebra"]["acc"] >= 0.0
    assert out["mmlu-acc"] >= 0.0  # the hendrycksTest-* aggregate
    assert np.isfinite(out["wikitext"]["ppl"]) and out["wikitext"]["ppl"] > 1.0
    # word-level lm-eval metrics ride alongside the block token PPL
    assert out["wikitext"]["word_perplexity"] > 1.0
    assert out["wikitext"]["bits_per_byte"] > 0.0


def test_cli_eval_generative_task_offline(model_dir, capsys):
    """cli eval with a greedy_until task (triviaqa): docs from the fixture,
    generation through the batching engine, alias-set scoring."""
    main(["eval", "--model_path", model_dir, "--tasks", "triviaqa",
          "--batch_size", "2", "--limit", "3", "--max_new_tokens", "6"])
    text = capsys.readouterr().out
    out = json.loads(text[text.index("{"):])
    assert out["triviaqa"]["n"] == 3
    assert 0.0 <= out["triviaqa"]["exact_match"] <= 1.0


def test_cli_ppl_offline(model_dir, capsys):
    main(["ppl", "--model_path", model_dir, "--seqlen", "128"])
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("ppl:")][-1]
    ppl = float(line.split()[1])
    assert np.isfinite(ppl) and ppl > 1.0


def test_cli_gsm8k_real_slice(model_dir, capsys):
    """cli gsm8k over the REAL 200-row GSM8K slice (limit 4 for CI time):
    the reference's own vendored test data through our whole stack."""
    main(["gsm8k", "--model_path", model_dir,
          "--data_path", os.path.join(FIXTURES, "gsm8k_test200.jsonl"),
          "--max_new_tokens", "8", "--max_batch", "2", "--limit", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 4 and 0.0 <= out["accuracy"] <= 1.0


def test_cli_humaneval_mini(model_dir, capsys):
    """cli humaneval over the mini problem set: generation + the
    rlimit-guarded functional-correctness runner, fully offline."""
    main(["humaneval", "--model_path", model_dir,
          "--data_path", os.path.join(FIXTURES, "humaneval_mini.jsonl"),
          "--max_new_tokens", "8", "--max_batch", "2", "--limit", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["pass@1"] <= 1.0


def test_humaneval_mini_solvable():
    """The mini problems are real: their canonical one-liners pass the
    rlimit-guarded runner (so a capable model CAN score 1.0)."""
    from bitdistiller_tpu.eval.humaneval import evaluate_functional_correctness

    problems = [json.loads(x) for x in open(os.path.join(FIXTURES, "humaneval_mini.jsonl"))]
    solutions = {
        "Mini/0": "def add(a, b):\n    return a + b\n",
        "Mini/1": "def is_even(n):\n    return n % 2 == 0\n",
        "Mini/2": "def reverse_string(s):\n    return s[::-1]\n",
        "Mini/3": "def maximum(xs):\n    return max(xs)\n",
        "Mini/4": "def count_vowels(s):\n    return sum(c in 'aeiou' for c in s)\n",
        "Mini/5": "def factorial(n):\n    return 1 if n < 2 else n * factorial(n - 1)\n",
        "Mini/6": "def fib(n):\n    a, b = 0, 1\n    for _ in range(n):\n        a, b = b, a + b\n    return a\n",
        "Mini/7": "def unique_sorted(xs):\n    return sorted(set(xs))\n",
    }
    comps = [solutions[p["task_id"]] for p in problems]
    res = evaluate_functional_correctness(problems, comps)
    assert res["pass@1"] == 1.0, res


def test_calib_code_loader_offline(tmp_path):
    """The calib hub loader path (load + shuffle + tokenize + block split)
    through a fixture. Uses the code dataset loader with an on-the-fly
    fixture in its schema."""
    import json as _json

    # each fixture line must encode to <= 512 tokens (1 char = 1 token here)
    row = {"instruction": "write code " * 10, "output": "def f():\n    pass\n" * 10}
    fdir = tmp_path / "d"
    fdir.mkdir()
    with open(fdir / "nickrosh_Evol-Instruct-Code-80k-v1__default__train.jsonl", "w") as f:
        for _ in range(8):
            f.write(_json.dumps(row) + "\n")
    os.environ["BITDISTILLER_DATA_DIR"] = str(fdir)

    class Tok:
        def encode(self, s, **kw):
            return [(ord(c) % 250) + 3 for c in s][:2048]

        def __call__(self, s, **kw):
            import types

            return types.SimpleNamespace(input_ids=self.encode(s))

    from bitdistiller_tpu.data.calib import get_calib_dataset

    blocks = get_calib_dataset("code", Tok(), n_samples=4, block_size=64)
    arr = np.asarray(blocks)  # list of [1, block_size] blocks
    assert arr.shape[-1] == 64 and arr.size >= 64
