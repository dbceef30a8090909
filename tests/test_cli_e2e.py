"""CLI end-to-end tests: drive the gsm8k / humaneval / mix_data subcommands
through main() against a real tiny checkpoint with a real trained tokenizer
(fully offline)."""

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



@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Tiny model + trained BPE tokenizer saved HF-style."""
    path = tmp_path_factory.mktemp("tinymodel")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = ["the answer is 42 #### 42 one two three four five " * 10] * 40
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        corpus, trainers.BpeTrainer(vocab_size=200, special_tokens=["<unk>", "<s>", "</s>"])
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


def test_cli_gsm8k(model_dir, tmp_path, capsys):
    data = tmp_path / "gsm.jsonl"
    with open(data, "w") as f:
        for i in range(3):
            f.write(json.dumps({"query": f"What is {i} + {i}?",
                                "response": f"adding gives #### {2*i}"}) + "\n")
    main(["gsm8k", "--model_path", model_dir, "--data_path", str(data),
          "--max_new_tokens", "8", "--max_batch", "2", "--limit", "3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 3 and 0.0 <= out["accuracy"] <= 1.0


def test_cli_humaneval(model_dir, tmp_path, capsys):
    data = tmp_path / "he.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({
            "task_id": "T/0", "prompt": "def f(x):\n",
            "test": "def check(candidate):\n    assert candidate(1) == 1\n",
            "entry_point": "f",
        }) + "\n")
    main(["humaneval", "--model_path", model_dir, "--data_path", str(data),
          "--max_new_tokens", "8", "--max_batch", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["pass@1"] <= 1.0


def test_cli_mix_data(tmp_path, capsys):
    a, b = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    a.write_text("".join(json.dumps([["pa", "ra"]]) + "\n" for _ in range(3)))
    b.write_text(json.dumps([["pb", "rb"]]) + "\n")
    out = tmp_path / "mix.jsonl"
    main(["mix_data", str(a), str(b), "--out", str(out)])
    assert len(out.read_text().splitlines()) == 4


def test_cli_gsm8k_spec_decode_matches(model_dir, tmp_path, capsys):
    """--spec_decode through the CLI: same accuracy/extraction as the plain
    engine at temperature 0 (f32 checkpoint: greedy is tie-free)."""
    data = tmp_path / "gsm_spec.jsonl"
    with open(data, "w") as f:
        for i in range(3):
            f.write(json.dumps({"query": f"What is {i} + {i}?",
                                "response": f"adding gives #### {2*i}"}) + "\n")
    outs = {}
    for flag in ([], ["--spec_decode"]):
        main(["gsm8k", "--model_path", model_dir, "--data_path", str(data),
              "--max_new_tokens", "8", "--max_batch", "2", "--limit", "3",
              "--temperature", "0.0"] + flag)
        outs[bool(flag)] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
    assert outs[True] == outs[False]
