"""Reasoning-eval extraction rules + an end-to-end run on the tiny engine.

Reference capability: lighteval aime24/math_500/gpqa:diamond runs
(scripts/sing/generate_sing_yaml.py:92-107)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.eval.reasoning import (
    extract_boxed,
    extract_letter,
    extract_math_answer,
    math_answers_match,
    normalize_math,
    run_reasoning,
)


def test_extract_boxed_brace_matching():
    assert extract_boxed(r"so \boxed{42}") == "42"
    assert extract_boxed(r"\boxed{\frac{1}{2}}") == r"\frac{1}{2}"
    # last boxed wins
    assert extract_boxed(r"\boxed{1} then \boxed{2}") == "2"
    assert extract_boxed("no box here") is None


def test_extract_math_answer_fallbacks():
    assert extract_math_answer("The answer is 17.") == "17"
    assert extract_math_answer("... = 3 + 4 = 7") == "7"
    assert extract_math_answer(r"thus \boxed{042}") == "042"


def test_math_normalization_and_match():
    assert normalize_math("042") == "42"
    assert normalize_math("1,000") == "1000"
    assert normalize_math("$12.$") == "12"
    assert math_answers_match("042", 42)
    assert math_answers_match("7.0", "7")
    assert not math_answers_match("6", 7)
    assert not math_answers_match(None, 7)


def test_extract_letter():
    assert extract_letter("Answer: C") == "C"
    assert extract_letter("the answer is (b)") == "B"
    assert extract_letter("blah blah\nD") == "D"
    assert extract_letter("no letters 123") is None


def test_run_reasoning_end_to_end_tiny():
    """Engine-driven run on a tiny random model: exercises prompt building,
    generation, extraction, voting, and scoring (accuracy in [0, 1])."""
    from bitdistiller_tpu.models import TINY_TEST, init_params
    from bitdistiller_tpu.serve import Engine, SamplingParams

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    eng = Engine(params, cfg, max_slots=2, max_len=96,
                 sampling=SamplingParams(temperature=0.0), eos_token_id=None)

    class Tok:
        def encode(self, s):
            return [ord(c) % cfg.vocab_size for c in s][:48]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    docs = [{"problem": "1+1?", "answer": 2}, {"problem": "2+2?", "answer": 4}]
    res = run_reasoning(eng, Tok(), docs, "aime", max_new_tokens=4, n_samples=1)
    assert res["n"] == 2 and 0.0 <= res["accuracy"] <= 1.0

    gdocs = [{"question": "q?", "choices": ["w", "x", "y", "z"], "answer": 1}]
    res2 = run_reasoning(eng, Tok(), gdocs, "gpqa", max_new_tokens=4)
    assert res2["n"] == 1 and 0.0 <= res2["accuracy"] <= 1.0
