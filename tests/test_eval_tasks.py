"""Eval-harness tests: loglikelihood adaptor correctness, task scoring,
GSM8K extraction/grading, HumanEval post-processing + execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdistiller_tpu.eval.gsm8k import extract_answer, grade, grade_ensemble
from bitdistiller_tpu.eval.humaneval import (
    check_correctness,
    evaluate_functional_correctness,
    postprocess_completion,
)
from bitdistiller_tpu.eval.tasks import LogLikelihoodFn, MCDoc, evaluate_task
from bitdistiller_tpu.models import TINY_TEST, forward, init_params


class CharTok:
    def encode(self, s):
        return [(ord(c) % 250) + 3 for c in s]

    def decode(self, ids, **kw):
        return "".join(chr((i - 3) % 26 + 97) for i in ids)


@pytest.fixture(scope="module")
def ll_fn():
    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0))
    return LogLikelihoodFn(params, cfg, CharTok(), max_len=128, batch_size=4), params, cfg


def test_loglikelihood_matches_manual(ll_fn):
    fn, params, cfg = ll_fn
    ctx, cont = "hello ", "worl"
    (ll, greedy), = fn([(ctx, cont)])
    tok = CharTok()
    whole = tok.encode(ctx + cont)
    n_ctx = len(tok.encode(ctx))
    logits, _ = forward(params, cfg, jnp.asarray([whole], jnp.int32))
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
    want = float(
        sum(logp[i - 1, whole[i]] for i in range(n_ctx, len(whole)))
    )
    np.testing.assert_allclose(ll, want, rtol=1e-4)


def test_loglikelihood_batching_order(ll_fn):
    fn, *_ = ll_fn
    pairs = [("abc", " x"), ("a much longer context here", " y"), ("zz", " q")]
    one_by_one = [fn([p])[0][0] for p in pairs]
    batched = [r[0] for r in fn(pairs)]
    np.testing.assert_allclose(batched, one_by_one, rtol=1e-4)


def test_evaluate_task_scoring(ll_fn):
    fn, *_ = ll_fn
    docs = [
        MCDoc("the sky is", [" blue", " a very long wrong option"], 0),
        MCDoc("water is", [" wet", " dry"], 0),
    ]
    res = evaluate_task(fn, docs)
    assert set(res) == {"acc", "acc_norm", "n"}
    assert res["n"] == 2
    assert 0.0 <= res["acc"] <= 1.0


def test_evaluate_task_perchoice_contexts(ll_fn):
    """Winogrande-style: list of contexts, shared continuation."""
    fn, *_ = ll_fn
    docs = [MCDoc(["Alice said ", "Bob said "], ["hello", "hello"], 1)]
    res = evaluate_task(fn, docs)
    assert res["n"] == 1


def test_gsm8k_extract():
    assert extract_answer("blah blah #### 42") == "42"
    assert extract_answer("The answer is: 3,120.") == "3120"
    assert extract_answer("so we get 7 apples. The answer is 7") == "7"
    assert extract_answer("= $18.50 total #### 18.50") == "18.50"
    assert extract_answer("no numbers here") is None


def test_gsm8k_grade():
    preds = ["#### 5", "the answer is 3", "#### 9"]
    refs = ["#### 5", "#### 4", "#### 9.0"]
    res = grade(preds, refs)
    assert res["accuracy"] == pytest.approx(2 / 3)


def test_gsm8k_ensemble_majority():
    sets = [["#### 5"], ["#### 7"], ["#### 5"]]
    refs = ["#### 5"]
    res = grade_ensemble(sets, refs)
    assert res["accuracy"] == 1.0


def test_humaneval_postprocess():
    fenced = "Sure!\n```python\ndef f():\n    return 1\n```\nHope it helps"
    assert postprocess_completion(fenced) == "def f():\n    return 1\n"
    raw = "def g():\n    return 2\n### Instruction: more"
    assert postprocess_completion(raw) == "def g():\n    return 2\n"


def test_humaneval_execution():
    problem = {
        "prompt": "def add(a, b):\n",
        "test": "def check(candidate):\n    assert candidate(1, 2) == 3\n",
        "entry_point": "add",
    }
    good = "def add(a, b):\n    return a + b\n"
    bad = "def add(a, b):\n    return a - b\n"
    assert check_correctness(problem, good)
    assert not check_correctness(problem, bad)
    res = evaluate_functional_correctness([problem, problem], [good, bad])
    assert res["pass@1"] == 0.5


# -- additional LL tasks (openbookqa/sciq/copa) and cloze (lambada) ---------

from bitdistiller_tpu.eval.tasks import (
    CLOZE_TASKS,
    ClozeDoc,
    TASK_REGISTRY,
    evaluate_cloze_task,
    run_tasks,
)


def test_new_task_loaders_format(monkeypatch):
    """Doc formatting of the round-2 task additions, on synthetic hub rows
    (the real datasets need network; formats follow lm-eval's task defs)."""
    rows = {
        ("openbookqa",): [{
            "question_stem": "The sun is a",
            "choices": {"label": ["A", "B"], "text": ["star", "planet"]},
            "answerKey": "A",
        }],
        ("sciq",): [{
            "support": "Water boils at 100C.",
            "question": "At what temperature does water boil?",
            "distractor1": "50C", "distractor2": "75C", "distractor3": "10C",
            "correct_answer": "100C",
        }],
        ("super_glue", "copa"): [{
            "premise": "The man fell.", "question": "cause",
            "choice1": "He tripped.", "choice2": "He flew.", "label": 0,
        }],
        ("EleutherAI/lambada_openai", "en"): [{"text": "the cat sat on the mat"}],
    }

    def fake_load(*args, split=None, **kw):
        key = tuple(a for a in args if isinstance(a, str))
        if key[0] == "openbookqa":
            key = ("openbookqa",)
        return rows[key]

    monkeypatch.setattr("datasets.load_dataset", fake_load)

    (d,) = TASK_REGISTRY["openbookqa"]()
    assert d.context == "The sun is a" and d.choices == [" star", " planet"]
    assert d.gold == 0

    (d,) = TASK_REGISTRY["sciq"]()
    assert d.context.startswith("Water boils")
    assert d.context.endswith("Answer:")
    assert d.choices[3] == " 100C" and d.gold == 3

    (d,) = TASK_REGISTRY["copa"]()
    # period dropped, connector appended, choice first letter lowercased
    assert d.context == "The man fell because"
    assert d.choices == [" he tripped.", " he flew."] and d.gold == 0

    (d,) = CLOZE_TASKS["lambada_openai"]()
    assert d.context == "the cat sat on the" and d.continuation == " mat"


def test_round5_task_loaders_from_fixtures(monkeypatch):
    """logiqa/mathqa/race loaders against the offline fixtures: schemas
    (mathqa's packed options string, race's per-article collation) parse
    into well-formed MCDocs with correct golds."""
    import os

    monkeypatch.setenv(
        "BITDISTILLER_DATA_DIR",
        os.path.join(os.path.dirname(__file__), "..", "fixtures"),
    )

    docs = TASK_REGISTRY["logiqa"]()
    assert len(docs) == 4
    assert docs[0].context.startswith("Passage: All cats are mammals.")
    assert docs[0].context.endswith("Answer:")
    assert "A. Whiskers is a mammal.\n" in docs[0].context
    assert docs[0].choices[0] == " Whiskers is a mammal." and docs[0].gold == 0
    assert docs[3].gold == 3

    docs = TASK_REGISTRY["mathqa"]()
    assert len(docs) == 5
    d = docs[0]  # 12 + 7: packed "a ) 17 , b ) 18 , c ) 19 , d ) 20 , e ) 22"
    assert d.context == "Question: what is 12 + 7 ?\nAnswer:"
    assert d.choices == [" 17", " 18", " 19", " 20", " 22"] and d.gold == 2

    docs = TASK_REGISTRY["race"]()
    # 3 question rows over 2 articles -> 2 collated docs
    assert len(docs) == 2
    tom = next(d for d in docs if "Tom walked" in d.context)
    # the earlier question of the article rides answered in-context
    assert "Question: What did Tom buy at the market?\nAnswer: " in tom.context
    assert tom.context.endswith("Who did Tom meet near the fountain?")
    assert tom.choices[2] == " Sara" and tom.gold == 2
    lib = next(d for d in docs if "library" in d.context)
    assert lib.gold == 3

    # registry round-trip through run_tasks with a trivial scorer: the
    # shortest-choice-wins fake LL keeps it deterministic
    res = run_tasks(lambda pairs: [(-float(len(c)), True) for _, c in pairs],
                    ["mathqa"])
    assert res["mathqa"]["n"] == 5


def test_evaluate_cloze_task_scoring():
    docs = [ClozeDoc("a b c", " d"), ClozeDoc("x y", " z")]

    def fake_ll(pairs):
        assert pairs == [("a b c", " d"), ("x y", " z")]
        return [(-1.0, True), (-3.0, False)]

    res = evaluate_cloze_task(fake_ll, docs)
    assert res["acc"] == 0.5 and res["n"] == 2
    np.testing.assert_allclose(res["ppl"], np.exp(2.0), rtol=1e-6)


def test_run_tasks_dispatches_cloze(monkeypatch):
    from bitdistiller_tpu.eval import tasks as T

    monkeypatch.setitem(T.CLOZE_TASKS, "lambada_openai", lambda: [ClozeDoc("a", " b")])
    monkeypatch.setitem(T.TASK_REGISTRY, "copa", lambda: [MCDoc("c", [" x", " y"], 0)])
    calls = []

    def fake_ll(pairs):
        calls.append(pairs)
        return [(-1.0, True)] * len(pairs)

    res = T.run_tasks(fake_ll, ["lambada_openai", "copa"])
    assert res["lambada_openai"]["ppl"] == pytest.approx(np.exp(1.0))
    # copa reports acc only (TASK_METRICS filter)
    assert set(res["copa"]) == {"acc", "n"}
    assert res["qa-avg"] == pytest.approx(1.0)


# -- generative (greedy_until) path -----------------------------------------

from bitdistiller_tpu.eval.tasks import (
    GenDoc,
    GreedyUntilFn,
    evaluate_gen_task,
    trim_at_stops,
)


def test_trim_at_stops():
    assert trim_at_stops("abc\ndef", ["\n"]) == "abc"
    assert trim_at_stops("abcSTOPdef\nx", ["\n", "STOP"]) == "abc"
    assert trim_at_stops("no stops here", ["\n"]) == "no stops here"
    assert trim_at_stops("x", []) == "x"


def test_evaluate_gen_task_exact_match():
    docs = [
        GenDoc("Q1:", " yes", until=["\n"]),
        GenDoc("Q2:", " no", until=["\n"]),
        GenDoc("Q3:", " maybe", until=["\n"]),
    ]

    def fake_gen(requests):
        assert [u for _, u in requests] == [("\n",)] * 3
        return [" yes", " wrong", " maybe  "]

    res = evaluate_gen_task(fake_gen, docs)
    assert res == {"exact_match": 2 / 3, "n": 3}
    res = evaluate_gen_task(fake_gen, docs, postprocess=lambda s: s.strip())
    assert res["exact_match"] == 2 / 3


def test_rolling_matches_manual(ll_fn):
    """LogLikelihoodFn.rolling == full-sequence NLL conditioned on the
    prefix token (single window), and is window-split invariant."""
    fn, params, cfg = ll_fn
    text = "hello rolling world"
    (total,) = fn.rolling([text])
    tok = CharTok()
    toks = tok.encode(text)
    seq = [0] + toks  # CharTok has no eos/bos -> prefix 0
    logits, _ = forward(params, cfg, jnp.asarray([seq], jnp.int32))
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
    want = float(sum(logp[i, seq[i + 1]] for i in range(len(toks))))
    np.testing.assert_allclose(total, want, rtol=1e-4)
    # multi-window path: shrink max_len so the text spans several windows;
    # every token is still scored exactly once (values differ only through
    # the 1-token carried context, so just check finiteness + count here)
    small = LogLikelihoodFn(params, cfg, tok, max_len=8, batch_size=4)
    (t2,) = small.rolling([text])
    assert np.isfinite(t2) and t2 < 0


def test_wikitext_word_ppl_task(ll_fn, monkeypatch):
    """run_tasks('wikitext') — the lm-eval word-level perplexity task —
    over the offline fixture."""
    import os

    from bitdistiller_tpu.eval.tasks import run_tasks

    fn, *_ = ll_fn
    monkeypatch.setenv(
        "BITDISTILLER_DATA_DIR",
        os.path.join(os.path.dirname(__file__), "..", "fixtures"),
    )
    res = run_tasks(fn, ["wikitext"], limit=1)
    wt = res["wikitext"]
    assert set(wt) >= {"word_perplexity", "byte_perplexity", "bits_per_byte"}
    assert wt["word_perplexity"] > 1.0 and np.isfinite(wt["word_perplexity"])
    assert 1.0 < wt["byte_perplexity"] < wt["word_perplexity"]
    assert "qa-avg" not in res  # no acc-type tasks ran


def test_gen_task_gsm8k_registry(monkeypatch):
    """GEN_TASKS['gsm8k'] docs come from the hub-schema fixture with
    few-shot exemplars held out, and the matcher grades by '#### n'
    extraction (lm-eval gsm8k protocol)."""
    import os

    from bitdistiller_tpu.eval.tasks import GEN_TASKS, run_gen_tasks

    monkeypatch.setenv(
        "BITDISTILLER_DATA_DIR",
        os.path.join(os.path.dirname(__file__), "..", "fixtures"),
    )
    loader, _, match = GEN_TASKS["gsm8k"]
    docs = loader()
    assert len(docs) == 100  # 105 fixture rows - 5 few-shot exemplars
    assert docs[0].context.count("Question:") == 6  # 5 shots + the query
    assert docs[0].target.lstrip("-").replace(".", "").isdigit()
    assert match(f"some reasoning #### {docs[0].target}", docs[0].target)
    assert match(f"#### {docs[0].target},000", docs[0].target) is False
    assert not match("no answer marker", docs[0].target)

    def fake_gen(requests):
        # answer the first two correctly, the rest without an answer marker
        return [
            f" working... #### {docs[i].target}" if i < 2 else " no marker"
            for i in range(len(requests))
        ]

    res = run_gen_tasks(fake_gen, ["gsm8k"], limit=4)
    assert res["gsm8k"] == {"exact_match": 0.5, "n": 4}


def test_gen_task_triviaqa_registry(monkeypatch):
    """GEN_TASKS['triviaqa']: normalized alias-set membership scoring
    (lm-eval triviaqa protocol: lowercase, strip punctuation)."""
    import os

    from bitdistiller_tpu.eval.tasks import GEN_TASKS, run_gen_tasks

    monkeypatch.setenv(
        "BITDISTILLER_DATA_DIR",
        os.path.join(os.path.dirname(__file__), "..", "fixtures"),
    )
    loader, _, match = GEN_TASKS["triviaqa"]
    docs = loader()
    assert docs and docs[0].context.startswith("Question:")
    assert isinstance(docs[0].target, list)
    assert match(" " + docs[0].target[0].upper() + ".", docs[0].target)
    assert not match("definitely wrong", docs[0].target)

    def fake_gen(requests):
        return [" " + docs[i].target[0] for i in range(len(requests))]

    res = run_gen_tasks(fake_gen, ["triviaqa"], limit=5)
    assert res["triviaqa"] == {"exact_match": 1.0, "n": 5}


def test_greedy_until_fn_through_engine():
    """End-to-end: GreedyUntilFn drives the real engine; the result must
    equal trimming the engine's raw greedy output."""
    from bitdistiller_tpu.serve import Engine, SamplingParams

    cfg = TINY_TEST
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    eng = Engine(
        params, cfg, max_slots=2, max_len=32,
        sampling=SamplingParams(temperature=0.0), eos_token_id=None,
    )
    tok = CharTok()
    gen_fn = GreedyUntilFn(eng, tok, max_new_tokens=6)
    ctxs = ["hello", "world!"]
    raw = eng.generate([tok.encode(c) for c in ctxs], max_new_tokens=6)
    want = [
        tok.decode(o)[: len(tok.decode(o)) if "a" not in tok.decode(o) else tok.decode(o).find("a")]
        for o in raw
    ]
    got = gen_fn([(c, ["a"]) for c in ctxs])
    assert got == want
    assert all(len(g) <= 6 for g in got)
