"""Multiple-choice / loglikelihood task harness.

Replaces the reference's vendored ~16k-LoC lm-eval fork (test/general/lm_eval,
evaluator.py:17-120) with a compact runner covering the tasks the reference
actually evaluates (llm_eval.py:66-106, readme.md:183-189): MMLU
(hendrycksTest-*, 5-shot), ARC-easy/challenge, HellaSwag, PIQA, Winogrande,
BoolQ — plus OpenBookQA, SciQ, COPA, LogiQA, MathQA, RACE, and LAMBADA from
the fork's wider task registry — scored by loglikelihood (acc) and
char-length-normalized loglikelihood (acc_norm), identical to lm-eval's
metrics. Word-level wikitext perplexity (rolling loglikelihood) and
generative greedy_until tasks (gsm8k, triviaqa) run through the same
registry (run_tasks / run_gen_tasks).

The model adaptor is `LogLikelihoodFn`: batched sum-of-logprobs of a
continuation given a context, padded to length buckets so jit recompiles stay
bounded (parity with utils_eval.py:7-114 LMEvalAdaptor's _model_call role).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig


# ---------------------------------------------------------------------------
# Model adaptor
# ---------------------------------------------------------------------------


class LogLikelihoodFn:
    """Batched log P(continuation | context) over a jitted forward."""

    def __init__(self, params, cfg: ModelConfig, tokenizer, *, quantizer=None,
                 max_len: int = 2048, batch_size: int = 8):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.max_len = max_len
        self.batch_size = batch_size

        def ll(params, tokens, cont_mask):
            logits, _ = llama.forward(params, cfg, tokens, quantizer=quantizer)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
            tgt = tokens[:, 1:]
            tok_ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            greedy = logits[:, :-1].argmax(-1) == tgt
            m = cont_mask[:, 1:]
            return (tok_ll * m).sum(-1), jnp.all(greedy | ~m.astype(bool), axis=-1)

        self._ll = jax.jit(ll)

    def _encode_pair(self, context: str, continuation: str):
        ctx = self.tok.encode(context)
        whole = self.tok.encode(context + continuation)
        if whole[: len(ctx)] != ctx:  # retokenization boundary: fall back
            cont = self.tok.encode(continuation)
            whole = ctx + cont
        n_ctx = len(ctx)
        whole = whole[-self.max_len :]
        n_ctx = max(n_ctx - max(len(whole) + n_ctx - self.max_len, 0), 1)
        return whole, n_ctx

    def _score_encoded(self, encoded: list[tuple[list, int]]) -> list[tuple[float, bool]]:
        """Bucketed batched scoring of (token_seq, n_ctx) items: sum logprob
        of tokens [n_ctx:] plus an all-greedy flag."""
        results: list = [None] * len(encoded)
        order = sorted(range(len(encoded)), key=lambda i: len(encoded[i][0]))
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            maxlen = max(len(encoded[i][0]) for i in idxs)
            bucket = 64
            while bucket < maxlen:
                bucket *= 2
            bucket = min(bucket, self.max_len)
            toks = np.zeros((len(idxs), bucket), np.int32)
            mask = np.zeros((len(idxs), bucket), np.float32)
            for row, i in enumerate(idxs):
                seq, n_ctx = encoded[i]
                toks[row, : len(seq)] = seq
                mask[row, n_ctx : len(seq)] = 1.0
            lls, greedy = self._ll(self.params, jnp.asarray(toks), jnp.asarray(mask))
            lls, greedy = np.asarray(lls), np.asarray(greedy)
            for row, i in enumerate(idxs):
                results[i] = (float(lls[row]), bool(greedy[row]))
        return results

    def __call__(self, pairs: Sequence[tuple[str, str]]) -> list[tuple[float, bool]]:
        return self._score_encoded([self._encode_pair(c, x) for c, x in pairs])

    def rolling(self, texts: Sequence[str]) -> list[float]:
        """Sum log-likelihood of each full text — lm-eval's
        loglikelihood_rolling (base.py) semantics: the token stream is split
        into disjoint (max_len - 1)-token windows, each conditioned on ONE
        carried token (the previous window's last token; an EOS/BOS prefix
        token for the first — utils.get_rolling_token_windows with
        context_len=1), and every token of the text is scored exactly once."""
        prefix = (
            getattr(self.tok, "eos_token_id", None)
            or getattr(self.tok, "bos_token_id", None)
            or 0
        )
        windows: list[tuple[list, int]] = []
        spans: list[tuple[int, int]] = []
        step = self.max_len - 1
        for text in texts:
            toks = self.tok.encode(text)
            start = len(windows)
            for i in range(0, len(toks), step):
                ctx = prefix if i == 0 else toks[i - 1]
                windows.append(([ctx] + toks[i : i + step], 1))
            spans.append((start, len(windows)))
        scored = self._score_encoded(windows)
        return [sum(scored[i][0] for i in range(s, e)) for s, e in spans]


# ---------------------------------------------------------------------------
# Task definitions
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MCDoc:
    context: str
    choices: list
    gold: int


TaskLoader = Callable[..., list]


def _hellaswag_docs(split="validation"):
    from ..data.offline import load_dataset

    def preprocess(text):
        text = text.strip().replace(" [title]", ". ")
        import re

        text = re.sub(r"\[.*?\]", "", text).replace("  ", " ")
        return text

    ds = load_dataset("hellaswag", split=split)
    docs = []
    for d in ds:
        ctx = d["ctx_a"] + " " + d["ctx_b"].capitalize()
        query = preprocess(d["activity_label"] + ": " + ctx)
        docs.append(
            MCDoc(query, [" " + preprocess(e) for e in d["endings"]], int(d["label"]))
        )
    return docs


def _piqa_docs(split="validation"):
    from ..data.offline import load_dataset

    ds = load_dataset("piqa", split=split)
    return [
        MCDoc(
            f"Question: {d['goal']}\nAnswer:",
            [" " + d["sol1"], " " + d["sol2"]],
            int(d["label"]),
        )
        for d in ds
    ]


def _arc_docs(subset, split="test"):
    from ..data.offline import load_dataset

    ds = load_dataset("ai2_arc", subset, split=split)
    docs = []
    for d in ds:
        labels = d["choices"]["label"]
        if d["answerKey"] not in labels:
            continue
        docs.append(
            MCDoc(
                f"Question: {d['question']}\nAnswer:",
                [" " + t for t in d["choices"]["text"]],
                labels.index(d["answerKey"]),
            )
        )
    return docs


def _winogrande_docs(split="validation"):
    from ..data.offline import load_dataset

    ds = load_dataset("winogrande", "winogrande_xl", split=split)
    docs = []
    for d in ds:
        idx = d["sentence"].index("_")
        # winogrande scores partial-context: choice fills the blank
        ctx_opts = [
            d["sentence"][:idx] + d[f"option{i}"] for i in (1, 2)
        ]
        cont = d["sentence"][idx + 1 :]
        # encode as per-choice contexts with shared continuation
        docs.append(MCDoc(ctx_opts, [cont, cont], int(d["answer"]) - 1))
    return docs


def _boolq_docs(split="validation"):
    from ..data.offline import load_dataset

    ds = load_dataset("super_glue", "boolq", split=split)
    return [
        MCDoc(
            f"{d['passage']}\nQuestion: {d['question']}?\nAnswer:",
            [" no", " yes"],
            int(d["label"]),
        )
        for d in ds
    ]


def _openbookqa_docs(split="test"):
    from ..data.offline import load_dataset

    ds = load_dataset("openbookqa", "main", split=split)
    docs = []
    for d in ds:
        labels = d["choices"]["label"]
        docs.append(
            MCDoc(
                d["question_stem"],
                [" " + t for t in d["choices"]["text"]],
                labels.index(d["answerKey"]),
            )
        )
    return docs


def _sciq_docs(split="test"):
    from ..data.offline import load_dataset

    ds = load_dataset("sciq", split=split)
    docs = []
    for d in ds:
        support = d.get("support", "").lstrip()
        ctx = f"{support}\nQuestion: {d['question']}\nAnswer:".lstrip()
        choices = [d["distractor1"], d["distractor2"], d["distractor3"],
                   d["correct_answer"]]
        docs.append(MCDoc(ctx, [" " + c for c in choices], 3))
    return docs


def _copa_docs(split="validation"):
    from ..data.offline import load_dataset

    ds = load_dataset("super_glue", "copa", split=split)

    def drop_period(s):  # lm-eval lowercases the choice's first letter
        return s[0].lower() + s[1:]

    docs = []
    for d in ds:
        connector = {"cause": "because", "effect": "therefore"}[d["question"]]
        ctx = d["premise"].strip()[:-1] + f" {connector}"
        docs.append(
            MCDoc(
                ctx,
                [" " + drop_period(d["choice1"]), " " + drop_period(d["choice2"])],
                int(d["label"]),
            )
        )
    return docs


@dataclasses.dataclass
class ClozeDoc:
    """Single-continuation doc (lambada): acc = greedy match of the final
    word, ppl = exp(-mean loglikelihood)."""

    context: str
    continuation: str


def _lambada_docs(split="test"):
    from ..data.offline import load_dataset

    ds = load_dataset("EleutherAI/lambada_openai", "en", split=split)
    docs = []
    for d in ds:
        ctx, _, last = d["text"].strip().rpartition(" ")
        docs.append(ClozeDoc(ctx, " " + last))
    return docs


def evaluate_cloze_task(ll_fn, docs: Iterable, limit: Optional[int] = None) -> dict:
    """lambada-style scoring (lm-eval tasks/lambada.py): accuracy is whether
    the continuation is the greedy argmax at every position; perplexity is
    exp(-mean ll)."""
    import math

    docs = list(docs)
    if limit:
        docs = docs[:limit]
    results = ll_fn([(d.context, d.continuation) for d in docs])
    n = len(docs)
    acc = sum(int(g) for _, g in results)
    mean_ll = float(np.mean([ll for ll, _ in results])) if n else 0.0
    return {"acc": acc / n if n else 0.0, "ppl": math.exp(-mean_ll), "n": n}


MMLU_SUBJECTS = [
    "abstract_algebra", "anatomy", "astronomy", "business_ethics",
    "clinical_knowledge", "college_biology", "college_chemistry",
    "college_computer_science", "college_mathematics", "college_medicine",
    "college_physics", "computer_security", "conceptual_physics",
    "econometrics", "electrical_engineering", "elementary_mathematics",
    "formal_logic", "global_facts", "high_school_biology",
    "high_school_chemistry", "high_school_computer_science",
    "high_school_european_history", "high_school_geography",
    "high_school_government_and_politics", "high_school_macroeconomics",
    "high_school_mathematics", "high_school_microeconomics",
    "high_school_physics", "high_school_psychology", "high_school_statistics",
    "high_school_us_history", "high_school_world_history", "human_aging",
    "human_sexuality", "international_law", "jurisprudence",
    "logical_fallacies", "machine_learning", "management", "marketing",
    "medical_genetics", "miscellaneous", "moral_disputes",
    "moral_scenarios", "nutrition", "philosophy", "prehistory",
    "professional_accounting", "professional_law", "professional_medicine",
    "professional_psychology", "public_relations", "security_studies",
    "sociology", "us_foreign_policy", "virology", "world_religions",
]


def _mmlu_docs(subject: str, n_shot: int = 5):
    """hendrycksTest-style 5-shot prompts (dev split as exemplars)."""
    from ..data.offline import load_dataset

    letters = ["A", "B", "C", "D"]

    def fmt(d, with_answer):
        s = d["question"].strip()
        for letter, c in zip(letters, d["choices"]):
            s += f"\n{letter}. {c}"
        s += "\nAnswer:"
        if with_answer:
            s += f" {letters[d['answer']]}\n\n"
        return s

    dev = load_dataset("cais/mmlu", subject, split="dev")
    test = load_dataset("cais/mmlu", subject, split="test")
    header = (
        f"The following are multiple choice questions (with answers) about "
        f"{subject.replace('_', ' ')}.\n\n"
    )
    fewshot = header + "".join(fmt(d, True) for d in list(dev)[:n_shot])
    return [
        MCDoc(fewshot + fmt(d, False), [f" {l}" for l in letters], int(d["answer"]))
        for d in test
    ]


def wikitext_detokenizer(string: str) -> str:
    """WikiText detokenization rules — protocol constants identical to the
    lm-eval fork's wikitext task (tasks/wikitext.py:28-60), required for
    word_perplexity parity."""
    import re

    string = string.replace("s '", "s'")
    string = re.sub(r"/' [0-9]/", r"/'[0-9]/", string)
    string = string.replace(" @-@ ", "-")
    string = string.replace(" @,@ ", ",")
    string = string.replace(" @.@ ", ".")
    string = string.replace(" : ", ": ")
    string = string.replace(" ; ", "; ")
    string = string.replace(" . ", ". ")
    string = string.replace(" ! ", "! ")
    string = string.replace(" ? ", "? ")
    string = string.replace(" , ", ", ")
    string = re.sub(r"\(\s*([^\)]*?)\s*\)", r"(\1)", string)
    string = re.sub(r"\[\s*([^\]]*?)\s*\]", r"[\1]", string)
    string = re.sub(r"{\s*([^}]*?)\s*}", r"{\1}", string)
    string = re.sub(r"\"\s*([^\"]*?)\s*\"", r'"\1"', string)
    string = re.sub(r"'\s*([^']*?)\s*'", r"'\1'", string)
    string = string.replace("= = = =", "====")
    string = string.replace("= = =", "===")
    string = string.replace("= =", "==")
    string = string.replace(" " + chr(176) + " ", chr(176))
    string = string.replace(" \n", "\n")
    string = string.replace("\n ", "\n")
    string = string.replace(" N ", " 1 ")
    string = string.replace(" 's", "'s")
    return string


def _wikitext_docs() -> list[str]:
    """Raw WikiText-2 test documents for the word-level perplexity task
    (lm-eval fork tasks/wikitext.py WikiText: document-level pages).
    Falls back to the line-level `wikitext` fixture/hub dataset joined into
    one document when the document-level variant is unavailable."""
    from ..data.offline import load_dataset

    try:
        ds = load_dataset(
            "EleutherAI/wikitext_document_level", "wikitext-2-raw-v1",
            split="test",
        )
        return [d["page"] for d in ds]
    except Exception:  # fixture/hub miss for the document-level variant
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        return ["".join(d["text"] for d in ds)]


def evaluate_perplexity_task(ll_fn, docs: Sequence[str], limit=None) -> dict:
    """word/byte perplexity + bits_per_byte over rolling loglikelihood —
    the lm-eval PerplexityTask metrics (base.py:Perplexity- word_perplexity
    = exp(total_nll / words of the ORIGINAL doc), byte_perplexity over the
    detokenized target's utf-8 bytes)."""
    import math
    import re as _re

    docs = list(docs)
    if limit:
        docs = docs[:limit]
    targets = [wikitext_detokenizer(d) for d in docs]
    lls = ll_fn.rolling(targets)
    total_ll = float(sum(lls))
    words = sum(len(_re.split(r"\s+", d)) for d in docs)
    nbytes = sum(len(t.encode("utf-8")) for t in targets)
    return {
        "word_perplexity": math.exp(-total_ll / max(words, 1)),
        "byte_perplexity": math.exp(-total_ll / max(nbytes, 1)),
        "bits_per_byte": -total_ll / (max(nbytes, 1) * math.log(2)),
        "n": len(docs),
    }


def _logiqa_docs(split="test"):
    """LogiQA Passage/Question/Choices/Answer format (lm-eval tasks/
    logiqa.py:56-80; label is a letter a-d into the options list)."""
    from ..data.offline import load_dataset

    letters = ["a", "b", "c", "d"]
    ds = load_dataset("logiqa", split=split)
    docs = []
    for d in ds:
        prompt = "Passage: " + d["context"] + "\n"
        prompt += "Question: " + d["question"] + "\nChoices:\n"
        for letter, option in zip(letters, d["options"]):
            prompt += f"{letter.upper()}. {option}\n"
        prompt += "Answer:"
        docs.append(
            MCDoc(prompt, [" " + o for o in d["options"]],
                  letters.index(d["label"]))
        )
    return docs


def _mathqa_docs(split="test"):
    """MathQA 'Question: .../Answer:' with choices parsed out of the packed
    'a ) ... , b ) ...' options string (lm-eval tasks/mathqa.py:51-63)."""
    import re as _re

    from ..data.offline import load_dataset

    ds = load_dataset("math_qa", split=split)
    docs = []
    for d in ds:
        choices = [
            c[4:].rstrip(" ,")
            for c in _re.findall(r"[abcd] \) .*?, |e \) .*?$", d["options"])
        ]
        gold = ["a", "b", "c", "d", "e"].index(d["correct"])
        docs.append(
            MCDoc("Question: " + d["Problem"] + "\nAnswer:",
                  [" " + c for c in choices], gold)
        )
    return docs


def _race_docs(split="test"):
    """RACE-high, GPT-3 protocol (lm-eval tasks/race.py:55-137): the HF rows
    are one-per-question, but the task collates per ARTICLE — the last
    question is the query and the earlier ones ride in-context as answered
    QA pairs (cloze '_' questions keep their fill-in form). acc only."""
    import collections

    from ..data.offline import load_dataset

    letter_to_num = {"A": 0, "B": 1, "C": 2, "D": 3}
    ds = load_dataset("race", "high", split=split)
    by_article = collections.defaultdict(list)
    for d in ds:
        by_article[d["article"]].append(d)
    docs = []
    for article, probs in by_article.items():
        text = "Article: " + article + "\n\n"
        for p in probs[:-1]:
            ans = p["options"][letter_to_num[p["answer"]]]
            if p["question"][-6:] == "  _  .":
                text += p["question"][-5:] + ans + "\n"
            else:
                text += "Question: " + p["question"] + "\nAnswer: " + ans + "\n"
        last = probs[-1]
        text += last["question"]
        docs.append(
            MCDoc(text, [" " + o for o in last["options"]],
                  letter_to_num[last["answer"]])
        )
    return docs


TASK_REGISTRY: dict[str, Callable[[], list]] = {
    "hellaswag": _hellaswag_docs,
    "piqa": _piqa_docs,
    "arc_easy": lambda: _arc_docs("ARC-Easy"),
    "arc_challenge": lambda: _arc_docs("ARC-Challenge"),
    "winogrande": _winogrande_docs,
    "boolq": _boolq_docs,
    "openbookqa": _openbookqa_docs,
    "sciq": _sciq_docs,
    "copa": _copa_docs,
    "logiqa": _logiqa_docs,
    "mathqa": _mathqa_docs,
    "race": _race_docs,
}

# Cloze-style tasks dispatch to evaluate_cloze_task instead of evaluate_task.
CLOZE_TASKS: dict[str, Callable[[], list]] = {
    "lambada_openai": _lambada_docs,
}

# Per-task metric lists, matching the lm-eval fork's task definitions:
# winogrande/boolq/copa report acc only (winogrande's per-choice contexts
# share one continuation, so length-normalization would degenerate to acc).
TASK_METRICS: dict[str, tuple] = {
    "winogrande": ("acc",),
    "boolq": ("acc",),
    "copa": ("acc",),
    "race": ("acc",),  # tasks/race.py:150-160 reports acc only
}

# Split-preference parity note: the reference's vendored lm-eval plumbs a
# test_set=True flag that prefers test docs where a LABELED test split
# exists (evaluator.py:33,117,225). That preference is this registry's
# DEFAULT: arc_easy/arc_challenge and every hendrycksTest-* subject load
# their labeled test splits; hellaswag/piqa/winogrande/boolq have unlabeled
# hub test splits and use validation — the same fallback the reference's
# has_test_docs()/has_validation_docs() checks produce.
for _subj in MMLU_SUBJECTS:
    TASK_REGISTRY[f"hendrycksTest-{_subj}"] = (
        lambda s=_subj: _mmlu_docs(s)
    )


# ---------------------------------------------------------------------------
# Generative (greedy_until) tasks
# ---------------------------------------------------------------------------


class GenDoc:
    """A generative-task document: greedy-generate from `context` until any
    stop string in `until`, compare against `target` (lm-eval v0.3
    greedy_until request semantics, base.py greedy_until / evaluator.py)."""

    __slots__ = ("context", "target", "until")

    def __init__(self, context: str, target: str, until: Sequence[str] = ("\n",)):
        self.context = context
        self.target = target
        self.until = tuple(until)


def trim_at_stops(text: str, until: Sequence[str]) -> str:
    """Cut the generation at the earliest stop sequence (exclusive)."""
    cut = len(text)
    for stop in until:
        if stop:
            i = text.find(stop)
            if i != -1:
                cut = min(cut, i)
    return text[:cut]


class GreedyUntilFn:
    """Engine-backed greedy generation for generative tasks — the adaptor
    role of the reference's LMEvalAdaptor._model_generate (utils_eval.py:
    88-114), batched through the continuous-batching engine instead of a
    per-request HF generate call."""

    def __init__(self, engine, tokenizer, *, max_new_tokens: int = 256):
        self.engine = engine
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens

    def __call__(self, requests: Sequence[tuple[str, Sequence[str]]]) -> list[str]:
        prompts = [self.tokenizer.encode(ctx) for ctx, _ in requests]
        outs = self.engine.generate(prompts, max_new_tokens=self.max_new_tokens)
        texts = [self.tokenizer.decode(o, skip_special_tokens=True) for o in outs]
        return [
            trim_at_stops(t, until) for t, (_, until) in zip(texts, requests)
        ]


def evaluate_gen_task(
    gen_fn: Callable,
    docs: Iterable[GenDoc],
    limit: Optional[int] = None,
    postprocess: Optional[Callable[[str], str]] = None,
    match: Optional[Callable[[str, object], bool]] = None,
) -> dict:
    """Exact-match accuracy over greedy generations (the metric lm-eval's
    generative tasks use after their per-task extraction). `match` overrides
    the default stripped-string comparison (e.g. alias sets)."""
    docs = list(docs)
    if limit:
        docs = docs[:limit]
    preds = gen_fn([(d.context, d.until) for d in docs])
    if postprocess is not None:
        preds = [postprocess(p) for p in preds]
    if match is None:
        match = lambda p, t: p.strip() == str(t).strip()
    em = sum(int(match(p, d.target)) for p, d in zip(preds, docs))
    n = len(docs)
    return {"exact_match": em / n if n else 0.0, "n": n}


# -- generative task definitions --------------------------------------------

_GSM8K_ANS_RE = None  # compiled lazily; pattern ≡ lm-eval tasks/gsm8k.py:36


def _gsm8k_extract(text: str) -> str:
    """'#### n' answer extraction — the lm-eval gsm8k ANS_RE protocol
    (tasks/gsm8k.py:36-99: strip commas, '[invalid]' on no match)."""
    global _GSM8K_ANS_RE
    import re

    if _GSM8K_ANS_RE is None:
        _GSM8K_ANS_RE = re.compile(r"#### (\-?[0-9\.\,]+)")
    m = _GSM8K_ANS_RE.search(text)
    return m.group(1).strip().replace(",", "") if m else "[invalid]"


def _gsm8k_gen_docs(n_fewshot: int = 5) -> list:
    """gsm8k as an lm-eval-style generative task ('Question: ...\\nAnswer:'
    prompt, stop at the next 'Question', '#### n' extraction — tasks/
    gsm8k.py:63-99). Few-shot exemplars are the first n test rows (held out
    of the evaluated set); the dedicated `cli gsm8k` (eval/gsm8k.py) remains
    the instruction-prompt MetaMath protocol used for headline numbers."""
    from ..data.offline import load_dataset

    rows = list(load_dataset("gsm8k", "main", split="test"))
    shots, rows = rows[:n_fewshot], rows[n_fewshot:]
    fewshot = "".join(
        f"Question: {d['question']}\nAnswer: {d['answer']}\n\n" for d in shots
    )
    return [
        GenDoc(
            fewshot + f"Question: {d['question']}\nAnswer:",
            _gsm8k_extract(d["answer"]),
            until=(":", "Question:", "Question"),
        )
        for d in rows
    ]


def _gsm8k_match(pred: str, target) -> bool:
    ans = _gsm8k_extract(pred)
    return ans != "[invalid]" and ans == target


def _normalize_answer(s: str) -> str:
    import string as _string

    return s.strip().lower().translate(str.maketrans("", "", _string.punctuation))


def _triviaqa_docs() -> list:
    """TriviaQA rc.nocontext as a greedy_until task (lm-eval tasks/
    triviaqa.py:52-91: 'Question:/Answer:' prompt, stop at newline/./,,
    normalized membership in the alias list)."""
    from ..data.offline import load_dataset

    ds = load_dataset("trivia_qa", "rc.nocontext", split="validation")
    docs = []
    for d in ds:
        ans = d["answer"]
        aliases = list(ans.get("aliases") or []) or [ans["value"]]
        docs.append(
            GenDoc(
                f"Question: {d['question']}\nAnswer:", aliases,
                until=("\n", ".", ","),
            )
        )
    return docs


def _triviaqa_match(pred: str, target) -> bool:
    cands = {_normalize_answer(a) for a in target}
    return _normalize_answer(pred) in cands


# name -> (doc loader, postprocess, match). Evaluated through GreedyUntilFn
# (the engine-backed greedy_until adaptor above).
GEN_TASKS: dict[str, tuple] = {
    "gsm8k": (_gsm8k_gen_docs, None, _gsm8k_match),
    "triviaqa": (_triviaqa_docs, None, _triviaqa_match),
}


def run_gen_tasks(gen_fn, task_names: Sequence[str], limit=None) -> dict:
    """Evaluate generative (greedy_until) tasks via a GreedyUntilFn-style
    callable. Mirrors run_tasks for the loglikelihood tasks."""
    results = {}
    for name in task_names:
        loader, post, match = GEN_TASKS[name]
        results[name] = evaluate_gen_task(
            gen_fn, loader(), limit, postprocess=post, match=match
        )
    return results


# ---------------------------------------------------------------------------
# Evaluation driver
# ---------------------------------------------------------------------------


def evaluate_task(
    ll_fn: LogLikelihoodFn | Callable,
    docs: Iterable[MCDoc],
    limit: Optional[int] = None,
) -> dict:
    docs = list(docs)
    if limit:
        docs = docs[:limit]
    pairs = []
    spans = []
    for doc in docs:
        start = len(pairs)
        contexts = doc.context if isinstance(doc.context, list) else [doc.context] * len(doc.choices)
        for ctx, choice in zip(contexts, doc.choices):
            pairs.append((ctx, choice))
        spans.append((start, len(pairs)))
    results = ll_fn(pairs)
    acc = acc_norm = 0
    for doc, (s, e) in zip(docs, spans):
        lls = [results[i][0] for i in range(s, e)]
        lens = [max(len(c), 1) for c in doc.choices]
        acc += int(int(np.argmax(lls)) == doc.gold)
        acc_norm += int(int(np.argmax([l / n for l, n in zip(lls, lens)])) == doc.gold)
    n = len(docs)
    return {"acc": acc / n, "acc_norm": acc_norm / n, "n": n}


def run_tasks(ll_fn, task_names: Sequence[str], limit=None,
              mmlu_fewshot: int = 5) -> dict:
    """Evaluate several tasks; aggregate MMLU and QA averages like
    llm_eval.py:84-106. `mmlu_fewshot` ≡ the reference's --num_fewshot
    (llm_eval.py CLI; readme uses 5 for MMLU, 0 for QA tasks)."""
    results = {}
    for name in task_names:
        if name == "mmlu":
            for s in MMLU_SUBJECTS:
                results[f"hendrycksTest-{s}"] = evaluate_task(
                    ll_fn, _mmlu_docs(s, n_shot=mmlu_fewshot), limit
                )
        elif name == "wikitext":
            # word-level perplexity task (rolling loglikelihood) — needs
            # the LogLikelihoodFn adaptor, not a bare pairs callable
            results[name] = evaluate_perplexity_task(
                ll_fn, _wikitext_docs(), limit
            )
        elif name in CLOZE_TASKS:
            results[name] = evaluate_cloze_task(ll_fn, CLOZE_TASKS[name](), limit)
        else:
            res = evaluate_task(ll_fn, TASK_REGISTRY[name](), limit)
            metrics = TASK_METRICS.get(name)
            if metrics is not None:
                res = {k: v for k, v in res.items() if k in metrics or k == "n"}
            results[name] = res
    summary = dict(results)
    mmlu = [v["acc"] for k, v in results.items() if k.startswith("hendrycksTest-")]
    if mmlu:
        summary["mmlu-acc"] = float(np.mean(mmlu))
    qa = [v["acc"] for k, v in results.items()
          if not k.startswith("hendrycksTest-") and "acc" in v]
    if qa:
        summary["qa-avg"] = float(np.mean(qa))
    return summary
